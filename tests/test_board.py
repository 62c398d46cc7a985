"""align_board parity: jnp fixed-capacity version vs numpy reference logic."""

import jax.numpy as jnp
import numpy as np

from img2sgf_tpu.core import Alignment, align_board_jnp, align_board_np


def _rand_part(hsize, vsize, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 3, size=(hsize, vsize)).astype(np.int32)


def test_align_full_board():
    part = _rand_part(19, 19)
    out = align_board_np(part, (Alignment.LEFT, Alignment.TOP))
    np.testing.assert_array_equal(out, part)


def test_align_corners_match_jnp():
    for hsize, vsize in [(7, 9), (19, 10), (5, 19), (19, 19)]:
        part = _rand_part(hsize, vsize, seed=hsize * 31 + vsize)
        padded = np.zeros((19, 19), np.int32)
        padded[:hsize, :vsize] = part
        for ha in (Alignment.LEFT, Alignment.RIGHT):
            for va in (Alignment.TOP, Alignment.BOTTOM):
                ref = align_board_np(part, (ha, va))
                got = align_board_jnp(
                    jnp.asarray(padded),
                    hsize,
                    vsize,
                    ha == Alignment.RIGHT,
                    va == Alignment.BOTTOM,
                )
                np.testing.assert_array_equal(np.asarray(got), ref, err_msg=f"{hsize}x{vsize} {ha} {va}")
