"""Shape-bucketed detection must be bit-identical to native-size detection.

detect_board_auto pads an image into a fixed canvas bucket and runs the
shared compiled program with traced content dims (pipeline/detect.py
content_hw). Every op emulates its OpenCV virtual border inside the canvas
(ops/common.py border_remap) and masks results to the content block, so the
outputs must match detect_board at the image's native shape exactly —
including edge maps, circles and diagnostics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from img2sgf_tpu.config import DetectionConfig
from img2sgf_tpu.pipeline import bucket_dim, detect_board_auto, detect_board_jit

from test_pipeline_smoke import synth_board

TINY = DetectionConfig(
    max_center_candidates=128,
    overflow_center_candidates=0,  # keep one compiled budget branch (CPU)
    max_circles_per_variant=32,
    max_lines=256,
    hysteresis_iters=8,
)

CHECK_FIELDS = (
    "full_board", "detected_board", "hsize", "vsize", "board_ready",
    "valid_grid", "num_black", "num_white", "side_to_move",
    "hspace", "vspace", "intensities", "stone_mask",
    "edges", "grey", "circles_removed",
)


@pytest.mark.parametrize(
    "size,n,stones",
    [
        (147, 7, ((1, 2, 0), (3, 3, 255))),   # odd size -> padded bucket
        (160, 9, ((2, 3, 0), (4, 4, 255))),   # exact bucket fit
        (101, 5, ((1, 2, 0), (3, 3, 255))),   # small, heavy padding
    ],
)
@pytest.mark.slow
def test_bucketed_matches_native(size, n, stones):
    rgb = synth_board(size=size, n=n, stones=stones)
    native = detect_board_jit(jnp.asarray(rgb), TINY, 24.0)
    bucketed = detect_board_auto(rgb, TINY, 24.0)
    for f in CHECK_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(native, f)), np.asarray(getattr(bucketed, f)),
            err_msg=f"field {f} diverges at size {size}",
        )
    cn = np.asarray(native.circles)[np.asarray(native.circles_valid)]
    cb = np.asarray(bucketed.circles)[np.asarray(bucketed.circles_valid)]
    np.testing.assert_array_equal(np.sort(cn, axis=0), np.sort(cb, axis=0))


def test_bucket_ladder():
    assert bucket_dim(100) == 128
    assert bucket_dim(128) == 128
    assert bucket_dim(129) == 160
    assert bucket_dim(512) == 512
    assert bucket_dim(2049) == 2560  # beyond ladder: multiples of 512
    assert bucket_dim(5000) == 5120


@pytest.mark.slow
def test_bucket_batch_matches_single():
    """The batched bucketed entry (serving path) == per-image bucketed runs:
    two different native sizes sharing one canvas bucket."""
    from img2sgf_tpu.pipeline import detect_board_bucket_batch

    specs = [
        (147, 7, ((1, 2, 0), (3, 3, 255))),
        (155, 7, ((2, 2, 0), (4, 3, 255))),
    ]
    imgs = [synth_board(size=s, n=n, stones=st) for s, n, st in specs]
    hb = max(bucket_dim(im.shape[0]) for im in imgs)
    wb = max(bucket_dim(im.shape[1]) for im in imgs)
    B = len(imgs)
    canvases = np.zeros((B, hb, wb, 3), np.uint8)
    hs = np.zeros((B,), np.int32)
    ws = np.zeros((B,), np.int32)
    for i, im in enumerate(imgs):
        canvases[i, : im.shape[0], : im.shape[1]] = im
        hs[i], ws[i] = im.shape[:2]
    ths = np.full((B,), 24.0, np.float32)
    batch = detect_board_bucket_batch(
        jnp.asarray(canvases), TINY, jnp.asarray(ths), jnp.asarray(hs),
        jnp.asarray(ws),
    )
    for i, im in enumerate(imgs):
        single = detect_board_auto(im, TINY, 24.0)
        for f in ("full_board", "board_ready", "hsize", "vsize",
                  "num_black", "num_white", "side_to_move"):
            np.testing.assert_array_equal(
                np.asarray(getattr(batch, f))[i],
                np.asarray(getattr(single, f)),
                err_msg=f"{f} image {i}",
            )


@pytest.mark.slow
def test_fast_preset_detects_synthetic():
    """DetectionConfig.fast() (reduced blur pyramid) still detects the
    synthetic board and matches the full config's result on it."""
    from img2sgf_tpu.config import DetectionConfig
    from img2sgf_tpu.pipeline.detect import detect_board_jit

    img = synth_board(size=147, n=7, stones=((1, 2, 0), (3, 3, 255)))
    full_cfg = TINY
    fast_cfg = DetectionConfig.fast(
        max_center_candidates=TINY.max_center_candidates,
        max_circles_per_variant=TINY.max_circles_per_variant,
        max_lines=TINY.max_lines,
        hysteresis_iters=TINY.hysteresis_iters,
    )
    a = detect_board_jit(jnp.asarray(img), full_cfg, jnp.float32(24.0))
    b = detect_board_jit(jnp.asarray(img), fast_cfg, jnp.float32(24.0))
    assert bool(a.board_ready) and bool(b.board_ready)
    np.testing.assert_array_equal(np.asarray(a.full_board),
                                  np.asarray(b.full_board))
