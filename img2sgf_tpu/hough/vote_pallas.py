"""Hough-gradient centre voting as a Pallas TPU kernel.

The XLA formulation pays ~55 full-plane slice reads per direction bin from
HBM (the fused compare is recomputed per consumer). Here the padded
bin-index plane lives in VMEM and all 64 x ~55 shifted accumulations run
on-chip: per bin, extract the bin's edge plane once, then roll+add for
each static walk offset (offsets/weights come from SMEM tables via a
fori_loop with dynamic rotates).

Semantics identical to hough.circles.vote_accumulator: every edge pixel
votes at floor(r * round(1024*u_bin) / 1024) for r in [min_r, max_r], both
directions, duplicate cells weighted.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _offset_tables(num_bins: int, min_r: int, max_r: int):
    from .circles import _walk_offsets

    tables = [
        _walk_offsets(math.cos(d * math.pi / num_bins),
                      math.sin(d * math.pi / num_bins), min_r, max_r)
        for d in range(num_bins)
    ]
    J = max(len(t) for t in tables)
    off_y = np.zeros((num_bins, J), np.int32)
    off_x = np.zeros((num_bins, J), np.int32)
    wgt = np.zeros((num_bins, J), np.float32)
    for d, t in enumerate(tables):
        for j, ((oy, ox), w) in enumerate(t.items()):
            off_y[d, j] = oy
            off_x[d, j] = ox
            wgt[d, j] = w
    return off_y, off_x, wgt, J


def _kernel(num_bins: int, J: int, Hp: int, Wp: int, pad: int, Hout: int, Wout: int):
    def kern(oy_ref, ox_ref, w_ref, packed_ref, out_ref):
        p = packed_ref[:]

        def bin_body(d, acc):
            e_d = (p == d).astype(jnp.float32)

            def off_body(j, a):
                oy = oy_ref[d, j]
                ox = ox_ref[d, j]
                w = w_ref[d, j]
                # roll wraps, but |offset| <= pad and the pad band is
                # bin-free (packed == num_bins there), so wrapped values
                # never reach the centre crop taken below
                t = pltpu.roll(e_d, (oy + Hp) % Hp, axis=0)
                t = pltpu.roll(t, (ox + Wp) % Wp, axis=1)
                return a + w * t  # padded slots carry w == 0

            return jax.lax.fori_loop(0, J, off_body, acc)

        acc = jax.lax.fori_loop(
            0, num_bins, bin_body, jnp.zeros((Hp, Wp), jnp.float32)
        )
        out_ref[:] = acc[pad : pad + Hout, pad : pad + Wout]

    return kern


def vote_accumulator_pallas(edge_mask, dx, dy, num_bins: int, min_r: int,
                            max_r: int):
    """Drop-in replacement for vote_accumulator on TPU (VMEM-sized images)."""
    H, W = edge_mask.shape
    pad = max_r
    ang = jnp.arctan2(dy.astype(jnp.float32), dx.astype(jnp.float32))
    step = math.pi / num_bins
    bins = jnp.round(ang / step).astype(jnp.int32) % num_bins
    packed = jnp.where(edge_mask, bins, num_bins).astype(jnp.int32)
    # tpu.dynamic_rotate requires tile-aligned shapes: round the padded
    # plane up to (8, 128) multiples (extra area stays bin-free)
    Hp = -(-(H + 2 * pad) // 8) * 8
    Wp = -(-(W + 2 * pad) // 128) * 128
    packed = jnp.pad(
        packed,
        ((pad, Hp - H - pad), (pad, Wp - W - pad)),
        constant_values=num_bins,
    )

    off_y, off_x, wgt, J = _offset_tables(num_bins, min_r, max_r)
    return pl.pallas_call(
        _kernel(num_bins, J, Hp, Wp, pad, H, W),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(jnp.asarray(off_y), jnp.asarray(off_x), jnp.asarray(wgt), packed)
