"""Two-level cascade vote accumulator as a VMEM-resident Pallas kernel.

The XLA cascade (circles.vote_accumulator_cascade) is HBM-bound: each of
the 64 direction bins re-reads the packed bin plane, materialises its
partial-sum plane and accumulates into the f32 accumulator through HBM —
~1.4 ms/plane at 512x512 (measured, sync-floor corrected). Here the
packed plane, the partial plane P and the accumulator all stay in VMEM.

Kernel shape: a fori_loop over direction bins whose body UNROLLS the
17 cascade shifts (5 inner + 12 outer) as `pltpu.roll`s with per-bin
amounts loaded from SMEM tables. A fully static-unrolled variant (64x17
static rolls) compiles for >25 minutes under Mosaic, and a loop over
individual offsets pays per-iteration overhead 3500x; one-iteration-per-
bin with an unrolled body is the middle ground that both compiles in
seconds and amortises the loop cost over 17 vector ops.

Semantics are identical to vote_accumulator_cascade: per bin d, the bin's
edge plane is summed over the centred inner offsets (exact — at most
`seg` ones), then sampled at the +/- segment-centre outer offsets and
accumulated in f32. Wrapped roll values only ever land in the pad band,
which is bin-free (packed == num_bins there), so the interior crop equals
the slice-based XLA result. Verified bit-exact in
tests/test_circles_exact.py.

Reference behaviour: the centre-vote proposal stage for
cv.HoughCircles(HOUGH_GRADIENT) at /root/reference/img2sgf.py:180.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .circles import _cascade_tables


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=32)
def _tables_np(num_bins: int, min_r: int, max_r: int, Hp: int, Wp: int):
    inner, outer = _cascade_tables(num_bins, min_r, max_r)
    n_in = len(inner[0])
    n_out = len(outer[0])
    iy = np.zeros((num_bins, n_in), np.int32)
    ix = np.zeros((num_bins, n_in), np.int32)
    oy = np.zeros((num_bins, n_out), np.int32)
    ox = np.zeros((num_bins, n_out), np.int32)
    for d in range(num_bins):
        for j, (a, b) in enumerate(inner[d]):
            iy[d, j] = a % Hp
            ix[d, j] = b % Wp
        for j, (a, b) in enumerate(outer[d]):
            oy[d, j] = a % Hp
            ox[d, j] = b % Wp
    return iy, ix, oy, ox, n_in, n_out


@functools.lru_cache(maxsize=32)
def _build_kernel(num_bins: int, min_r: int, max_r: int, H: int, W: int,
                  interpret: bool):
    B = max_r
    pad = B + 3                      # walk reach + inner-offset reach
    Hp = _round_up(H + 2 * pad, 8)
    Wp = _round_up(W + 2 * pad, 128)
    _, _, _, _, n_in, n_out = _tables_np(num_bins, min_r, max_r, Hp, Wp)

    def kern(iy_ref, ix_ref, oy_ref, ox_ref, packed_ref, out_ref):
        p = packed_ref[:]

        def bin_body(d, acc):
            e_d = jnp.where(p == d, jnp.float32(1), jnp.float32(0))
            P = None
            for j in range(n_in):
                t = pltpu.roll(e_d, iy_ref[d, j], axis=0)
                t = pltpu.roll(t, ix_ref[d, j], axis=1)
                P = t if P is None else P + t
            contrib = None
            for j in range(n_out):
                t = pltpu.roll(P, oy_ref[d, j], axis=0)
                t = pltpu.roll(t, ox_ref[d, j], axis=1)
                contrib = t if contrib is None else contrib + t
            return acc + contrib

        acc = jax.lax.fori_loop(
            0, num_bins, bin_body, jnp.zeros((Hp, Wp), jnp.float32)
        )
        out_ref[:] = jax.lax.slice(acc, (pad, pad), (pad + H, pad + W))

    def call(iy, ix, oy, ox, packed_padded):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(Hp * Wp * 16 + (16 << 20)),
            ),
            interpret=interpret,
        )(iy, ix, oy, ox, packed_padded)

    return call, Hp, Wp, pad


def vote_accumulator_cascade_pallas(edge_mask, dx, dy, num_bins: int,
                                    min_r: int, max_r: int,
                                    interpret: bool = False):
    """Drop-in for vote_accumulator_cascade on TPU (VMEM-sized planes)."""
    H, W = edge_mask.shape
    ang = jnp.arctan2(dy.astype(jnp.float32), dx.astype(jnp.float32))
    step = math.pi / num_bins
    bins = jnp.round(ang / step).astype(jnp.int32) % num_bins
    packed = jnp.where(edge_mask, bins, num_bins).astype(jnp.int32)
    call, Hp, Wp, pad = _build_kernel(num_bins, min_r, max_r, H, W, interpret)
    iy, ix, oy, ox, _, _ = _tables_np(num_bins, min_r, max_r, Hp, Wp)
    packed = jnp.pad(
        packed,
        ((pad, Hp - H - pad), (pad, Wp - W - pad)),
        constant_values=num_bins,
    )
    return call(jnp.asarray(iy), jnp.asarray(ix), jnp.asarray(oy),
                jnp.asarray(ox), packed)
