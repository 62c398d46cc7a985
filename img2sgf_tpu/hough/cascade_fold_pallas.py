"""Dihedral-folded, VMEM-resident Pallas cascade vote accumulator.

The XLA cascade (circles.vote_accumulator_cascade) achieves ~10% of VPU
peak: each of the 64 direction bins is one fused compare+slice+add chain
whose recompute/HBM traffic the compiler schedules conservatively. Two
earlier Pallas attempts failed differently (cascade_pallas.py): fully
static unrolling of 64x17 shifts blows up Mosaic compile (>25 min), and
per-bin dynamic `pltpu.roll`s execute slower than XLA (dynamic lane
rotates dominate).

This kernel removes BOTH obstacles with the cascade tables' dihedral
symmetry (numerically verified with multiplicity):

    rot90:    T[d+32] = {( ox, -oy)}   refl:     T[64-d] = {( oy, -ox)}
    transpose:T[32-d] = {( ox,  oy)}       for (oy, ox) in T[d]

so only bins 0..16 need static offset tables. The 64 bins are assigned
each to exactly one of four plane transforms (identity / fliplr /
rotate-cw / transpose); the transformed, relabeled packed planes run
through ONE unrolled 17-bin body (~300 static slice+adds — compiles in
seconds), and the partial accumulators are inverse-transformed and
summed outside. All values are small integers, so f32 summation order
cannot change the result: output is bit-exact vs the XLA cascade
(tests/test_circles_exact.py).

Whole padded planes stay resident in VMEM (grid over the two channels of
each orientation), which bounds canvases to ~1024px; larger planes fall
back to the XLA cascade in the caller.

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


@functools.lru_cache(maxsize=8)
def _rep_tables(num_bins: int, min_r: int, max_r: int):
    """Inner/outer offset tables for the representative bins 0..Q."""
    assert num_bins % 4 == 0, "dihedral fold needs num_bins % 4 == 0"
    inner, outer = _cascade_tables(num_bins, min_r, max_r)
    Q = num_bins // 4
    return tuple(tuple(inner[d]) for d in range(Q + 1)), tuple(
        tuple(outer[d]) for d in range(Q + 1)
    )


@functools.lru_cache(maxsize=32)
def _build_kernel(num_bins: int, min_r: int, max_r: int, H: int, W: int,
                  interpret: bool):
    """Pallas call over a [2, Hp, Wp] stack of relabeled packed planes."""
    inner, outer = _rep_tables(num_bins, min_r, max_r)
    Q = num_bins // 4
    B = max_r
    pad = B + 3
    Hp = _round_up(H + 2 * pad, 8)
    Wp = _round_up(W + 2 * pad, 128)
    He, We = H + 2 * B, W + 2 * B

    def kern(packed_ref, out_ref):
        # bf16 arithmetic equality instead of an i1 mask: Mosaic cannot
        # relayout the (8,128)-tiled i32-compare mask into the (16,128)
        # bf16 select it feeds ("Invalid relayout ... vector<...xi1>",
        # measured on-device v5e). Labels are small integers (<= Q+1 <<
        # 256), exact in bf16, so 1-min(1,|p-d|) == (p==d) bitwise.
        p = packed_ref[0].astype(jnp.bfloat16)
        one = jnp.bfloat16(1)
        acc = jnp.zeros((H, W), jnp.float32)
        for d in range(Q + 1):
            e_d = one - jnp.minimum(one, jnp.abs(p - jnp.bfloat16(d)))
            P = None
            for (jy, jx) in inner[d]:
                t = jax.lax.slice(
                    e_d, (pad - B - jy, pad - B - jx),
                    (pad - B - jy + He, pad - B - jx + We),
                )
                P = t if P is None else P + t
            contrib = None
            for (by, bx) in outer[d]:
                t = jax.lax.slice(P, (B - by, B - bx), (B - by + H, B - bx + W))
                contrib = t if contrib is None else contrib + t
            acc = acc + contrib.astype(jnp.float32)
        out_ref[0] = acc

    def call(packed2):
        return pl.pallas_call(
            kern,
            grid=(2,),
            in_specs=[
                pl.BlockSpec((1, Hp, Wp), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, H, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(
                    Hp * Wp * 4 + 3 * Hp * Wp * 2 + H * W * 4 + (4 << 20)
                ),
            ),
            interpret=interpret,
        )(packed2)

    return call, Hp, Wp, pad


def _pad_to(p, Hp, Wp, pad, sentinel):
    H, W = p.shape
    return jnp.pad(
        p, ((pad, Hp - H - pad), (pad, Wp - W - pad)),
        constant_values=sentinel,
    )


def vote_accumulator_cascade_folded(edge_mask, dx, dy, num_bins: int,
                                    min_r: int, max_r: int,
                                    interpret: bool = False):
    """Bit-exact drop-in for vote_accumulator_cascade (VMEM-sized planes).

    Channel assignment (Q = num_bins//4): identity keeps bins [0, Q];
    fliplr handles [3Q+1, 4Q-1] (refl: d -> 4Q-d); rotate-cw handles
    [2Q, 3Q] (rot: d -> d-2Q); transpose handles [Q+1, 2Q-1]
    (refl*rot: d -> 2Q-d). Each bin lands in exactly one channel with a
    representative label in [0, Q].
    """
    H, W = edge_mask.shape
    Q = num_bins // 4
    ang = jnp.arctan2(dy.astype(jnp.float32), dx.astype(jnp.float32))
    step = math.pi / num_bins
    bins = jnp.round(ang / step).astype(jnp.int32) % num_bins
    sent = Q + 1  # any label > Q is dead
    packed = jnp.where(edge_mask, bins, num_bins).astype(jnp.int32)

    # per-channel relabeled planes (labels in [0, Q], else sentinel)
    lbl_id = jnp.where(packed <= Q, packed, sent)
    lbl_rot = jnp.where((packed >= 2 * Q) & (packed <= 3 * Q),
                        packed - 2 * Q, sent)
    # upper bound excludes the non-edge sentinel (packed == num_bins)
    lbl_refl = jnp.where((packed >= 3 * Q + 1) & (packed <= 4 * Q - 1),
                         4 * Q - packed, sent)
    lbl_tr = jnp.where((packed >= Q + 1) & (packed <= 2 * Q - 1),
                       2 * Q - packed, sent)

    # plane transforms matching the offset maps (see module docstring):
    #   refl  (oy,ox)->(oy,-ox) : fliplr          (H, W)
    #   rot   (oy,ox)->(ox,-oy) : transpose(flipud) -> (W, H)
    #   tr    (oy,ox)->(ox, oy) : transpose        (W, H)
    plane_a = jnp.stack([lbl_id, lbl_refl[:, ::-1]])
    plane_b = jnp.stack([lbl_rot[::-1, :].T, lbl_tr.T])

    call_a, Hp_a, Wp_a, pad = _build_kernel(num_bins, min_r, max_r, H, W,
                                            interpret)
    acc_a = call_a(
        jnp.stack([
            _pad_to(plane_a[0], Hp_a, Wp_a, pad, sent),
            _pad_to(plane_a[1], Hp_a, Wp_a, pad, sent),
        ])
    )
    if H == W:
        call_b, Hp_b, Wp_b, _ = call_a, Hp_a, Wp_a, pad
    else:
        call_b, Hp_b, Wp_b, _ = _build_kernel(num_bins, min_r, max_r, W, H,
                                              interpret)
    acc_b = call_b(
        jnp.stack([
            _pad_to(plane_b[0], Hp_b, Wp_b, pad, sent),
            _pad_to(plane_b[1], Hp_b, Wp_b, pad, sent),
        ])
    )
    # inverse transforms: fliplr^-1 = fliplr; (transpose . flipud)^-1 =
    # flipud . transpose; transpose^-1 = transpose
    return (
        acc_a[0]
        + acc_a[1][:, ::-1]
        + acc_b[0].T[::-1, :]
        + acc_b[1].T
    )
