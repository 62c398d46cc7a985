"""Exact-vote rescore as a VMEM-resident Pallas TPU kernel.

The XLA exact_rescore is gather-bound: every candidate's (2*(maxR+3)+1)^2
window is fetched from HBM via dynamic_slice at ~4.4 us per slice
regardless of locality or formulation (measured: plain/two-step/row-take/
aligned slicing all ~45 ms for a 10x1024 budget at 512x512). Here the
packed (edge | sx | sy) plane lives in VMEM once per variant and each
candidate reads an aligned [80, 256] block of it directly.

v2 kernel (this file): the block is rotated with `pltpu.roll` so the
candidate's 67x67 window starts at (0, 0), which
  * halves the vector width of the walk ([80, 128] instead of [80, 256]),
  * makes every geometric table STATIC (centre offsets, rhat, radius band
    masks, window mask) instead of per-candidate vector math,
  * turns the per-radius products into incremental adds
    (r+1)*s = r*s + s, in int32 (the >> 10 arithmetic shift IS OpenCV's
    fixed-point floor),
  * packs all 9 patch-cell counters into one int32 (3 bits per cell; the
    7-step main walk puts at most 7 votes in a cell per pixel), and scores
    with 8 packed reductions instead of 18 (cells paired per int32 at
    15-bit spacing — sums <= 7*4489 < 2^15 so fields cannot overlap),
  * runs the opposite-sign "away" pass unconditionally on a separate
    [16, 256] block around the centre row (the only place it can land —
    see the pruning proof in circles.exact_rescore) instead of branching,
  * zeroes the output once and loops candidates with a DYNAMIC trip count
    (fori_loop to n_valid) inside a single grid step per plane — per-chunk
    grids re-DMA the plane every step and empty iterations cost ~3 us.

Vote semantics are bit-identical to circles.exact_rescore (same per-pixel
fixed-point walk, radius pruning |r - rhat| <= 3, toward-sign main pass +
central away pass), verified in tests/test_circles_exact.py.

Reference behaviour being reproduced: the accumulator votes of
cv.HoughCircles(HOUGH_GRADIENT) as called at /root/reference/img2sgf.py:180.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block each candidate reads: rows cover the 67-px window at 8-aligned
# starts (67 + 13 clamp slack <= 80), lanes cover it at 128-aligned starts
# (67 + 128 slack <= 256); after the roll the window is the [67, 67]
# top-left corner and compute runs on [80, 128]
_ROWS = 80
_COLS = 256
_WORK = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=32)
def _build_kernel(min_r: int, max_r: int, H: int, W: int, K: int, CH: int,
                  interpret: bool):
    ext = max_r + 3          # window half-extent (see circles.exact_rescore)
    win_ = 2 * ext + 1
    # the block geometry and the 3/15/8-bit packing bounds below are only
    # valid for win <= 67 (max_r <= 30): rows need win + 13 <= _ROWS, lanes
    # need win <= _WORK, and the paired 15-bit score fields need cell sums
    # <= 7 * win^2 < 2^15. Callers (pipeline._use_pallas_rescore /
    # exact_rescore_pallas) fall back to the XLA exact_rescore otherwise.
    assert max_r <= 30, (
        f"Pallas rescore kernel supports circle_max_radius <= 30, got {max_r}"
    )
    assert min_r >= 1
    pad = ext + 1            # plane padding: window reach + patch half
    Hc = _round_up(H + 2 * pad + 8, 8)
    Wc = _round_up(W + 2 * pad, 128)
    n_r = max_r - min_r + 1
    # away-pass radii: landings with the wrong-sign walk require
    # d <= 2*sqrt(2) and r <= d + 2.85 <= 5.68 (circles.py pruning proof);
    # walking the fixed superset r in [min_r, min(max_r, 6)] is exact
    # because out-of-reach steps simply never land
    away_rs = list(range(min_r, min(max_r, 6) + 1))
    win = 2 * ext + 1

    def kern(ys_ref, xs_ref, nvalid_ref, plane_ref, out_ref):
        n_valid = nvalid_ref[0, 0]

        # window-origin-relative geometry, computed once per chunk
        # (Pallas kernels cannot capture array constants)
        u = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _WORK), 0)
        v = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _WORK), 1)
        boy_i = ext - u                       # centre - pixel (rows)
        box_i = ext - v
        d2 = boy_i * boy_i + box_i * box_i
        rhat = jnp.round(jnp.sqrt(d2.astype(jnp.float32))).astype(jnp.int32)
        rhs = rhat - min_r                    # unsigned-compare range check
        wmask_i = jnp.where((u < win) & (v < win), 1, 0)
        bxm = box_i - 1                       # ddx+1 = (px>>10) - (box-1)
        bym = boy_i - 1
        # away-pass slab geometry ([16, _WORK]): the wrong-sign walk only
        # lands from pixels with d <= 2*sqrt(2), i.e. window rows 31..35 —
        # read them as a separate aligned block instead of slicing the
        # rolled main block (which trips a Mosaic internal assert)
        u2 = jax.lax.broadcasted_iota(jnp.int32, (16, _WORK), 0)
        v2 = jax.lax.broadcasted_iota(jnp.int32, (16, _WORK), 1)
        box2 = ext - v2

        # zero the whole output once; the loop then only visits valid
        # candidates (dynamic trip count — invalid ones cost nothing)
        out_ref[:] = jnp.zeros((K, 9), jnp.float32)

        def one(idx, _):
            y = ys_ref[0, idx]
            x = xs_ref[0, idx]
            oy = y + pad - ext                    # window origin (padded)
            ox = x + pad - ext
            ry0 = jnp.minimum((oy // 8) * 8, Hc - _ROWS)
            cx0 = jnp.minimum((ox // 128) * 128, Wc - _COLS)
            ry0 = pl.multiple_of(ry0, 8)
            cx0 = pl.multiple_of(cx0, 128)
            blk = plane_ref[pl.ds(ry0, _ROWS), pl.ds(cx0, _COLS)]
            # rotate so the window origin lands at (0, 0); roff <= 13
            # and amt_x <= 128, so the window never wraps
            roff = oy - ry0
            amt_x = ox - cx0
            blk = pltpu.roll(blk, _ROWS - roff, axis=0)
            blk = pltpu.roll(blk, _COLS - amt_x, axis=1)
            p = blk[:, :_WORK]

            wx = ((p >> 1) & 0xFFF) - 1024
            wy = ((p >> 13) & 0xFFF) - 1024

            # toward-the-candidate sign (see circles.exact_rescore)
            proj = wy * boy_i + wx * box_i
            tx = jnp.where(proj >= 0, wx, -wx)
            ty = jnp.where(proj >= 0, wy, -wy)

            # main pass: radii rhat-3 .. rhat+3 (all others cannot
            # land); px = r*tx via incremental adds, >> 10 = OpenCV's
            # fixed-point floor; 9 cells packed 3 bits each
            px = (rhs + (min_r - 3)) * tx
            py = (rhs + (min_r - 3)) * ty
            acc = jnp.zeros((_ROWS, _WORK), jnp.int32)
            for k in range(-3, 4):
                if k > -3:
                    px = px + tx
                    py = py + ty
                ddx1 = (px >> 10) - bxm       # ddx+1, valid in [0,2]
                ddy1 = (py >> 10) - bym
                ok = (
                    (ddx1.astype(jnp.uint32) < 3)
                    & (ddy1.astype(jnp.uint32) < 3)
                    & ((rhs + k).astype(jnp.uint32) < n_r)
                )
                # invalid lanes shift a ZERO, so the amount only needs to
                # be bounded ([0,31] via mask), not clamped to the field
                s = (ddy1 * 9 + ddx1 * 3) & 31
                acc = acc + (jnp.where(ok, 1, 0) << s)
                del ddx1, ddy1, ok, s

            # away pass: opposite sign, only central pixels (d<=2*sqrt2)
            # can land — a [16, _WORK] slab around the centre row
            # slab covers window rows ext-2 .. ext+2 (8-aligned start keeps
            # the reach within the 16 rows: offset-in-slab <= 7 + 4 = 11)
            ry2 = ((oy + ext - 2) // 8) * 8
            ry2 = pl.multiple_of(ry2, 8)
            blk2 = plane_ref[pl.ds(ry2, 16), pl.ds(cx0, _COLS)]
            blk2 = pltpu.roll(blk2, _COLS - amt_x, axis=1)
            p2 = blk2[:, :_WORK]
            wx2 = ((p2 >> 1) & 0xFFF) - 1024
            wy2 = ((p2 >> 13) & 0xFFF) - 1024
            boy2 = ((oy + ext) - ry2) - u2      # centre - pixel (rows)
            d2s = boy2 * boy2 + box2 * box2
            es_i = (p2 & 1) * jnp.where(d2s <= 8, 1, 0)
            proj2 = wy2 * boy2 + wx2 * box2
            tx2 = jnp.where(proj2 >= 0, wx2, -wx2)
            ty2 = jnp.where(proj2 >= 0, wy2, -wy2)
            bxm2 = box2 - 1
            bym2 = boy2 - 1
            pxa = min_r * (-tx2)
            pya = min_r * (-ty2)
            acc_a = jnp.zeros((16, _WORK), jnp.int32)
            for j in range(len(away_rs)):
                if j > 0:
                    pxa = pxa - tx2
                    pya = pya - ty2
                ddx1 = (pxa >> 10) - bxm2
                ddy1 = (pya >> 10) - bym2
                ok = (
                    (ddx1.astype(jnp.uint32) < 3)
                    & (ddy1.astype(jnp.uint32) < 3)
                )
                s = (ddy1 * 9 + ddx1 * 3) & 31
                acc_a = acc_a + (jnp.where(ok, 1, 0) << s)
                del ddx1, ddy1, ok, s

            # scoring: pack two cells per int32 reduction at 15-bit spacing
            # (cell sums <= 7 * 4489 = 31423 < 2^15, so no field overlap)
            # — 5 + 3 reductions instead of 18
            e_i = (p & 1) * wmask_i
            main_s = []
            for a in range(0, 9, 2):
                t = (acc >> (3 * a)) & 7
                if a + 1 < 9:
                    t = t | (((acc >> (3 * (a + 1))) & 7) << 15)
                w = jnp.sum(e_i * t)
                main_s.append(w & 0x7FFF)
                if a + 1 < 9:
                    main_s.append(w >> 15)
            # away sums <= 6 * 25 central pixels = 150 < 2^8: 4 cells/int32
            away_s = []
            for a in range(0, 9, 4):
                t = (acc_a >> (3 * a)) & 7
                for b in range(a + 1, min(a + 4, 9)):
                    t = t | (((acc_a >> (3 * b)) & 7) << (8 * (b - a)))
                w = jnp.sum(es_i * t)
                for b in range(a, min(a + 4, 9)):
                    away_s.append((w >> (8 * (b - a))) & 0xFF)
            scores = [
                (main_s[cc] + away_s[cc]).astype(jnp.float32)
                for cc in range(9)
            ]
            out_ref[pl.ds(idx, 1), :] = jnp.stack(scores).reshape(1, 9)

            return 0

        jax.lax.fori_loop(0, n_valid, one, 0)

    def call(packed_padded, ys, xs, n_valid):
        # single grid step per (batch, variant): the whole-plane VMEM copy
        # happens once, and the candidate loop lives inside the kernel
        # (a per-chunk grid re-DMAs the 1.5 MB plane every step — measured
        # ~0.34 ms/step of pure floor, 27 ms for a 10x8-step call).
        # SMEM inputs are 2-D [1, K]: vmap of pallas_call prepends batch
        # axes and the TPU lowering requires the last two block dims to be
        # whole-array (1-D SMEM blocks get squeezed and rejected)
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, K), lambda c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K), lambda c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (Hc, Wc), lambda c: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (K, 9), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((K, 9), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(Hc * Wc * 4 + (16 << 20)),
            ),
            interpret=interpret,
        )(ys, xs, n_valid, packed_padded)

    return call, Hc, Wc, pad


def exact_rescore_pallas(edge_mask, sx, sy, ys, xs, min_r: int, max_r: int,
                         valid=None, chunk: int = 128,
                         interpret: bool = False):
    """Exact-vote patch scores for circles.exact_rescore's walk (cells=3).

    Candidates must be valid-prefix ordered (centre_candidates guarantees
    this); work stops at the valid count. Returns scores [K, 3, 3] f32.
    """
    H, W = edge_mask.shape
    K = ys.shape[0]
    if K % chunk:
        chunk = max(8, 1 << (K.bit_length() - 4)) if K >= 8 else K
        while K % chunk:
            chunk //= 2
    call, Hc, Wc, pad = _build_kernel(min_r, max_r, H, W, K, chunk, interpret)

    packed = (
        edge_mask.astype(jnp.int32)
        | ((sx + 1024) << 1)
        | ((sy + 1024) << 13)
    )
    packed = jnp.pad(packed, ((pad, Hc - H - pad), (pad, Wc - W - pad)))
    if valid is None:
        n_valid = jnp.full((1, 1), K, jnp.int32)
    else:
        n_valid = jnp.sum(valid, dtype=jnp.int32).reshape(1, 1)
    scores = call(
        packed,
        ys.astype(jnp.int32).reshape(1, K),
        xs.astype(jnp.int32).reshape(1, K),
        n_valid,
    )
    return scores.reshape(K, 3, 3)
