"""Exact-vote rescore as a VMEM-resident Pallas TPU kernel.

The XLA exact_rescore is gather-bound: every candidate's window is fetched
from HBM via dynamic_slice at ~4.4 us per slice regardless of locality or
formulation (measured: plain/two-step/row-take/aligned slicing all ~45 ms
for a 10x1024 budget at 512x512). Here the packed (edge | sx | sy) plane
lives in VMEM once per variant and each candidate reads an aligned
[80, 256] block of it directly.

v3 kernel (this file) generalises v2 over the patch width `cells` (3 or 5
— 5 is the pipeline default: it gives every reachable recentre position
its true 4-neighbourhood so stage 2b's OpenCV NMS is exact):
  * the block is rotated with `pltpu.roll` so the candidate's win x win
    window starts at (0, 0), which halves the vector width of the walk
    ([80, 128] instead of [80, 256]) and makes every geometric table
    STATIC (centre offsets, rhat, window mask),
  * the per-radius products are incremental adds (r+1)*s = r*s + s in
    int32 (the >> 10 arithmetic shift IS OpenCV's fixed-point floor),
  * patch-cell counters pack 16 cells per int32 at 2 bits per cell.
    The field bound is geometric, not the step count: edge-pixel steps
    are unit-spaced (|(sx, sy)| = 1024 +- 0.71, pixel_steps), so three
    consecutive landings would span >= 1.9986 px and cannot share a
    1 x 1 floor cell (diameter sqrt(2)) — an edge pixel lands AT MOST
    TWICE in any cell per signed walk. Zero-gradient pixels (sx = sy = 0,
    only non-edge pixels) can overflow their own fields, but carries stay
    inside that pixel's lane and its e = 0 weight drops it from every
    score,
  * scoring pairs two cells per int32 reduction at 15-bit spacing (cell
    sums <= 2 * win^2 = 9522 < 2^15, so fields cannot overlap),
  * the opposite-sign "away" pass runs unconditionally on a separate
    [16, 256] slab around the centre row (the only place it can land —
    see the pruning proof in circles.exact_rescore) instead of branching,
  * output is zeroed once and candidates loop with a DYNAMIC trip count
    (fori_loop to n_valid) inside a single grid step per plane — per-chunk
    grids re-DMA the plane every step and empty iterations cost ~3 us.

Vote semantics are bit-identical to circles.exact_rescore (same per-pixel
fixed-point walk, radius pruning |r - rhat| <= kmax, toward-sign main pass
+ central away pass), verified in tests/test_circles_exact.py for both
patch widths.

Reference behaviour being reproduced: the accumulator votes of
cv.HoughCircles(HOUGH_GRADIENT) as called at /root/reference/img2sgf.py:180.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block each candidate reads: rows cover the win-px window at 8-aligned
# starts (win + 7 <= 80 for win <= 69, and the bottom-edge clamp slack is
# absorbed by the plane's trailing padding), lanes cover it at 128-aligned
# starts (win + 127 <= 256); after the roll the window is the [win, win]
# top-left corner and compute runs on [80, 128]
_ROWS = 80
_COLS = 256
_WORK = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=32)
def _build_kernel(min_r: int, max_r: int, H: int, W: int, K: int, CH: int,
                  cells: int, interpret: bool):
    assert cells in (3, 5)
    reach = cells // 2
    ext = max_r + reach + 2  # window half-extent (see circles.exact_rescore)
    win = 2 * ext + 1
    # geometry bounds: rows need win + 7 <= _ROWS, lanes need win <= _WORK,
    # and the paired 15-bit score fields need cell sums <= 2 * win^2 < 2^15.
    # Callers (pipeline._use_pallas_rescore / exact_rescore_pallas) fall
    # back to the XLA exact_rescore otherwise.
    assert max_r + reach <= 32, (
        f"Pallas rescore kernel needs circle_max_radius + reach <= 32, got "
        f"{max_r} + {reach}"
    )
    assert min_r >= 1
    pad = ext + reach        # plane padding: window reach + patch half
    Hc = _round_up(H + 2 * pad + 8, 8)
    Wc = _round_up(W + 2 * pad, 128)
    n_r = max_r - min_r + 1
    n_cells = cells * cells
    # main-pass radius pruning: only |r - rhat| <= kmax can land
    # (|r*g/1024 - b| <= reach + 1.015 per coordinate, see circles.py)
    kmax = int(math.floor(math.sqrt(2.0) * (reach + 1.015) + 0.5))
    # away-pass geometry: wrong-sign landings require lattice distance
    # d <= L2 = sqrt(2)*(reach + 1.015), i.e. d^2 <= d2max, and radius
    # r <= d + L2 (+1 safety; out-of-reach radii simply never land)
    L2 = math.sqrt(2.0) * (reach + 1.015)
    d2max = int(math.floor(L2 * L2))
    ih = 2 * reach           # inner-slab half-width covers all d <= L2
    away_rs = list(range(min_r, min(max_r, int(L2 + math.sqrt(d2max)) + 1) + 1))
    assert 7 + (2 * ih + 1) <= 16  # away slab rows fit the [16, _COLS] block

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
        bxm = box_i - reach                   # ddx+reach = (px>>10) - bxm
        bym = boy_i - reach
        # away-pass slab geometry ([16, _WORK]): wrong-sign landings only
        # come from pixels with d^2 <= d2max, i.e. window rows
        # ext-ih .. ext+ih — read them as a separate aligned block instead
        # of slicing the rolled main block (which trips a Mosaic assert)
        u2 = jax.lax.broadcasted_iota(jnp.int32, (16, _WORK), 0)
        v2 = jax.lax.broadcasted_iota(jnp.int32, (16, _WORK), 1)
        box2 = ext - v2

        # zero the whole output once; the loop then only visits valid
        # candidates (dynamic trip count — invalid ones cost nothing)
        out_ref[:] = jnp.zeros((K, n_cells), jnp.float32)

        def accumulate(tx, ty, r0, rs_ok, bx, by, shape):
            """One signed walk: 2-bit packed per-cell landing counts.
            tx/ty: signed steps; r0: first radius; rs_ok(j): static or
            vectorised radius-validity for step j; bx/by: ddx/ddy bias."""
            n_acc = -(-n_cells // 16)
            accs = [jnp.zeros(shape, jnp.int32) for _ in range(n_acc)]
            px = r0 * tx
            py = r0 * ty
            for j in range(len(rs_ok)):
                if j > 0:
                    px = px + tx
                    py = py + ty
                ddx1 = (px >> 10) - bx        # ddx+reach, valid in [0,cells)
                ddy1 = (py >> 10) - by
                ok = (
                    (ddx1.astype(jnp.uint32) < cells)
                    & (ddy1.astype(jnp.uint32) < cells)
                    & rs_ok[j]
                )
                code = ddy1 * cells + ddx1
                for a in range(n_acc):
                    local = code - 16 * a
                    sel = ok & (local.astype(jnp.uint32) < 16)
                    s = (2 * local) & 31
                    accs[a] = accs[a] + (jnp.where(sel, 1, 0) << s)
                del ddx1, ddy1, ok, code
            return accs

        def pair_scores(accs, e_i):
            """Per-cell e-weighted sums, two cells per int32 reduction at
            15-bit spacing (cell sums <= 2 * win^2 = 9522 < 2^15)."""
            out = []
            for a in range(0, n_cells, 2):
                t = (accs[a // 16] >> (2 * (a % 16))) & 3
                if a + 1 < n_cells:
                    b = a + 1
                    t = t | (((accs[b // 16] >> (2 * (b % 16))) & 3) << 15)
                w = jnp.sum(e_i * t)
                out.append(w & 0x7FFF)
                if a + 1 < n_cells:
                    out.append(w >> 15)
            return out

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
            # rotate so the window origin lands at (0, 0); roff <= 7
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

            # main pass: radii rhat-kmax .. rhat+kmax (all others cannot
            # land); validity via unsigned compare against the radius span
            rs_ok = [
                ((rhs + k).astype(jnp.uint32) < n_r)
                for k in range(-kmax, kmax + 1)
            ]
            accs = accumulate(tx, ty, rhs + (min_r - kmax), rs_ok, bxm, bym,
                              (_ROWS, _WORK))

            # away pass: opposite sign, only central pixels (d^2 <= d2max)
            # can land — a [16, _WORK] slab around the centre row
            # (8-aligned start keeps the reach within 16 rows:
            # offset-in-slab <= 7 + 2*ih + 1 <= 16)
            ry2 = ((oy + ext - ih) // 8) * 8
            ry2 = pl.multiple_of(ry2, 8)
            blk2 = plane_ref[pl.ds(ry2, 16), pl.ds(cx0, _COLS)]
            blk2 = pltpu.roll(blk2, _COLS - amt_x, axis=1)
            p2 = blk2[:, :_WORK]
            wx2 = ((p2 >> 1) & 0xFFF) - 1024
            wy2 = ((p2 >> 13) & 0xFFF) - 1024
            boy2 = ((oy + ext) - ry2) - u2      # centre - pixel (rows)
            d2s = boy2 * boy2 + box2 * box2
            es_i = (p2 & 1) * jnp.where(d2s <= d2max, 1, 0)
            proj2 = wy2 * boy2 + wx2 * box2
            tx2 = jnp.where(proj2 >= 0, wx2, -wx2)
            ty2 = jnp.where(proj2 >= 0, wy2, -wy2)
            true_a = jnp.ones((16, _WORK), jnp.bool_)
            accs_a = accumulate(
                -tx2, -ty2, jnp.int32(away_rs[0]),
                [true_a] * len(away_rs), box2 - reach, boy2 - reach,
                (16, _WORK),
            )

            e_i = (p & 1) * wmask_i
            main_s = pair_scores(accs, e_i)
            away_s = pair_scores(accs_a, es_i)
            scores = [
                (main_s[cc] + away_s[cc]).astype(jnp.float32)
                for cc in range(n_cells)
            ]
            out_ref[pl.ds(idx, 1), :] = jnp.stack(scores).reshape(1, n_cells)

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
                (K, n_cells), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((K, n_cells), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(Hc * Wc * 4 + (16 << 20)),
            ),
            interpret=interpret,
        )(ys, xs, n_valid, packed_padded)

    return call, Hc, Wc, pad


def exact_rescore_pallas(edge_mask, sx, sy, ys, xs, min_r: int, max_r: int,
                         valid=None, chunk: int = 128, cells: int = 3,
                         interpret: bool = False):
    """Exact-vote patch scores for circles.exact_rescore's walk.

    Candidates must be valid-prefix ordered (centre_candidates guarantees
    this); work stops at the valid count. Returns scores
    [K, cells, cells] f32.
    """
    H, W = edge_mask.shape
    K = ys.shape[0]
    if K % chunk:
        chunk = max(8, 1 << (K.bit_length() - 4)) if K >= 8 else K
        while K % chunk:
            chunk //= 2
    call, Hc, Wc, pad = _build_kernel(min_r, max_r, H, W, K, chunk, cells,
                                      interpret)

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
    return scores.reshape(K, cells, cells)
