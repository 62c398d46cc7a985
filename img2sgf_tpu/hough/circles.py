"""Hough gradient circle detection (cv.HOUGH_GRADIENT semantics).

Reproduces cv.HoughCircles(img, HOUGH_GRADIENT, dp=1, minDist=10,
param1=100, param2=30, minRadius=1, maxRadius=30) as called at
img2sgf.py:180 for each of the 10 blur-pyramid variants.

OpenCV's algorithm (hough.cpp, HoughCirclesGradient):
  1. Sobel gradients + internal Canny(param1/2, param1) edge map.
  2. Every edge pixel votes along +/- its gradient direction at radii
     minR..maxR into a centre accumulator.
  3. Centre candidates: accumulator 4-neighbour local maxima > param2,
     considered in descending vote order.
  4. Greedy acceptance with minDist spacing; per-candidate radius estimated
     from the distance distribution of nearby edge pixels (most-supported
     radius, normalized by circumference); kept if support > param2.

TPU-native design (static shapes, no scatter):
  - Gradient directions are quantized into D bins over [0, pi). Voting
    becomes, per bin, a sum of the bin's edge-pixel plane shifted along the
    bin direction for every radius — computed with a two-level shift
    cascade (5 + 6 shifted adds instead of 30 per side). All shift offsets
    are static; XLA sees pure pad/slice/add chains. Quantization spreads a
    vote by at most ~r*sin(pi/2D) ~ 1.5 px at D=64, comparable to the
    integer snapping of OpenCV's own fixed-point walk.
  - Candidate extraction is top_k over the masked accumulator (vote-order
    ties break by flat index, matching OpenCV's sort).
  - Radius estimation gathers a (2*maxR+1)^2 window per candidate and bins
    edge distances with a static one-hot matmul (MXU), scoring bins by
    support/radius like OpenCV's run scan.
  - The greedy minDist pass is a tiny fori_loop over the top-K candidates.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.canny import canny
from ..ops.common import shift2d
from ..ops.sobel import sobel3


def _walk_offsets(ux: float, uy: float, min_r: int, max_r: int):
    """Exact OpenCV vote-walk offsets for direction (ux, uy), both ways.

    OpenCV steps x1 = x0*1024 + r*sx with sx = round(1024*ux) and lands on
    cell x1 >> 10 (arithmetic shift = floor). Offsets therefore are
    floor(r*sx/1024) for the + direction and floor(-r*sx/1024) for the -
    direction (not the negation!). Duplicate cells get multiple votes, so
    we return (dy, dx) -> weight.
    """
    sx = round(1024 * ux)
    sy = round(1024 * uy)
    weights: dict[tuple[int, int], int] = {}
    for sign in (1, -1):
        for r in range(min_r, max_r + 1):
            o = (math.floor(sign * r * sy / 1024), math.floor(sign * r * sx / 1024))
            weights[o] = weights.get(o, 0) + 1
    return weights


def _cascade_tables(num_bins: int, min_r: int, max_r: int, seg: int = 5):
    """Static offset tables for the two-level cascade accumulator.

    Radii [min_r, max_r] are split into segments of `seg` consecutive radii
    centred at t_m. Per bin, a partial plane P = sum_j shift(e_d, round(j*u))
    over the centred inner offsets j in [-seg//2, seg//2] is built once and
    reused by BOTH walk directions (inner offsets are odd-symmetric under
    banker's rounding), then sampled at +/-round(t_m*u) per segment.
    Approximation error vs the exact fixed-point walk cell is <= 1 px per
    coordinate — same class as the direction quantization itself.
    """
    n = max_r - min_r + 1
    assert n % seg == 0, "radius span must divide into whole segments"
    half = seg // 2
    inner, outer = [], []
    for d in range(num_bins):
        phi = d * math.pi / num_bins
        ux, uy = math.cos(phi), math.sin(phi)
        inner.append(
            [(int(np.round(j * uy)), int(np.round(j * ux)))
             for j in range(-half, half + 1)]
        )
        outs = []
        for m in range(n // seg):
            t = min_r + half + m * seg
            by, bx = int(np.round(t * uy)), int(np.round(t * ux))
            outs.append((by, bx))
            outs.append((-by, -bx))
        outer.append(outs)
    return inner, outer


def vote_accumulator_cascade(edge_mask, dx, dy, num_bins: int, min_r: int,
                             max_r: int):
    """Approximate centre-vote accumulator via a two-level shift cascade.

    Same role as vote_accumulator stage 1 (candidate proposal; exact votes
    are restored by exact_rescore), at ~18 plane-ops per direction bin
    instead of ~55.
    """
    ang = jnp.arctan2(dy.astype(jnp.float32), dx.astype(jnp.float32))
    step = math.pi / num_bins
    bins = jnp.round(ang / step).astype(jnp.int32) % num_bins

    H, W = edge_mask.shape
    inner, outer = _cascade_tables(num_bins, min_r, max_r)
    B = max_r  # max |outer offset| coordinate
    pad = B + 3  # + max |inner offset| (<= seg//2 + rounding)
    packed = jnp.where(edge_mask, bins, num_bins).astype(jnp.int32)
    packed = jnp.pad(packed, pad, constant_values=num_bins)

    acc = jnp.zeros((H, W), jnp.float32)
    GROUP = 4  # bins per barrier step: fewer acc materialisations (HBM
    # round-trips) while keeping liveness bounded to a few planes
    # bf16 integers are exact only below 2^8: contrib <= n_out*seg = 2*n
    # votes per bin and the group sum adds GROUP of them, so the bf16 path
    # requires GROUP*2*n <= 256 (true for the r in [1,30] default: 240);
    # wider radius spans accumulate in f32 to stay exact
    n_r = max_r - min_r + 1
    group_dtype = jnp.bfloat16 if GROUP * 2 * n_r <= 256 else jnp.float32
    for g in range(0, num_bins, GROUP):
        gsum = None
        for d in range(g, min(g + GROUP, num_bins)):
            # bf16 halves the HBM traffic of the shift chains; values stay
            # exact (P sums <= seg <= 5 ones, contrib accumulates in f32)
            e_d = (packed == d).astype(group_dtype)
            # partial plane over the expanded domain [H+2B, W+2B]
            P = None
            for (jy, jx) in inner[d]:
                t = jax.lax.slice(
                    e_d, (pad - B - jy, pad - B - jx),
                    (pad - B - jy + H + 2 * B, pad - B - jx + W + 2 * B),
                )
                P = t if P is None else P + t
            contrib = None
            for (by, bx) in outer[d]:
                t = jax.lax.slice(P, (B - by, B - bx), (B - by + H, B - bx + W))
                contrib = t if contrib is None else contrib + t
            # the whole group stays bf16: contrib <= 12*seg = 60 and
            # gsum <= GROUP*60 = 240 < 256, exact bf16 integers
            gsum = contrib if gsum is None else gsum + contrib
        # serialise per-group schedules to bound liveness (see below)
        acc, packed = jax.lax.optimization_barrier(
            (acc + gsum.astype(jnp.float32), packed)
        )
    return acc


def vote_accumulator(edge_mask, dx, dy, num_bins: int, min_r: int, max_r: int,
                     use_pallas: bool = False):
    """Centre-vote accumulator A[H, W] (f32).

    edge_mask: [H, W] bool (Canny edges with nonzero gradient).
    dx, dy: int32 Sobel gradients.
    """
    # the cascade only feeds the (already approximate) proposal stage; the
    # exact per-offset chain below remains for A/B and radius spans that
    # don't divide into segments. (A VMEM-resident Pallas cascade exists
    # in cascade_pallas.py but measures SLOWER than this XLA chain —
    # dynamic lane rotates dominate — so it stays experimental;
    # `use_pallas` is accepted for signature parity with the other stages.)
    del use_pallas
    if (max_r - min_r + 1) % 5 == 0:
        return vote_accumulator_cascade(edge_mask, dx, dy, num_bins, min_r, max_r)

    ang = jnp.arctan2(dy.astype(jnp.float32), dx.astype(jnp.float32))
    step = math.pi / num_bins
    bins = jnp.round(ang / step).astype(jnp.int32) % num_bins

    # Per bin: one fused kernel of static shifted adds (XLA fuses the
    # unrolled slice chain into a single pass over the bin's edge plane).
    # The optimization barrier each iteration re-issues ALL loop inputs, so
    # bin d+1's edge-plane extraction depends on bin d's accumulate — this
    # serialises the schedule and bounds liveness to ~1 plane. Without it
    # the scheduler hoists all 64 bin planes for ILP and OOMs HBM at batch
    # scale; a fori_loop instead would kill fusion (3840 unfused passes).
    H, W = edge_mask.shape
    pad = max_r
    # pad once; per-bin planes are then pure compare+slice+add chains
    packed = jnp.where(edge_mask, bins, num_bins).astype(jnp.int32)
    packed = jnp.pad(packed, pad, constant_values=num_bins)

    acc = jnp.zeros((H, W), jnp.float32)
    for d in range(num_bins):
        phi = d * step
        e_d = (packed == d).astype(jnp.float32)
        contrib = None
        for (oy, ox), w in _walk_offsets(math.cos(phi), math.sin(phi), min_r, max_r).items():
            t = jax.lax.slice(
                e_d, (pad - oy, pad - ox), (pad - oy + H, pad - ox + W)
            )
            t = t * float(w) if w != 1 else t
            contrib = t if contrib is None else contrib + t
        acc, packed = jax.lax.optimization_barrier((acc + contrib, packed))
    return acc


def centre_candidates(acc, acc_threshold: float, top_k: int, hw=None):
    """Accumulator local maxima > threshold, descending vote order.

    Returns (ys, xs, votes, valid) each [top_k]. Border cells excluded
    (OpenCV scans y, x in [1, size-2]); with hw=(h, w) the scan bound is
    the content block, not the canvas.
    """
    H, W = acc.shape
    h, w = (H, W) if hw is None else hw
    left = shift2d(acc, 0, 1)
    right = shift2d(acc, 0, -1)
    up = shift2d(acc, 1, 0)
    down = shift2d(acc, -1, 0)
    ys_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (ys_i >= 1) & (ys_i <= h - 2) & (xs_i >= 1) & (xs_i <= w - 2)
    is_max = (
        (acc > acc_threshold)
        & (acc > left)
        & (acc >= right)
        & (acc > up)
        & (acc >= down)
        & interior
    )
    score = jnp.where(is_max, acc, -1.0).reshape(-1)
    if W % 2 == 0:
        # lossless 2x shrink before the (sort-bound) top_k: two
        # horizontally adjacent cells can never BOTH be maxima (a >= right
        # contradicts b > left), so the max over each in-row [2] pair
        # keeps every candidate. Exactness incl. tie order: within a pair
        # only one cell can be a valid max (the other scores -1), and
        # across pairs top_k's smaller-index tie rule on pair indices
        # equals the flat-index rule. Even W keeps pairs inside one row
        # (a cross-row pair could hold two maxima); odd-W planes take the
        # direct path below.
        pairs = score.reshape(-1, 2)
        pmax = jnp.max(pairs, axis=1)
        votes, pidx = jax.lax.top_k(pmax, top_k)
        left = jnp.take(score, 2 * pidx)
        flat = 2 * pidx + jnp.where(left == votes, 0, 1)
    else:
        votes, flat = jax.lax.top_k(score, top_k)
    valid = votes > 0
    return flat // W, flat % W, votes, valid


def pixel_steps(dx, dy):
    """Per-pixel fixed-point walk steps, exactly OpenCV: sx =
    cvRound(1024*dx/mag) with mag = sqrt(dx^2+dy^2) in float32."""
    fx = dx.astype(jnp.float32)
    fy = dy.astype(jnp.float32)
    mag = jnp.sqrt(fx * fx + fy * fy)
    safe = jnp.maximum(mag, 1e-20)
    sx = jnp.rint(1024.0 * fx / safe).astype(jnp.int32)
    sy = jnp.rint(1024.0 * fy / safe).astype(jnp.int32)
    return sx, sy


def exact_rescore(edge_mask, sx, sy, ys, xs, min_r: int, max_r: int,
                  cells: int = 3, valid=None, with_radius: bool = True):
    """Exact OpenCV accumulator votes on a (cells x cells) patch around each
    candidate centre.

    A window pixel p votes for cell c iff for some radius r and sign s,
    floor(r*s*sx_p/1024) == c_x - p_x (same for y) — evaluated with integer
    arithmetic shifts, bit-identical to the reference walk. Returns
    scores [K, cells, cells] f32.
    """
    assert cells in (3, 5), "rescore patch must be 3x3 or 5x5"
    reach = cells // 2
    # pixels up to max_r + reach + ~1.5 away can still land in the patch
    # (floor bias + patch extent), so the gather window is padded by reach+2
    ext = max_r + reach + 2
    win = 2 * ext + 1
    pad = ext + reach
    # pack (edge, sx+1024, sy+1024) into one int32 plane: windows are
    # gathered once instead of three times (gathers dominate this stage)
    packed = (
        edge_mask.astype(jnp.int32)
        | ((sx + 1024) << 1)   # 12-bit field: sx+1024 in [0, 2048]
        | ((sy + 1024) << 13)
    )
    pk = jnp.pad(packed, pad)
    half = reach

    # static per-window-pixel offsets to the candidate cell (p = c + (u-ext))
    uu = np.broadcast_to(np.arange(win)[:, None] - ext, (win, win))
    vv = np.broadcast_to(np.arange(win)[None, :] - ext, (win, win))
    base_oy_np = (-uu).reshape(-1)  # [win*win]
    base_ox_np = (-vv).reshape(-1)
    base_oy = jnp.asarray(base_oy_np, jnp.int32)
    base_ox = jnp.asarray(base_ox_np, jnp.int32)

    # A walk step lands within the patch only if |r*g - b| <= reach + 1.015
    # per coordinate (g = signed unit gradient, b = offset to the candidate,
    # reach + floor bias 1 + fixed-point rounding r*0.5/1024), i.e.
    # |r*g - b|_2 <= L2 = sqrt(2)*(reach + 1.015). Two exact consequences:
    #   * |r - d| <= L2 where d = |b|, so with rhat = round(d) only
    #     k = r - rhat with |k| <= floor(L2 + 0.5) can land
    #     (7 steps at reach 1, 9 at reach 2 — instead of 60);
    #   * the wrong-sign walk (g pointing away from the candidate) requires
    #     d <= L2, so outside the central block of half-width 2*reach
    #     (covers every lattice distance <= L2: max needed is 2.83 <= 2.85
    #     at reach 1, 4.25 <= 4.27 at reach 2) only the toward-the-candidate
    #     sign needs walking. The central block gets a tiny second pass with
    #     the opposite sign.
    # Verified exact against the brute-force 60-step walk in
    # tests/test_circles_exact.py (both patch sizes).
    d_pix = np.sqrt(base_oy_np.astype(np.float64) ** 2 + base_ox_np.astype(np.float64) ** 2)
    rhat = np.round(d_pix).astype(np.int32)
    kmax = int(math.floor(math.sqrt(2.0) * (reach + 1.015) + 0.5))
    ks = range(-kmax, kmax + 1)
    # flat indices of the central block (wrong-sign pass)
    ih = 2 * reach
    inner_flat_np = (
        (np.arange(-ih, ih + 1)[:, None] + ext) * win
        + (np.arange(-ih, ih + 1)[None, :] + ext)
    ).reshape(-1)
    rhat_inner = rhat[inner_flat_np]

    # Radius-band tables for ALL 9 possible recentred positions, fused into
    # one [win^2, 9*nb] one-hot so radius estimation shares the window
    # gathers with the vote rescore AND is computed at the recentred centre
    # (the radius histogram is position-sensitive: a 1 px shift moves edge
    # pixels across 0.5 px bands and changes the support count).
    if with_radius:
        assert cells == 3, "fused radius tables cover the 3x3 recentre only"
        oh_list, dh_list = [], []
        n_bands = None
        for cdy in (-1, 0, 1):
            for cdx in (-1, 0, 1):
                oh, dist, _, nb = _radius_tables(min_r, max_r, ext, cdy, cdx)
                n_bands = nb
                oh_list.append(oh)
                dh_list.append(dist[:, None] * oh)
        band_onehot = jnp.asarray(np.concatenate(oh_list, axis=1))  # [W2, 9*nb]
        band_distoh = jnp.asarray(np.concatenate(dh_list, axis=1))

    def windows(y, x):
        # padded index (y + half) puts the window at unpadded rows y - ext
        p = jax.lax.dynamic_slice(pk, (y + half, x + half), (win, win)).reshape(-1)
        e = (p & 1).astype(jnp.float32)
        wx = ((p >> 1) & 0xFFF).astype(jnp.float32) - 1024.0
        wy = ((p >> 13) & 0xFFF).astype(jnp.float32) - 1024.0
        # non-edge pixels are packed with sx=sy=0 and e=0, so their walk
        # contributes nothing to the e-weighted scores
        return e, wx, wy

    inv1024 = jnp.float32(1.0 / 1024.0)  # exact power-of-two scale
    base_ox_f = base_ox.astype(jnp.float32)
    base_oy_f = base_oy.astype(jnp.float32)

    n_cells = cells * cells
    PER = 6  # 5-bit count fields per int32 accumulator
    n_acc = -(-n_cells // PER)
    reach_f = float(reach)
    cells_f = float(cells)

    def walk_pass(wxs, wys, rhat_s, box_f, boy_f):
        """Bit-packed patch-cell vote counts for one signed walk over a slot
        subset (5 bits per cell, PER cells per int32 accumulator). The chain
        is purely elementwise, so XLA fuses it into a single pass.

        Field capacity: each field counts k-steps landing on one cell for
        one pixel, <= len(ks) <= 9 < 31. f32 replication of the walk:
        |r*s| <= 30720 < 2^24 is an exact f32 integer and /1024 an exact
        scale, so floor reproduces OpenCV's arithmetic shift bit-exactly
        (incl. toward--inf on negatives).
        """
        accs = [jnp.zeros(wxs.shape, jnp.int32) for _ in range(n_acc)]
        one = jnp.int32(1)
        for k in ks:
            r_raw = rhat_s + k
            r_ok = (r_raw >= min_r) & (r_raw <= max_r)
            rv = jnp.asarray(np.clip(r_raw, min_r, max_r).astype(np.float32))[None, :]
            rmask = jnp.asarray(r_ok)[None, :]
            ddx = jnp.floor(rv * wxs * inv1024) - box_f[None, :]
            ddy = jnp.floor(rv * wys * inv1024) - boy_f[None, :]
            inb = (jnp.abs(ddx) <= reach_f) & (jnp.abs(ddy) <= reach_f) & rmask
            code = ((ddy + reach_f) * cells_f + (ddx + reach_f)).astype(jnp.int32)
            code = jnp.where(inb, code, n_cells)
            for a in range(n_acc):
                lo = a * PER
                sel = (code >= lo) & (code < min(lo + PER, n_cells))
                # clamp the shift amount so out-of-slab codes stay defined
                sh = 5 * jnp.clip(code - lo, 0, PER - 1)
                accs[a] = accs[a] + jnp.where(sel, one << sh, 0)
        return accs

    inner_flat = jnp.asarray(inner_flat_np)

    def score_chunk(args):
        cy, cx = args
        e, wx, wy = jax.vmap(windows)(cy, cx)  # [C, W2] each, f32
        # main pass: toward-the-candidate sign only (see pruning proof above)
        proj = wy * base_oy_f[None, :] + wx * base_ox_f[None, :]
        sgn = jnp.where(proj >= 0.0, 1.0, -1.0)
        accs = walk_pass(sgn * wx, sgn * wy, rhat, base_ox_f, base_oy_f)
        # inner pass: central-block slots also walk the opposite sign
        e_i = e[:, inner_flat_np]
        sgn_i = sgn[:, inner_flat_np]
        accs_i = walk_pass(
            -sgn_i * wx[:, inner_flat_np],
            -sgn_i * wy[:, inner_flat_np],
            rhat_inner,
            base_ox_f[inner_flat],
            base_oy_f[inner_flat],
        )

        def cell_count(acc_list, c):
            a, off = divmod(c, PER)
            return ((acc_list[a] >> (5 * off)) & 31).astype(jnp.float32)

        score = [
            jnp.sum(e * cell_count(accs, c), axis=1)
            + jnp.sum(e_i * cell_count(accs_i, c), axis=1)
            for c in range(n_cells)
        ]
        if not with_radius:
            z = jnp.zeros((e.shape[0], 9), jnp.float32)
            return jnp.stack(score, axis=1), z, z
        # fused radius estimate (same window), per recentred patch cell:
        # most-supported distance band at each of the 9 centres (MXU)
        counts = (e @ band_onehot).reshape(-1, 9, n_bands)
        dsums = (e @ band_distoh).reshape(-1, 9, n_bands)
        r_rep = jnp.where(counts > 0, dsums / jnp.maximum(counts, 1.0), 1.0)
        rscore = jnp.where(counts > 0, counts / r_rep, -1.0)
        best = jnp.argmax(rscore, axis=2)
        r_best = jnp.take_along_axis(r_rep, best[:, :, None], 2)[:, :, 0]
        support = jnp.take_along_axis(counts, best[:, :, None], 2)[:, :, 0]
        return jnp.stack(score, axis=1), r_best, support

    # chunk the candidate axis: window gathers for every candidate at once
    # would hold K*win^2 live per array (OOM at batch scale)
    K = ys.shape[0]
    C = min(32, K)
    if valid is None:
        valid = jnp.ones((K,), jnp.bool_)
    if K % C:
        padn = C - K % C
        ys = jnp.concatenate([ys, jnp.zeros((padn,), ys.dtype)])
        xs = jnp.concatenate([xs, jnp.zeros((padn,), xs.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((padn,), jnp.bool_)])

    # candidates arrive in descending vote order, so validity is a prefix:
    # whole trailing chunks are dead and lax.cond (sequential inside
    # lax.map's scan, so a real branch, not a select) skips their gathers
    # and walk entirely — most images fill a fraction of the top_k budget
    def maybe_chunk(args):
        cy, cx, any_valid = args
        nc = cy.shape[0]
        zeros = (
            jnp.zeros((nc, cells * cells), jnp.float32),
            jnp.zeros((nc, 9), jnp.float32),
            jnp.zeros((nc, 9), jnp.float32),
        )
        return jax.lax.cond(
            any_valid, lambda: score_chunk((cy, cx)), lambda: zeros
        )

    chunk_valid = jnp.any(valid.reshape(-1, C), axis=1)
    score, r_best, support = jax.lax.map(
        maybe_chunk, (ys.reshape(-1, C), xs.reshape(-1, C), chunk_valid)
    )
    score = score.reshape(-1, cells * cells)[:K]
    return (
        score.reshape(K, cells, cells),
        r_best.reshape(-1, 9)[:K],    # per recentred patch cell
        support.reshape(-1, 9)[:K],
    )


@functools.lru_cache(maxsize=128)
def _radius_tables(min_r: int, max_r: int, ext: int | None = None,
                   cdy: int = 0, cdx: int = 0):
    """Static distance->band one-hot over the candidate window.

    Bands are width-1 with centres every 0.5 px (two interleaved binnings),
    approximating OpenCV's data-aligned distance runs: a ring spread over
    e.g. [6.9, 7.9] lands fully in the 7.5-centred band instead of being
    split between integer bins. `ext` is the window half-extent (>= max_r);
    (cdy, cdx) shift the centre the distances are measured from (used for
    the recentred patch cells).
    """
    if ext is None:
        ext = max_r
    win = 2 * ext + 1
    u = np.arange(win)[:, None] - ext - cdy - 0.5
    v = np.arange(win)[None, :] - ext - cdx - 0.5
    d = np.sqrt(u * u + v * v)
    keep = (d * d >= min_r * min_r) & (d * d <= max_r * max_r)
    centres = np.arange(2 * min_r, 2 * max_r + 1) * 0.5  # minR, minR+.5, ...
    nb = len(centres)
    onehot = np.zeros((win * win, nb), np.float32)
    df = d.ravel()
    kf = keep.ravel()
    for b, c in enumerate(centres):
        onehot[:, b] = ((df >= c - 0.5) & (df < c + 0.5) & kf).astype(np.float32)
    dist = (df * kf).astype(np.float32)
    return onehot, dist, win, nb


def estimate_radii(edge_mask, ys, xs, min_r: int, max_r: int,
                   acc_threshold: float):
    """Most-supported radius per candidate centre (OpenCV's run scan,
    approximated with unit-width distance bins scored by support/radius).

    Returns (r_best [K] f32, supported [K] bool).
    """
    onehot_np, dist_np, win, nb = _radius_tables(min_r, max_r)
    onehot = jnp.asarray(onehot_np)
    dist = jnp.asarray(dist_np)
    pad = max_r
    ep = jnp.pad(edge_mask.astype(jnp.float32), ((pad, pad), (pad, pad)))

    def one(y, x):
        w = jax.lax.dynamic_slice(ep, (y, x), (win, win)).reshape(-1)
        counts = w @ onehot  # [nb]
        dsums = (w * dist) @ onehot
        r_rep = jnp.where(counts > 0, dsums / jnp.maximum(counts, 1.0), 1.0)
        score = jnp.where(counts > 0, counts / r_rep, -1.0)
        # ties favour the smaller radius: OpenCV scans runs from large r to
        # small and replaces on >=, so the smallest-r max-score run wins;
        # argmax's first-occurrence rule does the same on ascending bands
        best = jnp.argmax(score)
        return r_rep[best], counts[best] > acc_threshold

    # chunk the candidate axis (same OOM concern as exact_rescore)
    K = ys.shape[0]
    C = min(32, K)
    ys_p, xs_p = ys, xs
    if K % C:
        padn = C - K % C
        ys_p = jnp.concatenate([ys, jnp.zeros((padn,), ys.dtype)])
        xs_p = jnp.concatenate([xs, jnp.zeros((padn,), xs.dtype)])
    r_best, supported = jax.lax.map(
        lambda a: jax.vmap(one)(a[0], a[1]),
        (ys_p.reshape(-1, C), xs_p.reshape(-1, C)),
    )
    return r_best.reshape(-1)[:K], supported.reshape(-1)[:K]


def greedy_min_dist(ys, xs, valid, supported, min_dist: float):
    """Sequential acceptance in vote order with centre spacing >= min_dist.

    Candidates too close to an already-accepted circle are skipped; skipped
    or unsupported candidates do not block later ones (OpenCV semantics).
    """
    K = ys.shape[0]
    md2 = min_dist * min_dist
    fy = ys.astype(jnp.float32)
    fx = xs.astype(jnp.float32)
    # the loop is inherently sequential, but positions beyond the last
    # valid candidate can never flip; stop there (dynamic bound — valid
    # candidates are not necessarily a prefix after the vote sort)
    K_i = jnp.arange(K)
    n_live = jnp.max(jnp.where(valid, K_i, -1)) + 1

    def body(i, accepted):
        d2 = (fy - fy[i]) ** 2 + (fx - fx[i]) ** 2
        clash = jnp.any(accepted & (K_i < i) & (d2 < md2))
        ok = valid[i] & supported[i] & jnp.logical_not(clash)
        return accepted.at[i].set(ok)

    return jax.lax.fori_loop(0, n_live, body, jnp.zeros((K,), jnp.bool_))


def circle_propose(img_u8, canny_high: float, acc_threshold: float,
                   min_r: int, max_r: int, num_bins: int, top_k: int,
                   hysteresis_iters: int = 24, hw=None,
                   use_pallas: bool = False):
    """Stage 1: edges + gradient steps + approximate-accumulator proposals.

    Returns dict(emask, sx, sy, ys, xs, valid). A lower threshold (0.5x)
    compensates for direction quantization spreading votes off the true
    peak cell; stage 2 restores exact OpenCV vote counts.
    """
    H, W = img_u8.shape
    if hw is not None:
        from ..ops.common import border_remap

        img_r = border_remap(img_u8, hw[0], hw[1], "replicate")
    else:
        img_r = img_u8
    dx, dy = sobel3(img_r.astype(jnp.int32))
    edges = canny(img_u8, max(canny_high / 2, 1), canny_high,
                  iters=hysteresis_iters, hw=hw)
    emask = (edges > 0) & ((dx != 0) | (dy != 0))

    acc = vote_accumulator(emask, dx, dy, num_bins, min_r, max_r,
                           use_pallas=use_pallas)
    # 0.5x: margin for direction-quantization + cascade rounding smear;
    # stage 2 restores exact votes so extra proposals only cost rescore work
    ys, xs, votes, valid = centre_candidates(acc, 0.5 * acc_threshold, top_k, hw=hw)
    sx, sy = pixel_steps(dx, dy)
    return dict(
        emask=emask,
        sx=jnp.where(emask, sx, 0),
        sy=jnp.where(emask, sy, 0),
        ys=jnp.clip(ys, 0, H - 1),
        xs=jnp.clip(xs, 0, W - 1),
        valid=valid,
    )


def circle_votes(emask, sx, sy, ys, xs, valid, min_r: int, max_r: int,
                 use_pallas: bool = False, cells: int = 3):
    """Stage 2a: exact OpenCV accumulator votes on the (cells x cells)
    patch around each proposal. patch [K, cells, cells] f32.

    cells=5 gives every reachable recentre position (the central 3x3) its
    true 4-neighbourhood, so stage 2b's OpenCV NMS test is exact (no
    out-of-patch fallback accepts)."""
    if use_pallas:
        from .rescore_pallas import exact_rescore_pallas

        return exact_rescore_pallas(emask, sx, sy, ys, xs, min_r, max_r,
                                    valid=valid, cells=cells)
    patch, _r, _s = exact_rescore(
        emask, sx, sy, ys, xs, min_r, max_r, cells=cells, valid=valid,
        with_radius=False,
    )
    return patch


def circle_recentre(patch, ys, xs, valid, acc_threshold: float, H: int, W: int,
                    hw=None):
    """Stage 2b: recentre on the best candidate cell of the exact-vote
    patch, OpenCV NMS + threshold, sort by exact votes (desc, ties by
    y-major flat index).

    With a 5x5 patch (the pipeline path) every cell of the central 3x3 has
    all four neighbours in-patch, so OpenCV's candidate test (votes >
    threshold, > left, >= right, > up, >= down) is evaluated EXACTLY for
    each of the 9 reachable recentre positions; the highest-voted passing
    cell wins (ties to the smaller y-major index = OpenCV's scan order).
    With a legacy 3x3 patch (diagnostic tools) the argmax cell is checked
    with out-of-patch neighbours assumed passing.

    hw=(h, w): content dims inside the canvas — OpenCV scans accumulator
    cells in [1, h-2] x [1, w-2] only, so recentred cells outside that
    interior are rejected (5x5 path).

    Returns (ys_c, xs_c, exact_votes, valid2), all vote-order sorted.
    """
    K, cells = patch.shape[0], patch.shape[1]
    flat = patch.reshape(K, -1)
    if cells == 5:
        h, w = (H, W) if hw is None else hw
        centre = np.array([i * 5 + j for i in (1, 2, 3) for j in (1, 2, 3)])
        v = flat[:, centre]
        nms_ok = (
            (v > flat[:, centre - 1])
            & (v >= flat[:, centre + 1])
            & (v > flat[:, centre - 5])
            & (v >= flat[:, centre + 5])
        )
        offy = jnp.asarray(centre // 5 - 2, jnp.int32)
        offx = jnp.asarray(centre % 5 - 2, jnp.int32)
        cy = ys[:, None] + offy[None, :]
        cx = xs[:, None] + offx[None, :]
        interior = (cy >= 1) & (cy <= h - 2) & (cx >= 1) & (cx <= w - 2)
        ok = nms_ok & (v > acc_threshold) & interior
        sel = jnp.where(ok, v, -1.0)
        best = jnp.argmax(sel, axis=1)  # first occurrence = y-major order
        exact_votes = jnp.take_along_axis(v, best[:, None], axis=1)[:, 0]
        ys_c = jnp.clip(
            jnp.take_along_axis(cy, best[:, None], axis=1)[:, 0], 0, H - 1
        )
        xs_c = jnp.clip(
            jnp.take_along_axis(cx, best[:, None], axis=1)[:, 0], 0, W - 1
        )
        valid2 = valid & jnp.any(ok, axis=1)
    else:
        best_cell = jnp.argmax(flat, axis=1)
        exact_votes = jnp.take_along_axis(flat, best_cell[:, None], axis=1)[:, 0]
        py, px = best_cell // 3, best_cell % 3

        # OpenCV's NMS pattern on the exact votes, where the patch shows the
        # neighbour: > left, >= right, > up, >= down (out-of-patch passes)
        def nbr(dy_, dx_, fallback):
            yy, xx = py + dy_, px + dx_
            inside = (yy >= 0) & (yy < 3) & (xx >= 0) & (xx < 3)
            idx = jnp.clip(yy, 0, 2) * 3 + jnp.clip(xx, 0, 2)
            nv = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
            return jnp.where(inside, nv, fallback)

        nms_ok = (
            (exact_votes > nbr(0, -1, -1.0))
            & (exact_votes >= nbr(0, 1, -1.0))
            & (exact_votes > nbr(-1, 0, -1.0))
            & (exact_votes >= nbr(1, 0, -1.0))
        )
        ys_c = jnp.clip(ys + py - 1, 0, H - 1)
        xs_c = jnp.clip(xs + px - 1, 0, W - 1)
        valid2 = valid & (exact_votes > acc_threshold) & nms_ok
    order = jnp.lexsort((ys_c * W + xs_c, -exact_votes.astype(jnp.int32)))
    return ys_c[order], xs_c[order], exact_votes[order], valid2[order]


def radius_support_pool(emask_planes, ys, xs, want, min_r: int, max_r: int,
                        chunk: int | None = None):
    """Radius estimate + band support at given centres, for a POOL of
    planes — cost proportional to the number of `want` candidates.

    emask_planes [P, H, W] bool; ys/xs/want [P, K]. The pool is flattened,
    sorted want-first, and processed in chunks under lax.map whose per-
    chunk lax.cond skips all-dead chunks. This only branches for real when
    the caller is NOT inside a vmap (vmap lowers cond to select) — which
    is exactly how detect_board/_batch call it (the pool axis IS the
    batch x variant axis, outside any vmap).

    Radius semantics match exact_rescore's fused estimate at the recentred
    cell: same _radius_tables bands, distances measured from the centre
    +0.5, ties to the smaller radius. Returns (r_best [P, K] f32,
    support [P, K] f32), zeros where not wanted.
    """
    P, H, W = emask_planes.shape
    K = ys.shape[1]
    N = P * K
    onehot_np, dist_np, win, nb = _radius_tables(min_r, max_r)
    onehot = jnp.asarray(onehot_np)
    distoh = jnp.asarray(dist_np[:, None] * onehot_np)
    pad = max_r
    ep = jnp.pad(emask_planes.astype(jnp.float32),
                 ((0, 0), (pad, pad), (pad, pad)))

    want_f = want.reshape(-1)
    order = jnp.argsort(jnp.logical_not(want_f), stable=True)
    gy = ys.reshape(-1)[order]
    gx = xs.reshape(-1)[order]
    gp = (order // K).astype(jnp.int32)
    gw = want_f[order]

    if chunk is None:
        # scale the chunk with the pool so the scan stays ~<=1024 steps at
        # batch scale (dead steps still cost a scan iteration) while
        # keeping per-step gather memory bounded
        chunk = min(512, max(64, N // 1024))
    C = min(chunk, N)
    while N % C:
        C //= 2
    assert C >= 1

    def one(p, y, x):
        w = jax.lax.dynamic_slice(ep, (p, y, x), (1, win, win)).reshape(-1)
        counts = w @ onehot  # [nb]
        dsums = w @ distoh
        r_rep = jnp.where(counts > 0, dsums / jnp.maximum(counts, 1.0), 1.0)
        score = jnp.where(counts > 0, counts / r_rep, -1.0)
        # ties favour the smaller radius (OpenCV's >= replace on a large-
        # to-small run scan == argmax first-occurrence on ascending bands)
        best = jnp.argmax(score)
        return r_rep[best], counts[best]

    def maybe_chunk(args):
        cp, cy, cx, any_want = args
        zeros = (jnp.zeros((C,), jnp.float32), jnp.zeros((C,), jnp.float32))
        return jax.lax.cond(
            any_want, lambda: jax.vmap(one)(cp, cy, cx), lambda: zeros
        )

    chunk_want = jnp.any(gw.reshape(-1, C), axis=1)
    r_s, s_s = jax.lax.map(
        maybe_chunk,
        (gp.reshape(-1, C), gy.reshape(-1, C), gx.reshape(-1, C), chunk_want),
    )
    inv = jnp.argsort(order)
    r_best = r_s.reshape(-1)[inv].reshape(P, K)
    support = s_s.reshape(-1)[inv].reshape(P, K)
    zero = jnp.zeros((), jnp.float32)
    return (jnp.where(want, r_best, zero), jnp.where(want, support, zero))


def circle_finalize(ys_c, xs_c, valid2, r_best, support, acc_threshold: float,
                    min_dist: float, max_out: int):
    """Stage 3: greedy minDist acceptance in vote order + compaction.

    Returns (circles [max_out, 3] f32 as (cx, cy, r) with OpenCV's +0.5 px
    centre offset, valid [max_out] bool).
    """
    supported = support > acc_threshold
    accepted = greedy_min_dist(ys_c, xs_c, valid2, supported, min_dist)
    order = jnp.argsort(jnp.logical_not(accepted), stable=True)[:max_out]
    out_valid = accepted[order]
    cx = xs_c[order].astype(jnp.float32) + 0.5
    cy = ys_c[order].astype(jnp.float32) + 0.5
    rr = r_best[order]
    circles = jnp.stack([cx, cy, rr], axis=1)
    circles = jnp.where(out_valid[:, None], circles, 0.0)
    return circles, out_valid


def hough_circles_gradient(img_u8, canny_high: float, acc_threshold: float,
                           min_dist: float, min_r: int, max_r: int,
                           num_bins: int, top_k: int, max_out: int,
                           hysteresis_iters: int = 24, hw=None,
                           use_pallas: bool = False, cells: int = 3):
    """Full HOUGH_GRADIENT on one [H, W] uint8 image (stage composition).

    Returns (circles [max_out, 3] f32 as (cx, cy, r), valid [max_out] bool).
    Centres carry OpenCV's +0.5 px offset. hw=(h, w): content dims inside a
    fixed canvas (shape-bucketed mode) — edges are confined to the content
    block, candidate NMS scans its interior, and results match native size.
    """
    H, W = img_u8.shape
    st = circle_propose(img_u8, canny_high, acc_threshold, min_r, max_r,
                        num_bins, top_k, hysteresis_iters, hw=hw)
    patch = circle_votes(st["emask"], st["sx"], st["sy"], st["ys"], st["xs"],
                         st["valid"], min_r, max_r, use_pallas=use_pallas,
                         cells=cells)
    ys_c, xs_c, votes, valid2 = circle_recentre(
        patch, st["ys"], st["xs"], st["valid"], acc_threshold, H, W, hw=hw
    )
    r_best, support = radius_support_pool(
        st["emask"][None], ys_c[None], xs_c[None], valid2[None], min_r, max_r
    )
    return circle_finalize(ys_c, xs_c, valid2, r_best[0], support[0],
                           acc_threshold, min_dist, max_out)
