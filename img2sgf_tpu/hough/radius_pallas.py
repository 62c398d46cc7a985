"""cv2 radius-histogram counts as a VMEM-resident Pallas TPU kernel.

The XLA radius stage (circles.radius_support_pool) is gather-bound the
same way the exact-vote rescore was: each candidate's (2*maxR+1)^2 edge
window is fetched with a dynamic_slice at ~2.6 us per candidate
regardless of size (measured v5e: 36 ms per ~13.7k candidates on the
768-bucket overflow pass), after which the actual histogram matmul is
sub-millisecond. Here the edge plane sits in VMEM once per variant and
each candidate reads an aligned [80, 256] block directly, exactly like
hough/rescore_pallas.py.

Per candidate the kernel emits cv2's 10-bins-per-dr radius histogram
(290 bins at the default r in [1, 30]) as packed bit-fields: every
window cell's bin is STATIC after the roll (the window starts at (0,0)),
so the bin index map, the field shift map, and the word-group map are
numpy-precomputed from the SAME _hist10_tables one-hot that the XLA path
matmuls against — identical binning by construction. Counts are summed
as `e << shift` reductions, `per`-bins-per-int32 (field width chosen
from the table's max bin population, so fields cannot carry).

The run scan over the histogram (_hist10_scan) stays in XLA — it is
[K, nbins]-small. Bit-equality of the unpacked counts vs the XLA
window-gather matmul is pinned by tests/test_circles_exact.py.

Reference behaviour reproduced: the radius estimation of
cv.HoughCircles(HOUGH_GRADIENT) at /root/reference/img2sgf.py:180
(OpenCV 4.x/5.x HoughCircleEstimateRadiusInvoker semantics, see
circles._hist10_tables).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 80
_COLS = 256
_WORK = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=32)
def _bin_tables(min_r: int, max_r: int):
    """Static [_ROWS, _WORK] maps for the rolled window: per-cell bin
    index (-1 outside the annulus/window), derived from the exact
    _hist10_tables one-hot so binning is identical to the XLA path."""
    from .circles import _hist10_tables

    onehot, win, nbins = _hist10_tables(min_r, max_r)
    sel = onehot.sum(axis=1) > 0
    bins = np.where(sel, onehot.argmax(axis=1), -1).reshape(win, win)
    full = np.full((_ROWS, _WORK), -1, np.int32)
    full[:win, :win] = bins
    # field packing: width from the max bin population (no carries)
    maxcount = int(onehot.sum(axis=0).max())
    bits = max(6, (maxcount).bit_length())
    per = 32 // bits
    n_words = -(-nbins // per)
    return full, win, nbins, bits, per, n_words


@functools.lru_cache(maxsize=32)
def _build_kernel(min_r: int, max_r: int, H: int, W: int, K: int,
                  interpret: bool):
    ext = max_r
    bins_np, win, nbins, bits, per, n_words = _bin_tables(min_r, max_r)
    assert win + 7 <= _ROWS and win <= _WORK
    assert max_r >= 1 and min_r >= 1
    pad = ext
    Hc = _round_up(H + 2 * pad + 8, 8)
    Wc = _round_up(W + 2 * pad, 128)
    out_w = _round_up(n_words, 8)
    # lane-padded output words so the [1, out_w] row store stays aligned
    group_np = np.where(bins_np >= 0, bins_np // per, n_words)
    shift_np = np.where(bins_np >= 0, (bins_np % per) * bits, 0)

    def kern(ys_ref, xs_ref, nvalid_ref, plane_ref, group_ref, shift_ref,
             out_ref):
        n_valid = nvalid_ref[0, 0]
        group = group_ref[:, :]
        shift = shift_ref[:, :]

        def one(idx, _):
            y = ys_ref[0, idx]
            x = xs_ref[0, idx]
            oy = y  # window origin in the padded plane: y + pad - ext
            ox = x
            ry0 = jnp.minimum((oy // 8) * 8, Hc - _ROWS)
            cx0 = jnp.minimum((ox // 128) * 128, Wc - _COLS)
            ry0 = pl.multiple_of(ry0, 8)
            cx0 = pl.multiple_of(cx0, 128)
            blk = plane_ref[pl.ds(ry0, _ROWS), pl.ds(cx0, _COLS)]
            roff = oy - ry0
            amt_x = ox - cx0
            blk = pltpu.roll(blk, _ROWS - roff, axis=0)
            blk = pltpu.roll(blk, _COLS - amt_x, axis=1)
            e = blk[:, :_WORK] & 1
            shifted = e << shift
            words = [
                jnp.sum(jnp.where(group == g, shifted, 0))
                for g in range(n_words)
            ]
            words += [jnp.int32(0)] * (out_w - n_words)
            out_ref[pl.ds(idx, 1), :] = jnp.stack(words).reshape(1, out_w)
            return 0

        jax.lax.fori_loop(0, n_valid, one, 0)

    def call(plane_padded, ys, xs, n_valid):
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, K), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((Hc, Wc), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROWS, _WORK), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROWS, _WORK), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, out_w), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, out_w), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(Hc * Wc * 4 + (16 << 20)),
            ),
            interpret=interpret,
        )(ys, xs, n_valid, plane_padded,
          jnp.asarray(group_np), jnp.asarray(shift_np))

    return call, Hc, Wc, pad, nbins, bits, per, n_words


def radius_words_pallas(emask, ys, xs, valid, min_r: int, max_r: int,
                        interpret: bool = False):
    """Packed cv2 radius-histogram words [K, out_w] i32 for one plane
    (unpack with `(words[:, b // per] >> ((b % per) * bits)) & mask`).

    valid must be a live PREFIX (the candidates come from
    compact_candidates); rows beyond the prefix return garbage and must
    be masked by the caller (the kernel only writes visited rows).
    """
    H, W = emask.shape
    K = ys.shape[0]
    call, Hc, Wc, pad, nbins, bits, per, n_words = _build_kernel(
        min_r, max_r, H, W, K, interpret)
    ep = jnp.pad(emask.astype(jnp.int32),
                 ((pad, Hc - H - pad), (pad, Wc - W - pad)))
    n_valid = jnp.sum(valid, dtype=jnp.int32).reshape(1, 1)
    return call(ep, ys.astype(jnp.int32).reshape(1, K),
                xs.astype(jnp.int32).reshape(1, K), n_valid)


def radius_support_pallas(emask_planes, ys, xs, want, min_r: int,
                          max_r: int, interpret: bool = False,
                          chunk: int | None = None):
    """cv2 radius estimate + run support over a POOL of planes, Pallas
    path: emask_planes [P, H, W]; ys/xs/want [P, K] with want a live
    prefix per plane. Returns (r_best [P, K], support [P, K]) f32,
    zeros where not wanted — same contract as
    circles.radius_support_pool.

    The kernel emits packed histogram WORDS per candidate (~0.3 us each,
    vs ~2.6 us for the XLA dynamic_slice window gather); the unpack +
    run scan then runs over the flat pool want-first in cond-skipped
    chunks, exactly like radius_support_pool's gather stage, so its
    [*, nbins] working set scales with LIVE candidates, not the P*K
    budget (a budget-wide scan measured +25 ms per 48-plane base pass).
    """
    from .circles import _hist10_scan

    P, K = ys.shape
    _, _, nbins, bits, per, n_words = _bin_tables(min_r, max_r)
    words = jax.vmap(
        lambda e, y, x, v: radius_words_pallas(
            e, y, x, v, min_r, max_r, interpret=interpret)
    )(emask_planes, ys, xs, want)
    out_w = words.shape[-1]

    N = P * K
    want_f = want.reshape(-1)
    order = jnp.argsort(jnp.logical_not(want_f), stable=True)
    gw = words.reshape(N, out_w)[order]
    gv = want_f[order]

    if chunk is None:
        chunk = min(2048, max(512, N // 128))
    C = min(chunk, N)
    while N % C:
        C //= 2

    b = jnp.arange(nbins, dtype=jnp.int32)
    mask = jnp.int32((1 << bits) - 1)

    def run_chunk(cw):
        counts = ((cw[:, b // per] >> ((b % per) * bits)) & mask
                  ).astype(jnp.float32)
        return _hist10_scan(counts, min_r)

    def maybe_chunk(args):
        cw, any_want = args
        zeros = (jnp.zeros((C,), jnp.float32), jnp.zeros((C,), jnp.float32))
        return jax.lax.cond(any_want, lambda: run_chunk(cw), lambda: zeros)

    chunk_want = jnp.any(gv.reshape(-1, C), axis=1)
    r_s, s_s = jax.lax.map(
        maybe_chunk, (gw.reshape(-1, C, out_w), chunk_want))
    inv = jnp.argsort(order)
    r_best = r_s.reshape(-1)[inv].reshape(P, K)
    support = s_s.reshape(-1)[inv].reshape(P, K)
    zero = jnp.zeros((), jnp.float32)
    return (jnp.where(want, r_best, zero), jnp.where(want, support, zero))
