"""Exact-vote rescore as a VMEM-resident Pallas TPU kernel.

The XLA exact_rescore is gather-bound: every candidate's (2*(maxR+3)+1)^2
window is fetched from HBM via dynamic_slice (~41 ms for a full 10x1024
candidate budget at 512x512 — 100x off HBM speed-of-light, dominated by
short strided reads). Here the packed (edge | sx | sy) plane lives in VMEM
once per variant and each candidate reads an aligned [80, 256] block of it
directly — no HBM traffic per candidate at all.

Vote semantics are bit-identical to circles.exact_rescore (the same
per-pixel fixed-point walk, radius pruning |r - rhat| <= 3, and
toward-sign main pass + central away pass — see the proof in circles.py),
verified in tests/test_circles_exact.py.

Status: experimental, not wired into the pipeline. Measured on v5e at
512x512: 72 ms for a full 10x1024 candidate budget (vs 66 ms XLA) but
2.5x faster at partial validity (40 ms vs 99 ms at n=256). In the fused
detect_board program the XLA gather path still wins end-to-end (14.4 vs
13.0 img/s at batch 32) because XLA overlaps its gather latencies with
other stages; revisit if the rescore is ever run standalone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block each candidate reads: rows cover the 67-px window at 8-aligned
# starts (67 + 7 slack <= 80), lanes cover it at 128-aligned starts
# (67 + 127 slack <= 256)
_ROWS = 80
_COLS = 256


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=32)
def _build_kernel(min_r: int, max_r: int, H: int, W: int, K: int, CH: int,
                  interpret: bool):
    ext = max_r + 3          # window half-extent (see circles.exact_rescore)
    pad = ext + 1            # plane padding: window reach + patch half
    Hc = _round_up(H + 2 * pad + 8, 8)
    Wc = _round_up(W + 2 * pad, 128)
    n_chunks = K // CH
    # away-pass radii: landings with the wrong-sign walk require
    # d <= 2*sqrt(2) and r <= d + 2.85 <= 5.68 (circles.py pruning proof);
    # walking the fixed superset r in [min_r, min(max_r, 6)] is exact
    # because out-of-reach steps simply never land
    away_rs = [r for r in range(min_r, min(max_r, 6) + 1)]

    def kern(ys_ref, xs_ref, nvalid_ref, plane_ref, out_ref):
        c = pl.program_id(1)
        n_valid = nvalid_ref[0, 0]

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _COLS), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _COLS), 1)
        inv1024 = jnp.float32(1.0 / 1024.0)

        def one(i, _):
            idx = c * CH + i

            @pl.when(idx < n_valid)
            def _():
                y = ys_ref[0, idx]
                x = xs_ref[0, idx]
                ry0 = jnp.minimum(((y + pad - ext) // 8) * 8, Hc - _ROWS)
                cx0 = jnp.minimum(((x + pad - ext) // 128) * 128, Wc - _COLS)
                ry0 = pl.multiple_of(ry0, 8)
                cx0 = pl.multiple_of(cx0, 128)
                p = plane_ref[pl.ds(ry0, _ROWS), pl.ds(cx0, _COLS)]

                e = (p & 1).astype(jnp.float32)
                wx = ((p >> 1) & 0xFFF).astype(jnp.float32) - 1024.0
                wy = ((p >> 13) & 0xFFF).astype(jnp.float32) - 1024.0

                # offsets from each block pixel TO the candidate centre
                # (c - p, matching base_oy/base_ox in circles.exact_rescore)
                boy = ((y + pad) - (rows_i + ry0)).astype(jnp.float32)
                box = ((x + pad) - (cols_i + cx0)).astype(jnp.float32)
                d2 = boy * boy + box * box
                rhat = jnp.round(jnp.sqrt(d2))

                proj = wy * boy + wx * box
                sgn = jnp.where(proj >= 0.0, 1.0, -1.0)
                txs = sgn * wx
                tys = sgn * wy

                acc1 = jnp.zeros((_ROWS, _COLS), jnp.int32)
                acc2 = jnp.zeros((_ROWS, _COLS), jnp.int32)
                one_i = jnp.int32(1)
                # main pass: toward-the-candidate sign, radii rhat - 3 ..
                # rhat + 3 (all other radii provably cannot land)
                for k in range(-3, 4):
                    r_raw = rhat + k
                    rv = jnp.clip(r_raw, float(min_r), float(max_r))
                    rmask = (r_raw >= min_r) & (r_raw <= max_r)
                    ddx = jnp.floor(rv * txs * inv1024) - box
                    ddy = jnp.floor(rv * tys * inv1024) - boy
                    inb = (jnp.abs(ddx) <= 1.0) & (jnp.abs(ddy) <= 1.0) & rmask
                    code = ((ddy + 1.0) * 3.0 + (ddx + 1.0)).astype(jnp.int32)
                    code = jnp.where(inb, code, 9)
                    lo = code < 5
                    acc1 = acc1 + jnp.where(lo, one_i << (5 * code), 0)
                    acc2 = acc2 + jnp.where(
                        lo | (code > 8), 0, one_i << (5 * (code - 5))
                    )
                # away pass: only edge pixels in the central block
                # (d <= 2*sqrt(2)) can land with the opposite sign, and the
                # centre of a true circle is edge-free, so most candidates
                # skip these steps entirely
                central = d2 <= 8.0
                has_central = jnp.sum(e * central) > 0.0

                def away(accs):
                    a1, a2 = accs
                    for r in away_rs:
                        rvf = jnp.float32(float(r))
                        ddx = jnp.floor(rvf * -txs * inv1024) - box
                        ddy = jnp.floor(rvf * -tys * inv1024) - boy
                        inb = (
                            (jnp.abs(ddx) <= 1.0)
                            & (jnp.abs(ddy) <= 1.0)
                            & central
                        )
                        code = ((ddy + 1.0) * 3.0 + (ddx + 1.0)).astype(jnp.int32)
                        code = jnp.where(inb, code, 9)
                        lo = code < 5
                        a1 = a1 + jnp.where(lo, one_i << (5 * code), 0)
                        a2 = a2 + jnp.where(
                            lo | (code > 8), 0, one_i << (5 * (code - 5))
                        )
                    return a1, a2

                acc1, acc2 = jax.lax.cond(
                    has_central, away, lambda accs: accs, (acc1, acc2)
                )

                scores = [
                    jnp.sum(
                        e
                        * (((acc1 if cc < 5 else acc2)
                            >> (5 * (cc if cc < 5 else cc - 5))) & 31
                           ).astype(jnp.float32)
                    )
                    for cc in range(9)
                ]
                row = jnp.stack(scores).reshape(1, 9)
                out_ref[pl.ds(i, 1), :] = row

            @pl.when(idx >= n_valid)
            def _():
                out_ref[pl.ds(i, 1), :] = jnp.zeros((1, 9), jnp.float32)

            return 0

        jax.lax.fori_loop(0, CH, one, 0)

    def call(packed_padded, ys, xs, n_valid):
        grid = (1, n_chunks)
        # SMEM inputs are 2-D [1, K]: vmap of pallas_call prepends batch
        # axes and the TPU lowering requires the last two block dims to be
        # whole-array (1-D SMEM blocks get squeezed and rejected)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, K), lambda v, c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K), lambda v, c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda v, c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (Hc, Wc), lambda v, c: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (CH, 9), lambda v, c: (c, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((K, 9), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(Hc * Wc * 4 + (8 << 20)),
            ),
            interpret=interpret,
        )(ys, xs, n_valid, packed_padded)

    return call, Hc, Wc, pad


def exact_rescore_pallas(edge_mask, sx, sy, ys, xs, min_r: int, max_r: int,
                         valid=None, chunk: int = 128,
                         interpret: bool = False):
    """Drop-in for circles.exact_rescore (cells=3) on TPU backends.

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
