"""A/B cascade vote-accumulator formulations on the current backend.

Variants:
  base    — shipped vote_accumulator_cascade (GROUP=4 barrier, bf16,
            fusion recomputes e_d per outer slice)
  matP    — materialize ALL per-bin partial planes P_d first (one barrier),
            then one slice+add pass over them (no recompute)
  bins32  — shipped cascade at 32 direction bins (half the work,
            double the quantization smear)

Measured per lax.map chunk of 16 planes x 4 chunks (the pipeline's
execution shape at batch 8 x 8 variants), sync-floor corrected.
"""

from __future__ import annotations

import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from img2sgf_tpu.hough.circles import _cascade_tables, vote_accumulator_cascade

_FLOOR = 0.0


def _mat(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    _mat(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        _mat(fn(*args))
    dt = (time.perf_counter() - t0) / reps * 1e3 - _FLOOR
    print(f"{name:34s} {dt:9.2f} ms", flush=True)
    return out


def cascade_matP(edge_mask, dx, dy, num_bins: int, min_r: int, max_r: int,
                 acc_group: int = 8):
    """Materialize all P_d planes once, then accumulate with pure slices."""
    ang = jnp.arctan2(dy.astype(jnp.float32), dx.astype(jnp.float32))
    step = math.pi / num_bins
    bins = jnp.round(ang / step).astype(jnp.int32) % num_bins

    H, W = edge_mask.shape
    inner, outer = _cascade_tables(num_bins, min_r, max_r)
    B = max_r
    pad = B + 3
    packed = jnp.where(edge_mask, bins, num_bins).astype(jnp.int32)
    packed = jnp.pad(packed, pad, constant_values=num_bins)

    Hp, Wp = H + 2 * B, W + 2 * B
    Ps = []
    for d in range(num_bins):
        e_d = (packed == d).astype(jnp.bfloat16)
        P = None
        for (jy, jx) in inner[d]:
            t = jax.lax.slice(
                e_d, (pad - B - jy, pad - B - jx),
                (pad - B - jy + Hp, pad - B - jx + Wp),
            )
            P = t if P is None else P + t
        Ps.append(P)
    P_all = jax.lax.optimization_barrier(jnp.stack(Ps))

    acc = jnp.zeros((H, W), jnp.float32)
    for g in range(0, num_bins, acc_group):
        gsum = None
        for d in range(g, min(g + acc_group, num_bins)):
            for (by, bx) in outer[d]:
                t = jax.lax.slice(
                    P_all, (d, B - by, B - bx), (d + 1, B - by + H, B - bx + W)
                )[0]
                gsum = t if gsum is None else gsum + t
        acc, P_all = jax.lax.optimization_barrier(
            (acc + gsum.astype(jnp.float32), P_all)
        )
    return acc


def main():
    global _FLOOR
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    H = W = 512
    CP, NCH = 16, 4  # pipeline shape: lax.map over chunks of 16 planes
    rng = np.random.default_rng(0)
    emask = jnp.asarray(rng.random((NCH, CP, H, W)) < 0.06)
    dx = jnp.asarray(rng.integers(-255, 256, (NCH, CP, H, W)), jnp.int32)
    dy = jnp.asarray(rng.integers(-255, 256, (NCH, CP, H, W)), jnp.int32)

    g = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    _mat(g(z))
    t0 = time.perf_counter()
    for _ in range(20):
        _mat(g(z))
    _FLOOR = (time.perf_counter() - t0) / 20 * 1e3
    print(f"backend={jax.default_backend()} floor={_FLOOR:.1f} ms; "
          f"{NCH}x{CP} planes of {H}x{W}")

    def chunked(fn):
        return jax.jit(lambda e, a, b: jax.lax.map(
            lambda t: jax.vmap(fn)(t[0], t[1], t[2]), (e, a, b)))

    base = chunked(lambda e, a, b: vote_accumulator_cascade(e, a, b, 64, 1, 30))
    a = bench("base GROUP=4 64 bins", base, emask, dx, dy)

    for G in (4, 8, 16):
        m = chunked(lambda e, a_, b, G=G: cascade_matP(e, a_, b, 64, 1, 30, G))
        out = bench(f"matP accgroup={G} 64 bins", m, emask, dx, dy)
        same = bool(jnp.all(jnp.asarray(a) == jnp.asarray(out)))
        print(f"    bit-identical to base: {same}")

    b32 = chunked(lambda e, a_, b: vote_accumulator_cascade(e, a_, b, 32, 1, 30))
    bench("base GROUP=4 32 bins", b32, emask, dx, dy)


if __name__ == "__main__":
    main()
