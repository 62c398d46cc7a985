"""Micro-benchmark exact_rescore internals on the current backend.

Breaks the stage into gather / walk / radius-matmul components to find
where the 453 ms (batch 8, 512x512, profile_pipeline) actually goes.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _materialize(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _materialize(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:32s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    from img2sgf_tpu.hough import circles as C

    H = W = 512
    K = 1024
    B = 10  # variants folded into batch for one image
    min_r, max_r = 1, 30
    rng = np.random.default_rng(0)
    emask = jnp.asarray(rng.random((B, H, W)) < 0.06)
    sx = jnp.asarray(rng.integers(-1024, 1025, (B, H, W)), jnp.int32)
    sy = jnp.asarray(rng.integers(-1024, 1025, (B, H, W)), jnp.int32)
    ys = jnp.asarray(rng.integers(31, H - 31, (B, K)), jnp.int32)
    xs = jnp.asarray(rng.integers(31, W - 31, (B, K)), jnp.int32)
    valid = jnp.ones((B, K), jnp.bool_)

    full = jax.jit(
        jax.vmap(
            lambda e, a, b, y, x, v: C.exact_rescore(e, a, b, y, x, min_r, max_r, valid=v)
        )
    )
    bench("exact_rescore (full)", full, emask, sx, sy, ys, xs, valid)

    # gathers only: same window extraction, trivial reduce
    ext = max_r + 3
    win = 2 * ext + 1
    pad = ext + 1

    def gathers_only(e, a, b, y, x):
        packed = e.astype(jnp.int32) | ((a + 1024) << 1) | ((b + 1024) << 13)
        pk = jnp.pad(packed, pad)

        def one(yy, xx):
            p = jax.lax.dynamic_slice(pk, (yy + 1, xx + 1), (win, win))
            return jnp.sum(p)

        def chunk(args):
            return jax.vmap(one)(args[0], args[1])

        cN = 32
        return jax.lax.map(chunk, (y.reshape(-1, cN), x.reshape(-1, cN)))

    bench("gathers only (C=32)", jax.jit(jax.vmap(gathers_only)), emask, sx, sy, ys, xs)

    def gathers_only_c(cN):
        def f(e, a, b, y, x):
            packed = e.astype(jnp.int32) | ((a + 1024) << 1) | ((b + 1024) << 13)
            pk = jnp.pad(packed, pad)

            def one(yy, xx):
                p = jax.lax.dynamic_slice(pk, (yy + 1, xx + 1), (win, win))
                return jnp.sum(p)

            def chunk(args):
                return jax.vmap(one)(args[0], args[1])

            return jax.lax.map(chunk, (y.reshape(-1, cN), x.reshape(-1, cN)))

        return f

    bench("gathers only (C=128)", jax.jit(jax.vmap(gathers_only_c(128))), emask, sx, sy, ys, xs)
    bench("gathers only (C=1024)", jax.jit(jax.vmap(gathers_only_c(1024))), emask, sx, sy, ys, xs)

    # matmul only: window e @ [win^2, 9*nb] one-hot
    nb = 2 * max_r - 2 * min_r + 1
    M = jnp.asarray(rng.random((win * win, 9 * nb)), jnp.float32)
    ewin = jnp.asarray(rng.random((B, K, win * win)) < 0.06, jnp.float32)

    def mm_only(e):
        def chunk(a):
            return a @ M

        return jax.lax.map(chunk, e.reshape(-1, 32, win * win))

    bench("radius matmul x2 only (C=32)", jax.jit(jax.vmap(lambda e: (mm_only(e), mm_only(e)))), ewin)

    def mm_flat(e):
        return e.reshape(-1, win * win) @ M

    bench("radius matmul x2 flat", jax.jit(jax.vmap(lambda e: (mm_flat(e), mm_flat(e)))), ewin)

    # walk only: elementwise chain over [C, win^2] x 7 k-steps x 2 passes
    wxs = jnp.asarray(rng.integers(-1024, 1025, (B, K, win * win)), jnp.float32)
    rhat = np.round(
        np.sqrt(
            ((np.arange(win)[:, None] - ext) ** 2 + (np.arange(win)[None, :] - ext) ** 2)
        )
    ).astype(np.float32).reshape(-1)
    rhat_j = jnp.asarray(rhat)

    def walk_only(wx):
        def chunk(a):
            acc1 = jnp.zeros(a.shape, jnp.int32)
            acc2 = jnp.zeros(a.shape, jnp.int32)
            one = jnp.int32(1)
            for k in range(-3, 4):
                rv = jnp.clip(rhat_j + k, min_r, max_r)[None, :]
                ddx = jnp.floor(rv * a * (1.0 / 1024.0))
                ddy = jnp.floor(rv * a * (1.0 / 1024.0))
                inb = (jnp.abs(ddx) <= 1.0) & (jnp.abs(ddy) <= 1.0)
                code = jnp.where(inb, ((ddy + 1) * 3 + (ddx + 1)).astype(jnp.int32), 9)
                lo = code < 5
                acc1 = acc1 + jnp.where(lo, one << (5 * code), 0)
                acc2 = acc2 + jnp.where(lo | (code > 8), 0, one << (5 * (code - 5)))
            return acc1, acc2

        return jax.lax.map(chunk, wx.reshape(-1, 32, win * win))

    bench("walk only (1 pass, C=32)", jax.jit(jax.vmap(walk_only)), wxs)


if __name__ == "__main__":
    main()
