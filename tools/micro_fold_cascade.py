"""Folded-Pallas vs XLA cascade micro-benchmark on the real chip.

Prints compile wall-time (the Mosaic-blowup check: must be minutes, not
tens of minutes, for the cold bench path) and per-plane runtime with the
~28 ms host-sync floor subtracted (see tools/profile_batched.py).

Usage: python tools/micro_fold_cascade.py [size] [nplanes]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from img2sgf_tpu.hough.cascade_fold_pallas import (
    vote_accumulator_cascade_folded,
)
from img2sgf_tpu.hough.circles import vote_accumulator_cascade


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def floor_ms(reps=20):
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda v: v + 1)
    sync(f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(f(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    emask = jnp.asarray(rng.random((P, size, size)) < 0.08)
    dx = jnp.asarray(rng.integers(-255, 256, (P, size, size)).astype(np.int32))
    dy = jnp.asarray(rng.integers(-255, 256, (P, size, size)).astype(np.int32))

    fl = floor_ms()
    print(f"sync floor: {fl:.1f} ms", flush=True)

    for name, fn in [
        ("xla", vote_accumulator_cascade),
        ("fold", vote_accumulator_cascade_folded),
    ]:
        # chunked lax.map like the pipeline (fast-fusion regime)
        f = jax.jit(
            lambda e, a, b: jax.lax.map(
                lambda t: jax.vmap(
                    lambda e1, a1, b1: fn(e1, a1, b1, 64, 1, 30)
                )(*t),
                (e.reshape(P // 8, 8, size, size),
                 a.reshape(P // 8, 8, size, size),
                 b.reshape(P // 8, 8, size, size)),
            )
        )
        t0 = time.perf_counter()
        out = f(emask, dx, dy)
        sync(out)
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            sync(f(emask, dx, dy))
        dt = (time.perf_counter() - t0) / reps * 1e3 - fl
        print(f"{name}: {dt:.1f} ms / {P} planes = {dt / P:.2f} ms/plane",
              flush=True)

    a = jax.jit(lambda e, x, y: vote_accumulator_cascade(e, x, y, 64, 1, 30))(
        emask[0], dx[0], dy[0])
    b = jax.jit(
        lambda e, x, y: vote_accumulator_cascade_folded(e, x, y, 64, 1, 30)
    )(emask[0], dx[0], dy[0])
    print("bit-exact on device:", bool(jnp.array_equal(a, b)))


if __name__ == "__main__":
    main()
