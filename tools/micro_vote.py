"""A/B the Pallas VMEM vote cascade vs the XLA cascade on the current backend."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from img2sgf_tpu.hough.circles import vote_accumulator_cascade
from img2sgf_tpu.hough.vote_pallas import vote_accumulator_pallas


def _materialize(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _materialize(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    H = W = 512
    V = 10
    rng = np.random.default_rng(0)
    emask = jnp.asarray(rng.random((V, H, W)) < 0.06)
    dx = jnp.asarray(rng.integers(-255, 256, (V, H, W)), jnp.int32)
    dy = jnp.asarray(rng.integers(-255, 256, (V, H, W)), jnp.int32)

    xla = jax.jit(jax.vmap(lambda e, a, b: vote_accumulator_cascade(e, a, b, 64, 1, 30)))
    pls = jax.jit(jax.vmap(lambda e, a, b: vote_accumulator_pallas(e, a, b, 64, 1, 30)))

    a = bench("xla cascade (10 variants)", xla, emask, dx, dy)
    b = bench("pallas cascade (10 var)", pls, emask, dx, dy)
    a = np.asarray(a)
    b = np.asarray(b)
    print("identical:", bool((a == b).all()), " max|diff|:", float(np.abs(a - b).max()))


if __name__ == "__main__":
    main()
