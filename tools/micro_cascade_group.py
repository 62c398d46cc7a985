"""On-device GROUP sweep for the int16 cascade accumulator.

Measures vote_accumulator_cascade at several barrier-group widths on the
current backend and checks bit-equality across them (integer accumulation
is order-independent, so any mismatch is a bug, not noise).

Usage: python tools/micro_cascade_group.py [size] [nplanes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

_FLOOR_MS = 0.0


def _mat(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))


def bench(name, fn, *args, reps=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _mat(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    _mat(out)
    dt = ((time.perf_counter() - t0) * 1e3 - _FLOOR_MS) / reps
    print(f"{name:28s} compile {comp:6.1f}s  run {dt:8.2f} ms", flush=True)
    return out


def main():
    global _FLOOR_MS
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from img2sgf_tpu.hough.circles import vote_accumulator_cascade

    rng = np.random.default_rng(7)
    emask = jnp.asarray(rng.random((P, size, size)) < 0.08)
    dx = jnp.asarray(rng.integers(-255, 256, (P, size, size)).astype(np.int32))
    dy = jnp.asarray(rng.integers(-255, 256, (P, size, size)).astype(np.int32))

    g = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    _mat(g(z))
    t0 = time.perf_counter()
    for _ in range(20):
        _mat(g(z))
    _FLOOR_MS = (time.perf_counter() - t0) / 20 * 1e3
    print(f"backend={jax.default_backend()} size={size} planes={P} "
          f"floor={_FLOOR_MS:.1f} ms")

    CP = 16 if P % 16 == 0 else P

    def make(group):
        def run(e, a, b):
            return jax.lax.map(
                lambda t: jax.vmap(
                    lambda e1, a1, b1: vote_accumulator_cascade(
                        e1, a1, b1, 64, 1, 30, group=group)
                )(*t),
                (e.reshape(P // CP, CP, size, size),
                 a.reshape(P // CP, CP, size, size),
                 b.reshape(P // CP, CP, size, size)),
            )
        return jax.jit(run)

    outs = {}
    for group in (2, 4, 8, 16, 32):
        outs[group] = np.asarray(bench(f"cascade GROUP={group}",
                                       make(group), emask, dx, dy))
    ref = outs[2]
    for group, o in outs.items():
        same = bool((o == ref).all())
        print(f"GROUP={group}: bit-equal vs GROUP=2: {same}")


if __name__ == "__main__":
    main()
