"""Breakdown of circle_propose (stage 1) on the current backend.

The batched profile (tools/profile_batched.py) shows propose dominating
the pipeline; this splits it into sobel / canny / cascade votes / top-k
so optimization targets the measured component. Same methodology: reps
queued asynchronously, one sync, measured floor subtracted.

Usage: python tools/profile_propose.py [size] [nplanes]
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

_FLOOR_MS = 0.0


def _mat(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    _mat(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    _mat(out)
    dt = ((time.perf_counter() - t0) * 1e3 - _FLOOR_MS) / reps
    print(f"{name:32s} {dt:9.2f} ms", flush=True)
    return out


def main():
    global _FLOOR_MS
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from img2sgf_tpu.config import DetectionConfig
    from img2sgf_tpu.hough.circles import (
        centre_candidates, pixel_steps, vote_accumulator,
        vote_accumulator_cascade,
    )
    from img2sgf_tpu.ops.canny import canny
    from img2sgf_tpu.ops.sobel import sobel3
    from img2sgf_tpu.pipeline.detect import _use_pallas_rescore

    cfg = DetectionConfig()

    g = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    _mat(g(z))
    t0 = time.perf_counter()
    for _ in range(20):
        _mat(g(z))
    _FLOOR_MS = (time.perf_counter() - t0) / 20 * 1e3
    print(f"backend={jax.default_backend()} size={size} planes={P} "
          f"floor={_FLOOR_MS:.1f} ms")

    import bench as bench_mod

    B = max(1, P // 8)
    rgb = bench_mod.make_batch(B, size)
    grey = np.asarray(rgb[..., 0])
    planes = jnp.asarray(
        np.repeat(grey, -(-P // B), axis=0)[:P]
    )
    up = _use_pallas_rescore(cfg, size, size)
    CP = 16 if P % 16 == 0 else P

    def chunked(f):
        def run(pl_):
            return jax.lax.map(
                jax.vmap(f), pl_.reshape(P // CP, CP, size, size)
            )
        return jax.jit(run)

    f_sobel = chunked(lambda im: sobel3(im.astype(jnp.int32)))
    dxdy = bench("sobel3", f_sobel, planes)

    f_canny = chunked(
        lambda im: canny(im, max(cfg.circle_canny_high / 2, 1),
                         cfg.circle_canny_high, iters=cfg.hysteresis_iters)
    )
    bench("canny(low=50,high=100)", f_canny, planes)

    def emask_of(im):
        dx, dy = sobel3(im.astype(jnp.int32))
        edges = canny(im, max(cfg.circle_canny_high / 2, 1),
                      cfg.circle_canny_high, iters=cfg.hysteresis_iters)
        return (edges > 0) & ((dx != 0) | (dy != 0)), dx, dy

    pre = jax.jit(chunked(lambda im: emask_of(im)))
    em, dx, dy = jax.tree_util.tree_map(
        lambda x: x.reshape(P, size, size), pre(planes)
    )

    f_casc = jax.jit(lambda e, a, b: jax.lax.map(
        lambda t: jax.vmap(lambda e1, a1, b1: vote_accumulator_cascade(
            e1, a1, b1, cfg.num_angle_bins, cfg.circle_min_radius,
            cfg.circle_max_radius))(*t),
        (e.reshape(P // CP, CP, size, size),
         a.reshape(P // CP, CP, size, size),
         b.reshape(P // CP, CP, size, size)),
    ))
    acc = bench("cascade votes (XLA int-ladder)", f_casc, em, dx, dy)
    acc = acc.reshape(P, size, size)

    f_topk = jax.jit(lambda a: jax.lax.map(
        jax.vmap(lambda a1: centre_candidates(
            a1, cfg.propose_threshold_factor * cfg.circle_acc_threshold,
            cfg.max_center_candidates, block=cfg.propose_block)),
        a.reshape(P // CP, CP, size, size),
    ))
    bench("centre_candidates (top-k)", f_topk, acc)

    f_steps = jax.jit(lambda a, b: jax.lax.map(
        lambda t: jax.vmap(pixel_steps)(*t),
        (a.reshape(P // CP, CP, size, size),
         b.reshape(P // CP, CP, size, size)),
    ))
    bench("pixel_steps", f_steps, dx, dy)

    # ---- stage 2 (candidates) breakdown on the real proposal stream ----
    from img2sgf_tpu.hough.circles import (
        circle_recentre, circle_votes, compact_candidates, provisional_ring,
    )

    st = jax.jit(lambda pl_: jax.lax.map(
        jax.vmap(lambda im: __import__(
            "img2sgf_tpu.hough.circles", fromlist=["circle_propose"]
        ).circle_propose(
            im, cfg.circle_canny_high, cfg.circle_acc_threshold,
            cfg.circle_min_radius, cfg.circle_max_radius,
            cfg.num_angle_bins, cfg.max_center_candidates,
            cfg.hysteresis_iters, use_pallas=up, block=cfg.propose_block,
            threshold_factor=cfg.propose_threshold_factor,
        )),
        pl_.reshape(P // CP, CP, size, size),
    ))(planes)
    st = jax.tree_util.tree_map(
        lambda x: x.reshape(P, *x.shape[2:]), st)
    print(f"  proposals/plane: mean="
          f"{float(jnp.mean(jnp.sum(st['valid'], 1))):.0f}")

    f_v5 = jax.jit(jax.vmap(
        lambda e, a, b, y, x, v: circle_votes(
            e, a, b, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius,
            use_pallas=up, cells=5)
    ))
    patch = bench("  votes 5x5 (pallas=%s)" % up, f_v5, st["emask"],
                  st["sx"], st["sy"], st["ys"], st["xs"], st["valid"])

    f_rec = jax.jit(jax.vmap(
        lambda p, y, x, v: circle_recentre(
            p, y, x, v, cfg.circle_acc_threshold, size, size)
    ))
    bench("  recentre (9-emission)", f_rec, patch, st["ys"], st["xs"],
          st["valid"])

    f_ring = jax.jit(jax.vmap(
        lambda p, y, x, v: provisional_ring(
            p, y, x, v, cfg.circle_acc_threshold, size, size,
            cfg.max_ring_candidates)
    ))
    ring = bench("  provisional ring (top-k)", f_ring, patch, st["ys"],
                 st["xs"], st["valid"])

    f_v3 = jax.jit(jax.vmap(
        lambda e, a, b, y, x, v: circle_votes(
            e, a, b, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius,
            use_pallas=up, cells=3)
    ))
    bench("  ring verify 3x3", f_v3, st["emask"], st["sx"], st["sy"],
          ring[0], ring[1], ring[2])

    K9 = st["ys"].shape[1] * 9 + cfg.max_ring_candidates
    rng2 = np.random.default_rng(1)
    ys_a = jnp.asarray(rng2.integers(1, size - 1, (P, K9)).astype(np.int32))
    xs_a = jnp.asarray(rng2.integers(1, size - 1, (P, K9)).astype(np.int32))
    vo_a = jnp.asarray(rng2.random((P, K9)).astype(np.float32))
    ok_a = jnp.asarray(rng2.random((P, K9)) < 0.03)
    f_cmp = jax.jit(jax.vmap(
        lambda y, x, vv, o: compact_candidates(
            y, x, vv, o, size, cfg.max_peak_candidates, dedupe=True)
    ))
    bench("  compact+dedupe", f_cmp, ys_a, xs_a, vo_a, ok_a)


if __name__ == "__main__":
    main()
