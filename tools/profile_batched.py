"""Per-stage timing of the STAGED batched pipeline, sync-floor corrected.

Every timed call on the axon tunnel pays a ~28 ms host-sync round trip;
this profiler measures that floor first and subtracts it from every
stage figure. Usage:

  python tools/profile_batched.py [size] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

_FLOOR_MS = 0.0


def _materialize(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench_one(name, fn, *args, reps=5):
    out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _materialize(out)
    dt = (time.perf_counter() - t0) / reps * 1e3 - _FLOOR_MS
    print(f"{name:26s} {dt:9.2f} ms", flush=True)
    return out


def main():
    global _FLOOR_MS
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from img2sgf_tpu.config import DetectionConfig
    from img2sgf_tpu.pipeline import detect_board_batch
    from img2sgf_tpu.pipeline.detect import (
        _circles_on_planes, _post_circles, _pre_circles, _variant_dedup,
    )
    from img2sgf_tpu.hough.circles import (
        circle_propose, circle_recentre, circle_votes, radius_support_pool,
        circle_finalize,
    )

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = DetectionConfig()

    # measure the host-sync floor with a trivial program
    g = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    _materialize(g(z))
    t0 = time.perf_counter()
    for _ in range(20):
        _materialize(g(z))
    _FLOOR_MS = (time.perf_counter() - t0) / 20 * 1e3
    print(f"backend={jax.default_backend()} size={size} batch={batch} "
          f"sync_floor={_FLOOR_MS:.1f} ms (subtracted)")

    import bench

    rgb = jnp.asarray(bench.make_batch(batch, size))
    thr = jnp.full((batch,), 56.0, jnp.float32)

    pre = jax.jit(jax.vmap(lambda im: _pre_circles(im, cfg, None)))
    grey, edges, variants = bench_one("pre(prep+canny+blur)", pre, rgb)

    keep, expand = _variant_dedup(cfg, variants.shape[1])
    Vu = len(keep)
    pool = variants[:, jnp.asarray(keep)].reshape(batch * Vu, size, size)

    def propose(img):
        return circle_propose(
            img, cfg.circle_canny_high, cfg.circle_acc_threshold,
            cfg.circle_min_radius, cfg.circle_max_radius,
            cfg.num_angle_bins, cfg.max_center_candidates,
            cfg.hysteresis_iters,
        )

    f_prop = jax.jit(jax.vmap(propose))
    st = bench_one("propose(stage1)", f_prop, pool)

    from img2sgf_tpu.pipeline.detect import _use_pallas_rescore

    up = _use_pallas_rescore(cfg, size, size)
    f_votes = jax.jit(jax.vmap(
        lambda e, a, b, y, x, v: circle_votes(
            e, a, b, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius,
            use_pallas=up,
        )
    ))
    patch = bench_one(f"votes(pallas={up})", f_votes,
                      st["emask"], st["sx"], st["sy"], st["ys"], st["xs"],
                      st["valid"])

    f_rec = jax.jit(jax.vmap(
        lambda p, y, x, v: circle_recentre(
            p, y, x, v, cfg.circle_acc_threshold, size, size)
    ))
    ys_c, xs_c, votes, valid2 = bench_one(
        "recentre+nms", f_rec, patch, st["ys"], st["xs"], st["valid"])
    print(f"  survivors: {int(jnp.sum(valid2))} / {valid2.size} "
          f"(stage1 valid {int(jnp.sum(st['valid']))})", flush=True)

    f_rad = jax.jit(lambda e, y, x, v: radius_support_pool(
        e, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius))
    r_best, support = bench_one("radius pool", f_rad,
                                st["emask"], ys_c, xs_c, valid2)

    f_fin = jax.jit(jax.vmap(
        lambda y, x, v, r, s: circle_finalize(
            y, x, v, r, s, cfg.circle_acc_threshold, cfg.circle_min_dist,
            cfg.max_circles_per_variant)
    ))
    circles_u, valid_u = bench_one("finalize(greedy)", f_fin,
                                   ys_c, xs_c, valid2, r_best, support)

    vcirc = circles_u.reshape(batch, Vu, -1, 3)[:, jnp.asarray(expand)]
    vval = valid_u.reshape(batch, Vu, -1)[:, jnp.asarray(expand)]
    circles = vcirc.reshape(batch, -1, 3)
    cvalid = vval.reshape(batch, -1)

    f_post = jax.jit(jax.vmap(
        lambda g, e, c, cv, t: _post_circles(g, e, c, cv, cfg, t, None)
    ))
    bench_one("post(erase..board)", f_post, grey, edges, circles, cvalid, thr)

    f_full = jax.jit(lambda im, t: detect_board_batch(im, cfg, t))
    bench_one("detect_board_batch", f_full, rgb, thr)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        _materialize(f_full(rgb, thr))
    dt = (time.perf_counter() - t0) / reps - _FLOOR_MS / 1e3
    print(f"throughput: {batch / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
