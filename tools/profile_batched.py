"""Per-stage timing of the STAGED batched pipeline, sync-floor corrected.

Every host sync on the axon tunnel pays a ~28-50 ms round trip, so timing
one rep per sync drowns small stages in floor noise. Instead each
measurement queues `reps` async dispatches and syncs ONCE at the end
(device executions serialize in order), so the floor is paid once and
divided by reps. Usage:

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


def bench_one(name, fn, *args, reps=10):
    out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)  # async dispatch; device executions serialize in order
    out = fn(*args)
    _materialize(out)  # one sync for the whole train
    dt = ((time.perf_counter() - t0) * 1e3 - _FLOOR_MS) / reps
    print(f"{name:28s} {dt:9.2f} ms", flush=True)
    return out


def main():
    global _FLOOR_MS
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from img2sgf_tpu.config import DetectionConfig
    from img2sgf_tpu.pipeline import detect_board_batch
    from img2sgf_tpu.pipeline.detect import (
        _circles_on_planes, _circles_pooled, _post_circles, _pre_circles,
        _use_pallas_rescore, _variant_dedup,
    )
    from img2sgf_tpu.hough.circles import (
        circle_propose, circle_candidates, radius_support_pool,
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
          f"sync_floor={_FLOOR_MS:.1f} ms (paid once per rep train)")

    import bench

    rgb = jnp.asarray(bench.make_batch(batch, size))
    thr = jnp.full((batch,), 56.0, jnp.float32)

    pre = jax.jit(jax.vmap(lambda im: _pre_circles(im, cfg, None)))
    grey, edges, variants = bench_one("pre(prep+canny+blur)", pre, rgb)

    keep, expand = _variant_dedup(cfg, variants.shape[1])
    Vu = len(keep)
    pool = variants[:, jnp.asarray(keep)].reshape(batch * Vu, size, size)
    up = _use_pallas_rescore(cfg, size, size)

    def propose(img):
        return circle_propose(
            img, cfg.circle_canny_high, cfg.circle_acc_threshold,
            cfg.circle_min_radius, cfg.circle_max_radius,
            cfg.num_angle_bins, cfg.max_center_candidates,
            cfg.hysteresis_iters, block=cfg.propose_block,
            threshold_factor=cfg.propose_threshold_factor,
        )

    f_prop = jax.jit(jax.vmap(propose))
    st = bench_one("propose(stage1)", f_prop, pool)
    v1 = np.asarray(jnp.sum(st["valid"], axis=1))
    print(f"  stage1 valid/plane: mean={v1.mean():.0f} max={v1.max()}")

    H = W = size

    f_cand = jax.jit(jax.vmap(
        lambda e, a, b, y, x, v: circle_candidates(
            e, a, b, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius,
            cfg.circle_acc_threshold, H, W, use_pallas=up,
            prov_budget=cfg.max_ring_candidates,
            peak_budget=cfg.max_peak_candidates,
        )
    ))
    ys_c, xs_c, votes, valid2, ring_sat = bench_one(
        f"candidates(5x5+ring,p={up})", f_cand,
        st["emask"], st["sx"], st["sy"], st["ys"], st["xs"], st["valid"])
    v2 = np.asarray(jnp.sum(valid2, axis=1))
    print(f"  valid2/plane: mean={v2.mean():.0f} max={v2.max()} "
          f"ring_sat={int(np.asarray(ring_sat).sum())}/{len(v2)}")

    f_rad = jax.jit(lambda e, y, x, v: radius_support_pool(
        e, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius))
    r_best, support = bench_one("radius pool", f_rad,
                                st["emask"], ys_c, xs_c, valid2)

    f_fin = jax.jit(jax.vmap(
        lambda y, x, v, r, s: circle_finalize(
            y, x, v, r, s, cfg.circle_acc_threshold, cfg.circle_min_dist,
            cfg.max_circles_per_variant)
    ))
    circles_u, valid_u = bench_one("finalize(sort+greedy)", f_fin,
                                   ys_c, xs_c, valid2, r_best, support)

    f_base = jax.jit(lambda p: _circles_on_planes(p, cfg, None))
    _, _, sat = bench_one("circles_base(no overflow)", f_base, pool)
    print(f"  saturated planes: {int(np.asarray(sat).sum())}/{sat.shape[0]}")
    f_pool = jax.jit(lambda p: _circles_pooled(p, cfg, None))
    bench_one("circles_pooled(+overflow)", f_pool, pool)

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
    reps = 5
    _materialize(f_full(rgb, thr))
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        f_full(rgb, thr)
    _materialize(f_full(rgb, thr))
    dt = ((time.perf_counter() - t0) - _FLOOR_MS / 1e3) / reps
    print(f"throughput: {batch / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
