"""Sub-stage timing of the big-budget overflow selection on real dense
planes (ex5's 8 unique variant planes at the 768 bucket) — where the
overflow pass's cost actually sits.

Usage: python tools/profile_overflow.py [n_planes_repeat]
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


def _materialize(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench_one(name, fn, *args, reps=10):
    out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    _materialize(out)
    dt = ((time.perf_counter() - t0) * 1e3 - _FLOOR_MS) / reps
    print(f"{name:34s} {dt:9.2f} ms", flush=True)
    return out


def main():
    global _FLOOR_MS
    from img2sgf_tpu.config import DetectionConfig
    from img2sgf_tpu.hostio import load_rgb
    from img2sgf_tpu.pipeline.detect import (
        _plane_state_pool, _pre_circles, _use_pallas_rescore, _variant_dedup,
        bucket_dim,
    )
    from img2sgf_tpu.hough.circles import (
        circle_finalize, circle_recentre, circle_votes, compact_candidates,
        propose_from_acc, provisional_ring, radius_support_pool,
    )

    cfg = DetectionConfig()
    kb = cfg.overflow_center_candidates
    prov = cfg.overflow_ring_candidates
    peak = cfg.overflow_peak_candidates

    g = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    _materialize(g(z))
    t0 = time.perf_counter()
    for _ in range(20):
        _materialize(g(z))
    _FLOOR_MS = (time.perf_counter() - t0) / 20 * 1e3

    rgb = load_rgb("/root/reference/test_images/ex5.jpg")
    h, w = rgb.shape[:2]
    hb, wb = bucket_dim(h), bucket_dim(w)
    canvas = np.zeros((hb, wb, 3), np.uint8)
    canvas[:h, :w] = rgb
    print(f"ex5 {h}x{w} -> bucket {hb}; budgets kb={kb} ring={prov} "
          f"peak={peak}; sync_floor={_FLOOR_MS:.1f} ms")

    @jax.jit
    def mkstate(img):
        _, _, variants = _pre_circles(img, cfg, (h, w))
        keep, _ = _variant_dedup(cfg, variants.shape[0])
        planes = variants[jnp.asarray(keep)]
        P = planes.shape[0]
        hwp = (jnp.full((P,), h, jnp.int32), jnp.full((P,), w, jnp.int32))
        return _plane_state_pool(planes, cfg, hwp), hwp

    st, hwp = mkstate(jnp.asarray(canvas))
    st = jax.tree_util.tree_map(jnp.asarray, st)
    P = st["acc"].shape[0]
    H, W = st["acc"].shape[-2], st["acc"].shape[-1]
    up = _use_pallas_rescore(cfg, H, W)
    print(f"P={P} planes, pallas={up}")

    f_prop = jax.jit(jax.vmap(
        lambda a, hh, ww: propose_from_acc(
            a, cfg.circle_acc_threshold, kb, hw=(hh, ww),
            block=cfg.propose_block,
            threshold_factor=cfg.propose_threshold_factor,
            margin_factor=cfg.overflow_margin_factor,
            margin_filter=True,
        )))
    ys, xs, pvalid, psat = bench_one("propose k=16384 (mfilt)", f_prop,
                                     st["acc"], hwp[0], hwp[1])
    print(f"  live proposals/plane: "
          f"{np.asarray(jnp.sum(pvalid, 1)).tolist()}")

    f_votes = jax.jit(jax.vmap(
        lambda e, a, b, y, x, v: circle_votes(
            e, a, b, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius,
            use_pallas=up, cells=5)))
    patch = bench_one("rescore 5x5 (pallas)", f_votes,
                      st["emask"], st["sx"], st["sy"], ys, xs, pvalid)

    f_rec = jax.jit(jax.vmap(
        lambda p, y, x, v, hh, ww: circle_recentre(
            p, y, x, v, cfg.circle_acc_threshold, H, W, hw=(hh, ww))))
    ys_c, xs_c, votes_c, ok_c = bench_one("recentre (emit 9)", f_rec,
                                          patch, ys, xs, pvalid,
                                          hwp[0], hwp[1])

    f_ring = jax.jit(jax.vmap(
        lambda p, y, x, v, hh, ww: provisional_ring(
            p, y, x, v, cfg.circle_acc_threshold, H, W, prov, hw=(hh, ww))))
    ys_p, xs_p, valid_p, n_ring = bench_one("ring select", f_ring,
                                            patch, ys, xs, pvalid,
                                            hwp[0], hwp[1])

    f_votes3 = jax.jit(jax.vmap(
        lambda e, a, b, y, x, v: circle_votes(
            e, a, b, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius,
            use_pallas=up, cells=3)))
    patch3 = bench_one("ring rescore 3x3 (pallas)", f_votes3,
                       st["emask"], st["sx"], st["sy"], ys_p, xs_p, valid_p)

    # assemble full stream like circle_candidates does
    c = patch3[:, :, 1, 1]
    hh = hwp[0][:, None]
    ww = hwp[1][:, None]
    ok_p = (valid_p & (c > cfg.circle_acc_threshold)
            & (c > patch3[:, :, 1, 0]) & (c >= patch3[:, :, 1, 2])
            & (c > patch3[:, :, 0, 1]) & (c >= patch3[:, :, 2, 1])
            & (ys_p >= 1) & (ys_p <= hh - 2)
            & (xs_p >= 1) & (xs_p <= ww - 2))
    ys_all = jnp.concatenate([ys_c, ys_p], axis=1)
    xs_all = jnp.concatenate([xs_c, xs_p], axis=1)
    votes_all = jnp.concatenate([votes_c, c], axis=1)
    ok_all = jnp.concatenate([ok_c, ok_p], axis=1)
    print(f"  stream rows/plane: {ys_all.shape[1]}, live: "
          f"{np.asarray(jnp.sum(ok_all, 1)).tolist()}")

    f_comp = jax.jit(jax.vmap(
        lambda y, x, v, o: compact_candidates(
            y, x, v, o, W, peak, dedupe=True, dedupe_first=True)))
    ys_k, xs_k, votes_k, ok_k, over = bench_one(
        "compact dedupe_first (argsort)", f_comp,
        ys_all, xs_all, votes_all, ok_all)

    f_rad = jax.jit(lambda e, y, x, v: radius_support_pool(
        e, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius))
    r_best, support = bench_one("radius pool", f_rad,
                                st["emask"], ys_k, xs_k, ok_k)

    f_fin = jax.jit(jax.vmap(
        lambda y, x, v, r, s: circle_finalize(
            y, x, v, r, s, cfg.circle_acc_threshold, cfg.circle_min_dist,
            cfg.max_circles_per_variant)))
    bench_one("finalize(sort+greedy)", f_fin, ys_k, xs_k, ok_k,
              r_best, support)


if __name__ == "__main__":
    main()
