"""Per-stage timing of the REAL-scan bucketed batch (the bench's 768 path),
sync-floor corrected — where bench.py's real_scan_img_s actually goes.

Times, on the same 6-fixture 768-bucket batch bench.py uses:
  pre        preprocess + outer Canny + blur pyramid (batched)
  state      _plane_state_pool (internal Canny + cascade) over 48 planes
  base       base-budget selection (_circles_from_state)
  overflow   the saturation-gated big-budget rerun on top of base
  post       erase + lines + cluster + grid + identify (vmapped)
  full       detect_board_bucket_batch end to end

Usage: python tools/profile_real.py [bucket]
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
    t_c0 = time.perf_counter()
    out = fn(*args)
    _materialize(out)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    _materialize(out)
    dt = ((time.perf_counter() - t0) * 1e3 - _FLOOR_MS) / reps
    print(f"{name:30s} {dt:9.2f} ms   (first call {compile_s:.1f} s)",
          flush=True)
    return out


def main():
    global _FLOOR_MS
    import pathlib

    from img2sgf_tpu.config import DetectionConfig, choose_line_threshold
    from img2sgf_tpu.hostio import load_rgb
    from img2sgf_tpu.pipeline import detect_board_bucket_batch
    from img2sgf_tpu.pipeline.detect import (
        _circles_from_state, _circles_pooled, _plane_state_pool,
        _post_circles, _pre_circles, _pre_rgb, _variant_dedup, bucket_dim,
    )

    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    cfg = DetectionConfig()

    g = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    _materialize(g(z))
    t0 = time.perf_counter()
    for _ in range(20):
        _materialize(g(z))
    _FLOOR_MS = (time.perf_counter() - t0) / 20 * 1e3
    print(f"backend={jax.default_backend()} bucket={bucket} "
          f"sync_floor={_FLOOR_MS:.1f} ms")

    fdir = pathlib.Path("/root/reference/test_images")
    imgs, names = [], []
    for f in sorted(fdir.glob("*.jpg")):
        rgb = load_rgb(str(f))
        h, w = rgb.shape[:2]
        if bucket_dim(h) == bucket and bucket_dim(w) == bucket:
            imgs.append(rgb)
            names.append(f.stem)
    B = len(imgs)
    print(f"fixtures: {names}")
    canv = np.zeros((B, bucket, bucket, 3), np.uint8)
    hs = np.zeros(B, np.int32)
    ws = np.zeros(B, np.int32)
    thr = np.zeros(B, np.float32)
    for i, rgb in enumerate(imgs):
        h, w = rgb.shape[:2]
        canv[i, :h, :w] = rgb
        hs[i], ws[i] = h, w
        thr[i] = choose_line_threshold(h, w)
    canv = jnp.asarray(canv)
    hs_d, ws_d, thr_d = jnp.asarray(hs), jnp.asarray(ws), jnp.asarray(thr)

    from img2sgf_tpu.ops.canny import canny_rgb_pool

    def pre(c, hh, ww):
        rgbp = jax.vmap(
            lambda im, h, w: _pre_rgb(im, cfg, (h, w))[0])(c, hh, ww)
        edges_b = canny_rgb_pool(rgbp, cfg.edge_min, cfg.edge_max,
                                 cfg.gradient_l2, iters=cfg.hysteresis_iters,
                                 hw_batch=(hh, ww))
        return jax.vmap(
            lambda im, e, h, w: _pre_circles(im, cfg, (h, w), edges=e)
        )(c, edges_b, hh, ww)

    f_pre = jax.jit(pre)
    grey, edges, variants = bench_one("pre(prep+canny+blur)", f_pre,
                                      canv, hs_d, ws_d)

    keep, expand = _variant_dedup(cfg, variants.shape[1])
    Vu = len(keep)
    pool = variants[:, jnp.asarray(keep)].reshape(B * Vu, bucket, bucket)
    hwp = (jnp.repeat(hs_d, Vu), jnp.repeat(ws_d, Vu))

    f_state = jax.jit(lambda p, h, w: _plane_state_pool(cfg=cfg, planes=p,
                                                        hw_planes=(h, w)))
    st = bench_one("state(canny+cascade)", f_state, pool, hwp[0], hwp[1])

    f_base = jax.jit(lambda s, h, w: _circles_from_state(s, cfg, (h, w)))
    c_b, v_b, sat = bench_one("base selection", f_base, st, hwp[0], hwp[1])
    print(f"  saturated planes: {int(np.asarray(sat).sum())}/{B * Vu}")
    f_skip = jax.jit(lambda s, h, w: _circles_from_state(
        s, cfg, (h, w), skip_saturated=True))
    bench_one("base selection (skip-sat)", f_skip, st, hwp[0], hwp[1])

    if "--sub" in sys.argv:
        from img2sgf_tpu.hough.circles import (
            circle_finalize, circle_recentre, circle_votes,
            compact_candidates, propose_from_acc, provisional_ring,
            radius_support_pool,
        )
        from img2sgf_tpu.pipeline.detect import _use_pallas_rescore

        H = W = bucket
        up = _use_pallas_rescore(cfg, H, W)
        f_prop = jax.jit(jax.vmap(
            lambda a, hh, ww: propose_from_acc(
                a, cfg.circle_acc_threshold, cfg.max_center_candidates,
                hw=(hh, ww), block=cfg.propose_block,
                threshold_factor=cfg.propose_threshold_factor,
                margin_factor=cfg.overflow_margin_factor,
            )))
        ys, xs, pvalid, psat = bench_one("  b.propose", f_prop,
                                         st["acc"], hwp[0], hwp[1])
        pvalid = pvalid & jnp.logical_not(psat)[:, None]
        f_votes = jax.jit(jax.vmap(
            lambda e, a, b, y, x, v: circle_votes(
                e, a, b, y, x, v, cfg.circle_min_radius,
                cfg.circle_max_radius, use_pallas=up, cells=5)))
        patch = bench_one("  b.rescore5x5", f_votes, st["emask"], st["sx"],
                          st["sy"], ys, xs, pvalid)
        f_rec = jax.jit(jax.vmap(
            lambda p, y, x, v, hh, ww: circle_recentre(
                p, y, x, v, cfg.circle_acc_threshold, H, W, hw=(hh, ww))))
        ys_c, xs_c, votes_c, ok_c = bench_one(
            "  b.recentre", f_rec, patch, ys, xs, pvalid, hwp[0], hwp[1])
        f_ring = jax.jit(jax.vmap(
            lambda p, y, x, v, hh, ww: provisional_ring(
                p, y, x, v, cfg.circle_acc_threshold, H, W,
                cfg.max_ring_candidates, hw=(hh, ww))))
        ys_p, xs_p, valid_p, n_ring = bench_one(
            "  b.ring-select", f_ring, patch, ys, xs, pvalid,
            hwp[0], hwp[1])
        f_votes3 = jax.jit(jax.vmap(
            lambda e, a, b, y, x, v: circle_votes(
                e, a, b, y, x, v, cfg.circle_min_radius,
                cfg.circle_max_radius, use_pallas=up, cells=3)))
        patch3 = bench_one("  b.ring-rescore3x3", f_votes3, st["emask"],
                           st["sx"], st["sy"], ys_p, xs_p, valid_p)
        cvote = patch3[:, :, 1, 1]
        hh2 = hwp[0][:, None]
        ww2 = hwp[1][:, None]
        ok_p = (valid_p & (cvote > cfg.circle_acc_threshold)
                & (cvote > patch3[:, :, 1, 0]) & (cvote >= patch3[:, :, 1, 2])
                & (cvote > patch3[:, :, 0, 1]) & (cvote >= patch3[:, :, 2, 1])
                & (ys_p >= 1) & (ys_p <= hh2 - 2)
                & (xs_p >= 1) & (xs_p <= ww2 - 2))
        ys_all = jnp.concatenate([ys_c, ys_p], axis=1)
        xs_all = jnp.concatenate([xs_c, xs_p], axis=1)
        votes_all = jnp.concatenate([votes_c, cvote], axis=1)
        ok_all = jnp.concatenate([ok_c, ok_p], axis=1)
        f_comp = jax.jit(jax.vmap(
            lambda y, x, v, o: compact_candidates(
                y, x, v, o, W, cfg.max_peak_candidates, dedupe=True)))
        ys_k, xs_k, votes_k, ok_k, over = bench_one(
            "  b.compact", f_comp, ys_all, xs_all, votes_all, ok_all)
        f_rad = jax.jit(lambda e, y, x, v: radius_support_pool(
            e, y, x, v, cfg.circle_min_radius, cfg.circle_max_radius))
        r_best, support = bench_one("  b.radius", f_rad, st["emask"],
                                    ys_k, xs_k, ok_k)
        f_fin = jax.jit(jax.vmap(
            lambda y, x, v, r, s: circle_finalize(
                y, x, v, r, s, cfg.circle_acc_threshold,
                cfg.circle_min_dist, cfg.max_circles_per_variant)))
        bench_one("  b.finalize", f_fin, ys_k, xs_k, ok_k, r_best, support)

    f_pool = jax.jit(
        lambda p, h, w: _circles_pooled(p, cfg, (h, w)))
    circ_u, val_u = bench_one("state+base+overflow", f_pool,
                              pool, hwp[0], hwp[1])

    vcirc = circ_u.reshape(B, Vu, -1, 3)[:, jnp.asarray(expand)]
    vval = val_u.reshape(B, Vu, -1)[:, jnp.asarray(expand)]
    circles = vcirc.reshape(B, -1, 3)
    cvalid = vval.reshape(B, -1)

    f_post = jax.jit(jax.vmap(
        lambda g_, e, c, cv, t, h, w: _post_circles(
            g_, e, c, cv, cfg, t, (h, w))
    ))
    bench_one("post(erase..board)", f_post, grey, edges, circles, cvalid,
              thr_d, hs_d, ws_d)

    f_full = jax.jit(
        lambda c, t, h, w: detect_board_bucket_batch(c, cfg, t, h, w))
    bench_one("detect_board_bucket_batch", f_full, canv, thr_d, hs_d, ws_d)
    reps = 5
    _materialize(f_full(canv, thr_d, hs_d, ws_d))
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        f_full(canv, thr_d, hs_d, ws_d)
    _materialize(f_full(canv, thr_d, hs_d, ws_d))
    dt = ((time.perf_counter() - t0) - _FLOOR_MS / 1e3) / reps
    print(f"throughput: {B / dt:.2f} img/s")


if __name__ == "__main__":
    main()
