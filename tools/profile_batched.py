"""Per-stage device-time + bytes-moved roofline of the batched pipeline.

Emits ONE JSON line:
  {"size": 512, "batch": 32, "sync_floor_ms": ..,
   "stage_ms": {...}, "stage_gb": {...}, "bw_util": {...},
   "img_per_s": .., "bound_img_per_s": ..}

stage_ms   sync-floor-corrected wall ms per stage (device-serialized
           dispatch train, one sync per train — see CLAUDE.md on the
           ~28 ms axon host-sync floor).
stage_gb   analytic HBM bytes moved per stage (reads + writes of the
           dominant arrays; fused elementwise chains counted once).
bw_util    stage_gb / stage_ms vs the v5e HBM peak (819 GB/s): how
           close each stage runs to the bandwidth roof. This workload
           has ~zero MXU content (integer/bool plane ops, no matmuls
           beyond the tiny radius histogram), so the MEMORY roof is the
           binding one; MFU would read 0.00 for every stage and is
           reported once for the whole pipeline.
bound_img_per_s  the bandwidth-roof throughput: total bytes at 100%
           HBM utilization.

Composite stages only (pre / state / base / overflow / post) — the
round-4 version timed a dozen separately-jitted substages and spent
9+ minutes cold-compiling them; these five reuse the pipeline's own
entry points and compile in ~2 min cold, seconds warm.

Usage: python tools/profile_batched.py [size] [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

HBM_GBPS = 819.0  # v5e peak HBM bandwidth
_FLOOR_MS = 0.0


def _materialize(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench_one(fn, *args, reps=10):
    out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(*args)
    out = fn(*args)
    _materialize(out)
    dt = ((time.perf_counter() - t0) * 1e3 - _FLOOR_MS) / reps
    return dt, out


def main():
    global _FLOOR_MS

    import bench as bench_mod
    from img2sgf_tpu.config import DetectionConfig, choose_line_threshold
    from img2sgf_tpu.pipeline import detect_board_batch
    from img2sgf_tpu.pipeline.detect import (
        _circles_from_state, _circles_pooled, _plane_state_pool,
        _post_circles, _pre_circles, _variant_dedup,
    )

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = DetectionConfig()

    g = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128), jnp.float32)
    _materialize(g(z))
    t0 = time.perf_counter()
    for _ in range(20):
        _materialize(g(z))
    _FLOOR_MS = (time.perf_counter() - t0) / 20 * 1e3

    rgb = jnp.asarray(bench_mod.make_batch(batch, size))
    thr = jnp.full((batch,), float(choose_line_threshold(size, size)),
                   jnp.float32)

    stage_ms = {}

    pre = jax.jit(jax.vmap(lambda im: _pre_circles(im, cfg, None)))
    stage_ms["pre"], (grey, edges, variants) = bench_one(pre, rgb)

    keep, expand = _variant_dedup(cfg, variants.shape[1])
    Vu = len(keep)
    pool = variants[:, jnp.asarray(keep)].reshape(batch * Vu, size, size)
    P = batch * Vu

    f_state = jax.jit(lambda p: _plane_state_pool(p, cfg, None))
    stage_ms["state"], st = bench_one(f_state, pool)

    f_base = jax.jit(lambda s: _circles_from_state(
        s, cfg, None, skip_saturated=True))
    stage_ms["base_select"], (circ_u, val_u, sat) = bench_one(f_base, st)
    n_sat = int(np.asarray(sat).sum())

    f_pool = jax.jit(lambda p: _circles_pooled(p, cfg, None))
    t_all, (circ_u, val_u) = bench_one(f_pool, pool)
    stage_ms["overflow"] = round(
        max(t_all - stage_ms["state"] - stage_ms["base_select"], 0.0), 2)

    vcirc = circ_u.reshape(batch, Vu, -1, 3)[:, jnp.asarray(expand)]
    vval = val_u.reshape(batch, Vu, -1)[:, jnp.asarray(expand)]
    circles = vcirc.reshape(batch, -1, 3)
    cvalid = vval.reshape(batch, -1)
    f_post = jax.jit(jax.vmap(
        lambda g_, e, c, cv, t: _post_circles(g_, e, c, cv, cfg, t, None)))
    stage_ms["post"], _ = bench_one(f_post, grey, edges, circles, cvalid, thr)

    f_full = jax.jit(lambda im, t: detect_board_batch(im, cfg, t))
    stage_ms["full"], _ = bench_one(f_full, rgb, thr, reps=5)
    for k in stage_ms:
        stage_ms[k] = round(stage_ms[k], 2)

    # --- analytic HBM bytes per stage (reads+writes of dominant arrays) ---
    px = size * size
    n_bins = cfg.num_angle_bins
    n_seg = (cfg.circle_max_radius - cfg.circle_min_radius + 1) // 5
    # pre: rgb u8 read + grey/edge/sobel/nms intermediates + 10-ish
    # elementwise passes over the image + blur pyramid writes (Vu planes)
    pre_gb = batch * px * (3 + 4 * 4 + (Vu + 2) * 1 + 6 * 4) / 1e9
    # state: canny_pool (sobel f32 passes + ~12 packed hysteresis sweeps
    # on uint32/32 planes) + cascade: per 4-plane group, num_bins bins x
    # (label-plane read + n_seg partial-plane traffic) on packed uint32
    hyst_sweeps = 12
    canny_gb = P * px * (4 * 4 + 1) / 1e9 + (P / 32) * px * 4 * 2 * hyst_sweeps / 1e9
    casc_gb = (P / 4) * n_bins * (px * 4 * (1 + 1.4 * n_seg / 6)) / 1e9
    state_gb = canny_gb + casc_gb
    # base: NMS passes (acc f32 x ~6) + pair/top-k (~4 passes) + argsort
    # (sort ~ 6 passes of key+payload) + rescore kernel VMEM-resident
    # (plane DMA per plane) + radius words + finalize small
    base_gb = P * px * 4 * (6 + 4 + 6 * 2) / 1e9 + P * px * 4 * 2 / 1e9
    post_gb = batch * px * (4 * 8) / 1e9  # erase+hough lines sweeps
    stage_gb = {
        "pre": round(pre_gb, 2), "state": round(state_gb, 2),
        "base_select": round(base_gb, 2), "post": round(post_gb, 2),
    }
    bw_util = {
        k: round(stage_gb[k] / HBM_GBPS * 1e3 / stage_ms[k], 2)
        if stage_ms.get(k) else None
        for k in stage_gb
    }
    total_gb = sum(stage_gb.values())
    bound = batch / (total_gb / HBM_GBPS)

    print(json.dumps({
        "size": size, "batch": batch,
        "sync_floor_ms": round(_FLOOR_MS, 1),
        "saturated_planes": f"{n_sat}/{P}",
        "stage_ms": stage_ms,
        "stage_gb": stage_gb,
        "bw_util": bw_util,
        "mfu": 0.0,
        "img_per_s": round(batch / stage_ms["full"] * 1e3, 2),
        "bound_img_per_s": round(bound, 0),
    }))


if __name__ == "__main__":
    main()
