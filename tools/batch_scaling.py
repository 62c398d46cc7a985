"""Batch-scaling study at 512x512: throughput + device memory high-water
vs batch size, to pick the bench/serving batch (VERDICT r4 #6).

Usage: python tools/batch_scaling.py [batch ...]   (default 8 16 32 64 128)
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


def main():
    import bench as bench_mod
    from img2sgf_tpu.config import DetectionConfig, choose_line_threshold
    from img2sgf_tpu.pipeline import detect_board_batch

    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64, 128]
    size = 512
    cfg = DetectionConfig()
    thr = float(choose_line_threshold(size, size))
    big = bench_mod.make_batch(max(batches), size)

    rows = []
    for B in batches:
        images = jnp.asarray(big[:B])
        thresholds = jnp.full((B,), thr, jnp.float32)
        t0 = time.perf_counter()
        res = detect_board_batch(images, cfg, thresholds)
        np.asarray(res.board_ready)
        compile_s = time.perf_counter() - t0
        reps = max(3, 160 // B)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = detect_board_batch(images, cfg, thresholds)
            np.asarray(res.board_ready)
        dt = (time.perf_counter() - t0) / reps
        mem = None
        try:
            stats = jax.devices()[0].memory_stats()
            mem = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            pass
        row = {"batch": B, "img_per_s": round(B / dt, 2),
               "ms_per_batch": round(dt * 1e3, 1),
               "peak_hbm_gib": mem, "first_call_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = max(rows, key=lambda r: r["img_per_s"])
    print(f"# knee: batch {best['batch']} at {best['img_per_s']} img/s")


if __name__ == "__main__":
    main()
