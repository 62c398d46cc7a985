"""Benchmark: batched 512x512 diagram detection throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference pipeline measured headlessly on CPU at 6.66
diagrams/sec single-thread (BASELINE.md, mean 150.2 ms/image over the 18
fixtures at native size). Here we measure the TPU pipeline on the
BASELINE.json config #5 shape: batched 512x512 scans.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_DIAGRAMS_PER_SEC = 6.66  # reference CPU, BASELINE.md


def make_batch(batch: int, size: int = 512) -> np.ndarray:
    """Synthetic Go-diagram batch: grids + stones rendered with numpy."""
    rng = np.random.default_rng(0)
    imgs = np.full((batch, size, size), 235, np.uint8)
    coords = np.linspace(30, size - 30, 19).astype(int)
    yy, xx = np.mgrid[0:size, 0:size]
    base = np.full((size, size), 235, np.uint8)
    for c in coords:
        base[c, coords[0] : coords[-1] + 1] = 10
        base[coords[0] : coords[-1] + 1, c] = 10
    r = int((coords[1] - coords[0]) * 0.45)
    for b in range(batch):
        img = base.copy()
        occ = rng.random((19, 19)) < 0.25
        colors = rng.random((19, 19)) < 0.5
        for i in range(19):
            for j in range(19):
                if occ[i, j]:
                    m = (xx - coords[i]) ** 2 + (yy - coords[j]) ** 2 <= r * r
                    img[m] = 15 if colors[i, j] else 250
        imgs[b] = img
    return np.repeat(imgs[:, :, :, None], 3, axis=3)


def main():
    import jax
    import jax.numpy as jnp

    from img2sgf_tpu.config import DetectionConfig, choose_line_threshold
    from img2sgf_tpu.pipeline import detect_board_batch

    batch = 32
    size = 512
    cfg = DetectionConfig()
    images = jnp.asarray(make_batch(batch, size))
    thresholds = jnp.full((batch,), float(choose_line_threshold(size, size)), jnp.float32)

    res = detect_board_batch(images, cfg, thresholds)  # compile
    np.asarray(res.board_ready)

    # sync via a device->host transfer of a tiny output: on the axon
    # backend block_until_ready returns before execution finishes, which
    # silently inflates throughput; a transfer can't complete early.
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        res = detect_board_batch(images, cfg, thresholds)
        np.asarray(res.board_ready)
    dt = (time.perf_counter() - t0) / reps
    throughput = batch / dt

    ready = int(np.asarray(res.board_ready).sum())
    assert ready >= batch * 0.9, f"detection collapsed: {ready}/{batch} boards"

    print(
        json.dumps(
            {
                "metric": "512x512 diagrams/sec/chip (batched detection)",
                "value": round(throughput, 2),
                "unit": "images/sec",
                "vs_baseline": round(throughput / BASELINE_DIAGRAMS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
