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


def bench_real_scans(cfg, sync, bucket: int = 768):
    """Honest content-dependent throughput: the reference fixtures that
    share one canvas bucket, run at native size through the bucketed
    serving path. bucket=768 covers the book scans incl. the dense ex5;
    bucket=1280 covers the large-scan class (ex15-17, ~1.35 MPix — the
    images that exceed the per-plane Pallas-hysteresis VMEM cutoff and so
    exercise the pooled bit-packed hysteresis path). Returns (metric dict
    or None)."""
    import pathlib
    import jax.numpy as jnp

    from img2sgf_tpu.config import choose_line_threshold
    from img2sgf_tpu.pipeline import detect_board_bucket_batch
    from img2sgf_tpu.pipeline.detect import bucket_dim

    fdir = pathlib.Path("/root/reference/test_images")
    if not fdir.is_dir():
        return None
    from img2sgf_tpu.hostio import load_rgb

    imgs = []
    names = []
    for f in sorted(fdir.glob("*.jpg")):
        rgb = load_rgb(str(f))
        h, w = rgb.shape[:2]
        if bucket_dim(h) == bucket and bucket_dim(w) == bucket:
            imgs.append(rgb)
            names.append(f.stem)
    if not imgs:
        return None
    B = len(imgs)
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
    hs, ws, thr = jnp.asarray(hs), jnp.asarray(ws), jnp.asarray(thr)

    res = detect_board_bucket_batch(canv, cfg, thr, hs, ws)  # compile
    sync(res)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(detect_board_bucket_batch(canv, cfg, thr, hs, ws))
    dt = (time.perf_counter() - t0) / reps

    # parity fingerprint (VERDICT r2 #3): the detection results are already
    # in hand — grade them against the committed cv2 goldens so every
    # BENCH_rN.json records whether throughput was bought with parity
    parity = {}
    gdir = pathlib.Path(__file__).parent / "tests" / "golden"
    ready = np.asarray(res.board_ready)
    boards = np.asarray(res.full_board)
    for i, name in enumerate(names):
        sfile = gdir / name / "summary.json"
        if not sfile.exists():
            continue
        want_ready = json.loads(sfile.read_text())["board_ready"]
        if bool(ready[i]) != want_ready:
            parity[name] = "READY_MISMATCH"
        elif want_ready:
            golden = np.load(gdir / name / "board.npy")
            parity[name] = round(float((golden == boards[i]).mean()), 4)
        else:
            parity[name] = "agree_not_ready"

    return {
        "metric": f"native-size reference scans/sec/chip ({B} fixtures, {bucket} bucket)",
        "value": round(B / dt, 2),
        "unit": "images/sec",
        "vs_baseline": round(B / dt / BASELINE_DIAGRAMS_PER_SEC, 2),
        "parity": parity,
    }


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

    # secondary, content-honest metrics first (real book scans at native
    # size — slower than the synthetic number; VERDICT r1 weak #7). The
    # 1280 bucket is the large-scan class (VERDICT r3 #5).
    sync = lambda r: np.asarray(r.board_ready)
    real = bench_real_scans(cfg, sync)
    if real is not None:
        print(json.dumps(real))
    big = bench_real_scans(cfg, sync, bucket=1280)
    if big is not None:
        print(json.dumps(big))

    # the driver parses the LAST line: keep the headline metric there
    print(
        json.dumps(
            {
                "metric": "512x512 diagrams/sec/chip (batched detection)",
                "value": round(throughput, 2),
                "unit": "images/sec",
                "vs_baseline": round(throughput / BASELINE_DIAGRAMS_PER_SEC, 2),
                "real_scan_img_s": None if real is None else real["value"],
                "large_scan_img_s": None if big is None else big["value"],
                "parity": None if real is None else real["parity"],
                "parity_1280": None if big is None else big["parity"],
            }
        )
    )


if __name__ == "__main__":
    main()
