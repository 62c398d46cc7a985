"""On-device A/B of every Pallas-vs-XLA pair, on real fixture planes.

Runs on whatever backend jax selects (the real TPU under axon). For each
kernel pair measures cold-compile time, steady-state runtime, and
bit-equality — the recorded evidence behind each path's default gating
(VERDICT r2 weak #5/#6/#7: the folded cascade was never measured on
device, the Pallas hysteresis kernel never ran on the bench backend, and
interpret-mode tests were the only Pallas evidence).

Usage: python tools/ab_device.py [size ...]   (default: 512 768)

Reference behaviour being accelerated: cv.HoughCircles proposal stage and
cv.Canny hysteresis, /root/reference/img2sgf.py:162-180.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _sync(x):
    # axon: block_until_ready returns early; a host transfer cannot
    return np.asarray(x.ravel()[:1])


def _bench(fn, *args, reps: int = 20):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)  # per-rep host sync, same methodology as _floor_ms —
        # the caller subtracts the floor to recover device time
    run_ms = (time.perf_counter() - t0) / reps * 1e3
    return out, compile_s, run_ms


def _floor_ms(reps: int = 20):
    import jax.numpy as jnp

    x = jnp.zeros((1,), jnp.float32)
    f = __import__("jax").jit(lambda v: v + 1)
    _sync(f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(f(x))
    return (time.perf_counter() - t0) / reps * 1e3


def plane_for(size: int):
    """A real fixture plane: grey variant 0 of ex5 (dense scan), resized
    by canvas-cropping onto the requested square."""
    from img2sgf_tpu.hostio import load_rgb
    from img2sgf_tpu.ops.color import grey_bgr_quirk

    import jax.numpy as jnp

    rgb = load_rgb("/root/reference/test_images/ex5.jpg")
    canv = np.zeros((size, size, 3), np.uint8)
    h = min(size, rgb.shape[0])
    w = min(size, rgb.shape[1])
    canv[:h, :w] = rgb[:h, :w]
    return grey_bgr_quirk(jnp.asarray(canv))


def main(sizes):
    import jax
    import jax.numpy as jnp

    from img2sgf_tpu.config import DetectionConfig
    from img2sgf_tpu.hough.circles import (
        vote_accumulator_cascade,
    )
    from img2sgf_tpu.ops.canny import _nms, hysteresis
    from img2sgf_tpu.ops.hysteresis_pallas import hysteresis_pallas
    from img2sgf_tpu.ops.sobel import sobel3

    cfg = DetectionConfig()
    print(f"backend: {jax.default_backend()}")
    floor = _floor_ms()
    print(f"host-sync floor: {floor:.1f} ms (subtract from every run_ms)")

    for size in sizes:
        grey = plane_for(size)
        dx, dy = sobel3(grey.astype(jnp.int32))
        mag = jnp.abs(dx) + jnp.abs(dy)
        low_t = int(max(cfg.circle_canny_high / 2, 1))
        high_t = int(cfg.circle_canny_high)
        cand = jax.jit(_nms)(mag, dx, dy, low_t)
        strong = cand & (mag > high_t)
        emask = jnp.asarray(
            np.asarray(hysteresis(strong, cand, cfg.hysteresis_iters))
        ).astype(bool) & ((dx != 0) | (dy != 0))

        print(f"\n=== size {size} (ex5 crop) ===")

        # --- cascade: the XLA chain (the one shipped path — the Pallas
        # formulations were measured slower or compile-bound and deleted;
        # record in docs/DESIGN.md "Kernel strategy") ---
        args = (emask, dx, dy, cfg.num_angle_bins, cfg.circle_min_radius,
                cfg.circle_max_radius)
        xla = jax.jit(lambda e, a, b: vote_accumulator_cascade(
            e, a, b, cfg.num_angle_bins, cfg.circle_min_radius,
            cfg.circle_max_radius))
        acc_x, c_x, r_x = _bench(xla, *args[:3])
        print(f"cascade/XLA    : compile {c_x:6.1f}s  run {r_x - floor:7.2f} ms")

        # --- hysteresis: XLA segmented scan vs Pallas VMEM kernel ---
        hx = jax.jit(lambda s, c: hysteresis(s, c, cfg.hysteresis_iters))
        # the public hysteresis() auto-routes to Pallas on TPU now; call
        # the scan path via a 3D batch of 1 (the Pallas gate needs ndim==2)
        hx_scan = jax.jit(
            lambda s, c: hysteresis(s[None], c[None], cfg.hysteresis_iters)[0]
        )
        e_scan, c_hs, r_hs = _bench(hx_scan, strong, cand)
        print(f"hyst/XLA scan  : compile {c_hs:6.1f}s  run {r_hs - floor:7.2f} ms")
        try:
            hp = jax.jit(lambda s, c: hysteresis_pallas(
                s, c, cfg.hysteresis_iters))
            e_p, c_hp, r_hp = _bench(hp, strong, cand)
            same = bool(jnp.array_equal(e_scan > 0, e_p > 0))
            print(f"hyst/Pallas    : compile {c_hp:6.1f}s  run {r_hp - floor:7.2f} ms"
                  f"  bit-exact={same}")
        except Exception as e:
            print(f"hyst/Pallas    : FAILED {type(e).__name__}: {e}")

        # --- exact rescore: XLA vs Pallas, real proposals ---
        from img2sgf_tpu.hough.circles import circle_propose, exact_rescore

        st = jax.jit(lambda img: circle_propose(
            img, cfg.circle_canny_high, cfg.circle_acc_threshold,
            cfg.circle_min_radius, cfg.circle_max_radius,
            cfg.num_angle_bins, cfg.max_center_candidates,
            cfg.hysteresis_iters,
            threshold_factor=cfg.propose_threshold_factor))(grey)
        resc_x = jax.jit(lambda s: exact_rescore(
            s["emask"], s["sx"], s["sy"], s["ys"], s["xs"],
            cfg.circle_min_radius, cfg.circle_max_radius,
            cells=cfg.rescore_cells, valid=s["valid"]))
        px, c_rx, r_rx = _bench(resc_x, st)
        print(f"rescore/XLA    : compile {c_rx:6.1f}s  run {r_rx - floor:7.2f} ms")
        try:
            from img2sgf_tpu.hough.rescore_pallas import exact_rescore_pallas

            resc_p = jax.jit(lambda s: exact_rescore_pallas(
                s["emask"], s["sx"], s["sy"], s["ys"], s["xs"],
                cfg.circle_min_radius, cfg.circle_max_radius,
                valid=s["valid"], cells=cfg.rescore_cells))
            pp, c_rp, r_rp = _bench(resc_p, st)
            same = bool(jnp.array_equal(px, pp))
            print(f"rescore/Pallas : compile {c_rp:6.1f}s  run {r_rp - floor:7.2f} ms"
                  f"  bit-exact={same}")
        except Exception as e:
            print(f"rescore/Pallas : FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [512, 768])
