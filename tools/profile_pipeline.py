"""Per-stage timing of the detection pipeline on the current backend.

Measures each pipeline stage in isolation (jitted separately) plus the
fused end-to-end program, at a given size/batch. Usage:

  python tools/profile_pipeline.py [size] [batch]

For an XLA trace viewable in TensorBoard/Perfetto, set
IMG2SGF_TRACE_DIR=/tmp/trace before running.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _materialize(out):
    """Force completion: the axon tunnel's block_until_ready is a no-op, so
    fetch a scalar reduction of every output leaf to the host."""
    import jax
    import jax.numpy as jnp

    # the whole program completes before any output is ready, so fetching
    # one leaf is enough to fence the computation
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench_one(name, fn, *args, reps=3):
    out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _materialize(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    import jax.numpy as jnp

    from img2sgf_tpu.config import DetectionConfig
    from img2sgf_tpu.hough.circles import hough_circles_gradient
    from img2sgf_tpu.hough.erase import erase_circles
    from img2sgf_tpu.hough.lines import hough_lines_intercepts
    from img2sgf_tpu.ops.blur import blur_pyramid
    from img2sgf_tpu.ops.canny import canny
    from img2sgf_tpu.ops.color import grey_bgr_quirk, preprocess
    from img2sgf_tpu.pipeline import detect_board_batch

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = DetectionConfig()
    rng = np.random.default_rng(0)
    if os.environ.get("IMG2SGF_PROFILE_NOISE"):
        rgb = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)), jnp.uint8)
    else:
        # realistic synthetic Go diagrams (same generator as bench.py)
        import bench

        rgb = jnp.asarray(bench.make_batch(batch, size))
    grey8 = rgb[..., 0]
    print(f"backend={jax.default_backend()} size={size} batch={batch}")

    B = jax.vmap

    bench_one("preprocess+grey", jax.jit(B(lambda x: grey_bgr_quirk(preprocess(x, 70.0, 50.0)))), rgb)
    bench_one("canny(rgb)", jax.jit(B(lambda x: canny(x, 50, 200, iters=cfg.hysteresis_iters))), rgb)
    edges = jax.jit(B(lambda x: canny(x, 50, 200, iters=8)))(rgb)
    bench_one("blur_pyramid", jax.jit(B(lambda g, e: blur_pyramid(g, e, 3))), grey8, edges)
    variants = jax.jit(B(lambda g, e: blur_pyramid(g, e, 3)))(grey8, edges)

    def circ(v):
        return hough_circles_gradient(
            v, 100.0, 30.0, 10.0, 1, 30, cfg.num_angle_bins,
            cfg.max_center_candidates, cfg.max_circles_per_variant,
            cfg.hysteresis_iters,
        )

    # circle-stage internals
    from img2sgf_tpu.hough.circles import (
        centre_candidates, exact_rescore, greedy_min_dist,
        pixel_steps, vote_accumulator,
    )
    from img2sgf_tpu.ops.sobel import sobel3

    def circ_front(v):
        dx, dy = sobel3(v.astype(jnp.int32))
        edges2 = canny(v, 50, 100, iters=cfg.hysteresis_iters)
        emask = (edges2 > 0) & ((dx != 0) | (dy != 0))
        return emask, dx, dy

    fronts = jax.jit(B(B(circ_front)))(variants)
    bench_one("  circ: sobel+canny", jax.jit(B(B(circ_front))), variants)
    bench_one(
        "  circ: vote_acc",
        jax.jit(B(B(lambda e, dx, dy: vote_accumulator(e, dx, dy, cfg.num_angle_bins, 1, 30)))),
        *fronts,
    )
    accs = jax.jit(B(B(lambda e, dx, dy: vote_accumulator(e, dx, dy, cfg.num_angle_bins, 1, 30))))(*fronts)
    bench_one(
        "  circ: candidates",
        jax.jit(B(B(lambda a: centre_candidates(a, 18.0, cfg.max_center_candidates)))),
        accs,
    )
    cands = jax.jit(B(B(lambda a: centre_candidates(a, 18.0, cfg.max_center_candidates))))(accs)
    ys, xs = cands[0], cands[1]

    def resc(e, dx, dy, y, x):
        sx, sy = pixel_steps(dx, dy)
        sx = jnp.where(e, sx, 0)
        sy = jnp.where(e, sy, 0)
        return exact_rescore(e, sx, sy, y, x, 1, 30, 3)

    bench_one("  circ: rescore+radii", jax.jit(B(B(resc))), fronts[0], fronts[1], fronts[2], ys, xs)
    bench_one(
        "  circ: greedy",
        jax.jit(B(B(lambda y, x: greedy_min_dist(y, x, (y > 0) & (x > 0), 10.0)))),
        ys, xs,
    )
    bench_one("hough_circles(x10)", jax.jit(B(B(circ))), variants)
    circles, valid = jax.jit(B(B(circ)))(variants)
    circles = circles.reshape(batch, -1, 3)
    valid = valid.reshape(batch, -1)
    bench_one("erase", jax.jit(B(erase_circles)), edges, circles, valid)
    removed = jax.jit(B(erase_circles))(edges, circles, valid)
    bench_one(
        "hough_lines(h+v)",
        jax.jit(B(lambda e: (
            hough_lines_intercepts(e, 56.0, True, cfg.angle_delta, cfg.max_lines)[0],
            hough_lines_intercepts(e, 56.0, False, cfg.angle_delta, cfg.max_lines)[0],
        ))),
        removed,
    )

    thr = jnp.full((batch,), 56.0, jnp.float32)
    trace_dir = os.environ.get("IMG2SGF_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            dt = bench_one("detect_board (fused)", lambda a, b: detect_board_batch(a, cfg, b), rgb, thr)
    else:
        dt = bench_one("detect_board (fused)", lambda a, b: detect_board_batch(a, cfg, b), rgb, thr)
    print(f"throughput: {batch / dt:.1f} img/s")


if __name__ == "__main__":
    main()
