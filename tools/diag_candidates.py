"""Diagnostics: stage-1 candidate counts + cascade-vs-exact vote gap.

For representative fixtures and one bench-style synthetic board, reports
per-variant: number of stage-1 proposals at the 0.5x threshold, number of
exact-vote survivors (> param2), and the minimum cascade-vote value among
exact survivors (i.e., the tightest safe stage-1 multiplier).
"""

from __future__ import annotations

import sys

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from img2sgf_tpu.config import DetectionConfig
from img2sgf_tpu.hough.circles import (
    centre_candidates, exact_rescore, pixel_steps, vote_accumulator,
)
from img2sgf_tpu.ops.canny import canny
from img2sgf_tpu.ops.color import grey_bgr_quirk, preprocess
from img2sgf_tpu.ops.blur import blur_pyramid
from img2sgf_tpu.ops.sobel import sobel3


def analyse(name, grey8, edges, cfg):
    variants = blur_pyramid(grey8, edges, cfg.maxblur)  # [V, H, W]

    def stage(v):
        dx, dy = sobel3(v.astype(jnp.int32))
        e2 = canny(v, 50, 100, iters=cfg.hysteresis_iters)
        emask = (e2 > 0) & ((dx != 0) | (dy != 0))
        acc = vote_accumulator(emask, dx, dy, cfg.num_angle_bins, 1, 30)
        ys, xs, votes, valid = centre_candidates(acc, 15.0, cfg.max_center_candidates)
        sx, sy = pixel_steps(dx, dy)
        sx = jnp.where(emask, sx, 0)
        sy = jnp.where(emask, sy, 0)
        ys_c = jnp.clip(ys, 0, v.shape[0] - 1)
        xs_c = jnp.clip(xs, 0, v.shape[1] - 1)
        patch = exact_rescore(emask, sx, sy, ys_c, xs_c, 1, 30, valid=valid)
        exact = jnp.max(patch.reshape(patch.shape[0], -1), axis=1)
        return votes, valid, exact

    f = jax.jit(jax.vmap(stage))
    votes, valid, exact = map(np.asarray, f(variants))
    n_prop = (valid & (votes > 15.0)).sum(1)
    survivors = valid & (exact > 30.0)
    n_surv = survivors.sum(1)
    # tightest stage-1 threshold multiplier that keeps every survivor
    ratios = np.where(survivors, votes / np.maximum(exact, 1.0), np.inf)
    min_ratio = np.where(n_surv > 0, np.min(ratios, axis=1), np.nan)
    min_votes = np.where(n_surv > 0,
                         np.min(np.where(survivors, votes, np.inf), axis=1), np.nan)
    print(f"--- {name} ({grey8.shape[0]}x{grey8.shape[1]})", flush=True)
    print("  proposals/variant :", n_prop.tolist())
    print("  survivors/variant :", n_surv.tolist())
    with np.printoptions(precision=2, suppress=True):
        print("  min cascade/exact :", min_ratio)
        print("  min cascade votes :", min_votes, flush=True)


def main():
    cfg = DetectionConfig()
    fixtures = ["ex1", "ex5"]
    for fx in fixtures:
        img = Image.open(f"/root/reference/test_images/{fx}.jpg").convert("RGB")
        rgb = jnp.asarray(np.asarray(img), jnp.uint8)
        pre = preprocess(rgb, cfg.contrast, cfg.brightness)
        grey8 = grey_bgr_quirk(pre)
        edges = canny(pre, cfg.edge_min, cfg.edge_max, iters=cfg.hysteresis_iters)
        analyse(fx, grey8, edges, cfg)

    # bench-style synthetic board
    sys.path.insert(0, "/root/repo")
    import bench

    b = bench.make_batch(1, 512)[0]
    rgb = jnp.asarray(b, jnp.uint8)
    pre = preprocess(rgb, cfg.contrast, cfg.brightness)
    grey8 = grey_bgr_quirk(pre)
    edges = canny(pre, cfg.edge_min, cfg.edge_max, iters=cfg.hysteresis_iters)
    analyse("bench-synth", grey8, edges, cfg)


if __name__ == "__main__":
    main()
