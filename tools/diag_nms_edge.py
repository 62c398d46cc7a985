"""Test the patch-edge NMS hypothesis.

circle_recentre treats neighbours OUTSIDE the 3x3 rescore patch as passing
NMS (fallback -1). When the recentred argmax lands on a patch edge, up to
two true neighbours are unchecked. This script re-rescores every accepted
circle at its own cell (so all 4 neighbours are in-patch) and counts how
many would FAIL the true OpenCV NMS — i.e. circles we accept that OpenCV
would never have considered.

Usage: JAX_PLATFORMS=cpu python tools/diag_nms_edge.py ex12 [variant...]
"""

from __future__ import annotations

import sys

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp

from img2sgf_tpu.config import DetectionConfig
from img2sgf_tpu.hough.circles import exact_rescore, pixel_steps
from img2sgf_tpu.ops.blur import blur_pyramid
from img2sgf_tpu.ops.canny import canny
from img2sgf_tpu.ops.color import grey_bgr_quirk, preprocess
from img2sgf_tpu.ops.sobel import sobel3

from diag_circles_diff import our_stages

FIXTURES = "/root/reference/test_images"


def main(args):
    name = args[0] if args else "ex12"
    cfg = DetectionConfig()
    img = Image.open(f"{FIXTURES}/{name}.jpg").convert("RGB")
    dev = jnp.asarray(np.asarray(img, np.uint8))
    rgb = preprocess(dev, cfg.contrast, cfg.brightness)
    grey = grey_bgr_quirk(rgb)
    edges = canny(rgb, cfg.edge_min, cfg.edge_max, cfg.gradient_l2,
                  iters=cfg.hysteresis_iters)
    variants = blur_pyramid(grey, edges, cfg.maxblur)
    st = our_stages(variants, cfg)

    H, W = variants.shape[1:]
    tot = tot_fail = 0
    for v in range(variants.shape[0]):
        acc_mask = st["accepted"][v]
        circ = st["circles"][v][acc_mask]
        if not len(circ):
            continue
        ys = jnp.asarray((circ[:, 1] - 0.5).astype(np.int32))
        xs = jnp.asarray((circ[:, 0] - 0.5).astype(np.int32))
        K = len(circ)
        pad = -K % 8
        ys = jnp.concatenate([ys, jnp.zeros(pad, jnp.int32)])
        xs = jnp.concatenate([xs, jnp.zeros(pad, jnp.int32)])
        plane = variants[v]
        dx, dy = sobel3(plane.astype(jnp.int32))
        e2 = canny(plane, cfg.circle_canny_high / 2, cfg.circle_canny_high,
                   iters=cfg.hysteresis_iters)
        emask = (e2 > 0) & ((dx != 0) | (dy != 0))
        sx, sy = pixel_steps(dx, dy)
        sx = jnp.where(emask, sx, 0)
        sy = jnp.where(emask, sy, 0)
        patch = jax.jit(
            lambda e, a, b, y, x: exact_rescore(
                e, a, b, y, x, cfg.circle_min_radius, cfg.circle_max_radius)
        )(emask, sx, sy, ys, xs)
        p = np.asarray(patch)[:K]
        c = p[:, 1, 1]
        ok = (
            (c > p[:, 1, 0]) & (c >= p[:, 1, 2])
            & (c > p[:, 0, 1]) & (c >= p[:, 2, 1])
        )
        tot += K
        tot_fail += int((~ok).sum())
        if (~ok).any():
            print(f"  v{v}: {int((~ok).sum())}/{K} accepted circles fail true NMS")
    print(f"{name}: {tot_fail}/{tot} accepted circles fail the true NMS")


if __name__ == "__main__":
    main(sys.argv[1:])
