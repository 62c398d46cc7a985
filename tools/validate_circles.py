"""Per-variant circle parity: our JAX HOUGH_GRADIENT stages vs cv2 5.0
(TEST UTILITY, not part of the shipped framework).

Three nested comparisons per fixture variant, each isolating one layer:
  A. cv2 emask + oracle centre list -> our votes/recentre/radius/finalize
     vs cv2's circle output      (isolates the NEW selection stages)
  B. cv2 emask + our cascade proposal -> same stages
     (adds proposal-recall risk: budget saturation / quantization smear)
  C. our full hough_circles_gradient on the plane
     (adds our Canny/Sobel vs cv2's)

Usage: JAX_PLATFORMS=cpu python tools/validate_circles.py ex1 [ex5 ...]
       [--mode=A|B|C|all] [--variants=0,1,4]
"""

from __future__ import annotations

import sys

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import cv2 as cv
import jax
import jax.numpy as jnp

from cv_oracle import accumulator, centre_list, cv_emask_steps
from reference_headless import preprocess as ref_preprocess

FIXTURES = "/root/reference/test_images"


def cv2_circles(plane, cfg):
    got = cv.HoughCircles(
        plane, cv.HOUGH_GRADIENT, dp=1, minDist=cfg.circle_min_dist,
        param1=cfg.circle_canny_high, param2=cfg.circle_acc_threshold,
        minRadius=cfg.circle_min_radius, maxRadius=cfg.circle_max_radius)
    return np.zeros((0, 3), np.float32) if got is None else got.reshape(-1, 3)


def run_stages(emask, sx, sy, ys, xs, valid, cfg, H, W):
    """Our stages 2-3 (votes -> recentre -> radius -> finalize) on given
    candidates, returning accepted (cx, cy, r) rows in acceptance order."""
    from img2sgf_tpu.hough.circles import (
        circle_finalize, circle_recentre, circle_votes, radius_support_pool,
    )

    @jax.jit
    def go(emask, sx, sy, ys, xs, valid):
        patch = circle_votes(emask, sx, sy, ys, xs, valid,
                             cfg.circle_min_radius, cfg.circle_max_radius,
                             cells=cfg.rescore_cells)
        ys_c, xs_c, _v, valid2 = circle_recentre(
            patch, ys, xs, valid, cfg.circle_acc_threshold, H, W)
        r_best, support = radius_support_pool(
            emask[None], ys_c[None], xs_c[None], valid2[None],
            cfg.circle_min_radius, cfg.circle_max_radius)
        return circle_finalize(
            ys_c, xs_c, valid2, r_best[0], support[0],
            cfg.circle_acc_threshold, cfg.circle_min_dist,
            cfg.max_circles_per_variant)

    circles, ok = go(jnp.asarray(emask), jnp.asarray(sx), jnp.asarray(sy),
                     jnp.asarray(ys), jnp.asarray(xs), jnp.asarray(valid))
    c = np.asarray(circles)
    return c[np.asarray(ok)]


def pad_candidates(ys, xs, budget):
    K = len(ys)
    v = np.zeros(budget, bool)
    v[: min(K, budget)] = True
    yp = np.zeros(budget, np.int32)
    xp = np.zeros(budget, np.int32)
    yp[: min(K, budget)] = ys[:budget]
    xp[: min(K, budget)] = xs[:budget]
    return yp, xp, v, K > budget


def compare(tag, got, ref, atol=1e-3):
    n = 0
    exact = len(got) == len(ref)
    for i in range(min(len(got), len(ref))):
        if np.allclose(got[i], ref[i], atol=atol):
            n += 1
        else:
            exact = False
    status = "EXACT" if exact and n == len(ref) else "DIFF "
    print(f"    {tag}: {status} mine={len(got)} cv2={len(ref)} "
          f"matched_in_order={n}", flush=True)
    return exact and n == len(ref)


def main(args):
    mode = "all"
    variants = None
    names = []
    for a in args:
        if a.startswith("--mode="):
            mode = a.split("=")[1]
        elif a.startswith("--variants="):
            variants = [int(v) for v in a.split("=")[1].split(",")]
        else:
            names.append(a)
    names = names or ["ex1"]

    from img2sgf_tpu.config import DetectionConfig

    cfg = DetectionConfig()
    score = {m: [0, 0] for m in "ABC"}
    for name in names:
        print(f"{name}:")
        img = Image.open(f"{FIXTURES}/{name}.jpg").convert("RGB")
        rgb = ref_preprocess(img)
        grey = cv.cvtColor(rgb, cv.COLOR_BGR2GRAY)
        planes = [grey, cv.Canny(rgb, 50, 200, apertureSize=3,
                                 L2gradient=False)]
        for b in range(cfg.maxblur + 1):
            k = 2 * b + 1
            planes.append(cv.medianBlur(grey, k))
            planes.append(cv.GaussianBlur(grey, (k, k), k))

        idxs = variants if variants is not None else range(len(planes))
        for vi in idxs:
            plane = planes[vi]
            H, W = plane.shape
            ref = cv2_circles(plane, cfg)
            emask, sx, sy = cv_emask_steps(plane, cfg.circle_canny_high)
            print(f"  v{vi}: edges={int(emask.sum())}")

            if mode in ("A", "all"):
                acc = accumulator(emask, sx, sy, cfg.circle_min_radius,
                                  cfg.circle_max_radius)
                cy_l, cx_l, _ = centre_list(acc, cfg.circle_acc_threshold)
                yp, xp, v, trunc = pad_candidates(
                    cy_l, cx_l, cfg.max_center_candidates)
                if trunc:
                    print(f"    A: WARNING oracle centre list truncated "
                          f"({len(cy_l)} > {cfg.max_center_candidates})")
                got = run_stages(emask, sx, sy, yp, xp, v, cfg, H, W)
                score["A"][0] += compare("A", got, ref)
                score["A"][1] += 1

            if mode in ("B", "all"):
                # the SHIPPED candidate flow (cascade propose -> exact 5x5
                # recentre -> provisional +-2 ring -> pooled radius ->
                # finalize), but fed cv2's own edge mask and Sobel planes:
                # isolates proposal recall from edge parity
                from img2sgf_tpu.hough.circles import (
                    centre_candidates, circle_candidates, circle_finalize,
                    radius_support_pool, vote_accumulator,
                )
                dxs = cv.Sobel(plane, cv.CV_16S, 1, 0, ksize=3)
                dys = cv.Sobel(plane, cv.CV_16S, 0, 1, ksize=3)

                @jax.jit
                def shipped(e, dx, dy, sxj, syj):
                    a = vote_accumulator(e, dx, dy, cfg.num_angle_bins,
                                         cfg.circle_min_radius,
                                         cfg.circle_max_radius)
                    ys_j, xs_j, _v, v_j = centre_candidates(
                        a, 0.5 * cfg.circle_acc_threshold,
                        cfg.max_center_candidates)
                    ys_c, xs_c, _votes, ok, _sat = circle_candidates(
                        e, sxj, syj, ys_j, xs_j, v_j,
                        cfg.circle_min_radius, cfg.circle_max_radius,
                        cfg.circle_acc_threshold, H, W,
                        prov_budget=cfg.max_ring_candidates)
                    r_best, support = radius_support_pool(
                        e[None], ys_c[None], xs_c[None], ok[None],
                        cfg.circle_min_radius, cfg.circle_max_radius)
                    return circle_finalize(
                        ys_c, xs_c, ok, r_best[0], support[0],
                        cfg.circle_acc_threshold, cfg.circle_min_dist,
                        cfg.max_circles_per_variant)

                circles_b, ok_b = shipped(
                    jnp.asarray(emask), jnp.asarray(dxs.astype(np.int32)),
                    jnp.asarray(dys.astype(np.int32)), jnp.asarray(sx),
                    jnp.asarray(sy))
                got = np.asarray(circles_b)[np.asarray(ok_b)]
                score["B"][0] += compare("B", got, ref)
                score["B"][1] += 1

            if mode in ("C", "all"):
                from img2sgf_tpu.hough.circles import hough_circles_gradient

                @jax.jit
                def full(p):
                    return hough_circles_gradient(
                        p, cfg.circle_canny_high, cfg.circle_acc_threshold,
                        cfg.circle_min_dist, cfg.circle_min_radius,
                        cfg.circle_max_radius, cfg.num_angle_bins,
                        cfg.max_center_candidates,
                        cfg.max_circles_per_variant, cfg.hysteresis_iters,
                        cells=cfg.rescore_cells)

                circles, ok = full(jnp.asarray(plane))
                got = np.asarray(circles)[np.asarray(ok)]
                score["C"][0] += compare("C", got, ref)
                score["C"][1] += 1

    print({m: f"{s[0]}/{s[1]} variants exact" for m, s in score.items()
           if s[1]})


if __name__ == "__main__":
    main(sys.argv[1:])
