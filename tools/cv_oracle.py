"""Reverse-engineer cv.HoughCircles(HOUGH_GRADIENT) radius run-scan
semantics empirically (TEST UTILITY, not part of the shipped framework).

No OpenCV source is available in this container, so the installed cv2
binary is the oracle. This tool reproduces the FULL gradient pipeline in
numpy — accumulator walk, NMS, vote sort, minDist greedy — with a
PLUGGABLE radius-estimation step, and scores each candidate variant of
the run-scan against cv2's actual per-variant circle output on fixture
planes (using cv2's own Canny/Sobel so the nz set is cv2's, isolating the
run-scan).

An exact variant must reproduce, for every accepted circle: the centre,
the radius (float32-exact), and the ACCEPTANCE ORDER (cv2 returns circles
in acceptance order).

Usage: JAX_PLATFORMS=cpu python tools/cv_oracle.py ex12 [variant_idx ...]
"""

from __future__ import annotations

import sys

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import cv2 as cv

from reference_headless import detect_circles, preprocess as ref_preprocess

FIXTURES = "/root/reference/test_images"


def cv_emask_steps(plane: np.ndarray, canny_high: float):
    """cv2's own edge mask + fixed-point steps for HoughCircles internals."""
    edges = cv.Canny(plane, canny_high / 2, canny_high, apertureSize=3,
                     L2gradient=False)
    dx = cv.Sobel(plane, cv.CV_16S, 1, 0, ksize=3)
    dy = cv.Sobel(plane, cv.CV_16S, 0, 1, ksize=3)
    emask = (edges != 0) & ((dx != 0) | (dy != 0))
    fx = dx.astype(np.float32)
    fy = dy.astype(np.float32)
    mag = np.sqrt(fx * fx + fy * fy, dtype=np.float32)
    mag[mag == 0] = 1.0
    sx = np.rint(1024.0 * fx / mag).astype(np.int32)
    sy = np.rint(1024.0 * fy / mag).astype(np.int32)
    return emask, sx, sy


def accumulator(emask, sx, sy, min_r, max_r):
    """Exact OpenCV vote walk: both signs, radii min_r..max_r, walk STOPS
    at the first out-of-bounds landing (monotonic ray, equivalent to a
    bounds test per landing)."""
    H, W = emask.shape
    ys, xs = np.nonzero(emask)
    svx = sx[ys, xs].astype(np.int64)
    svy = sy[ys, xs].astype(np.int64)
    acc = np.zeros((H, W), np.int32)
    rs = np.arange(min_r, max_r + 1, dtype=np.int64)
    for sign in (1, -1):
        lx = xs[:, None] + ((sign * rs[None, :] * svx[:, None]) >> 10)
        ly = ys[:, None] + ((sign * rs[None, :] * svy[:, None]) >> 10)
        ok = (lx >= 0) & (lx < W) & (ly >= 0) & (ly < H)
        np.add.at(acc, (ly[ok], lx[ok]), 1)
    return acc


def centre_list(acc, acc_threshold):
    """NMS candidates sorted by votes desc, ties by y-major flat index."""
    H, W = acc.shape
    a = acc
    ok = np.zeros((H, W), bool)
    ok[1:-1, 1:-1] = (
        (a[1:-1, 1:-1] > acc_threshold)
        & (a[1:-1, 1:-1] > a[1:-1, :-2])
        & (a[1:-1, 1:-1] >= a[1:-1, 2:])
        & (a[1:-1, 1:-1] > a[:-2, 1:-1])
        & (a[1:-1, 1:-1] >= a[2:, 1:-1])
    )
    ys, xs = np.nonzero(ok)
    votes = a[ys, xs]
    order = np.lexsort((ys * W + xs, -votes))
    return ys[order], xs[order], votes[order]


def radius_scan(dists: np.ndarray, dr: float, variant: str):
    """One pluggable run-scan on float32 sorted-descending distances.
    Returns (r_best f32, max_count int)."""
    d = np.sort(dists)[::-1].astype(np.float32)  # descending
    n = len(d)
    r_best = np.float32(0.0)
    max_count = 0
    if n == 0:
        return r_best, max_count
    if variant in ("desc", "desc_noflush", "desc_gt"):
        # walk largest -> smallest; run = elements within dr of run start
        start_dist = d[0]
        start_idx = 0
        for j in range(1, n + (0 if variant == "desc_noflush" else 1)):
            dj = d[j] if j < n else np.float32(-1e30)
            if start_dist - dj > dr:
                r_cur = d[(j + start_idx) // 2]
                cnt = j - start_idx
                if variant == "desc_gt":
                    better = cnt * r_best > max_count * r_cur or (
                        r_best < 1e-7 and cnt > max_count)
                else:
                    better = cnt * r_best >= max_count * r_cur or (
                        r_best < 1e-7 and cnt >= max_count)
                if better:
                    r_best = r_cur
                    max_count = cnt
                start_dist = dj
                start_idx = j
        return r_best, max_count
    if variant in ("asc", "asc_noflush"):
        # walk smallest -> largest (descending array traversed from the end)
        start_idx = n - 1
        start_dist = d[start_idx]
        lo = -1 if variant == "asc" else 0
        for j in range(n - 2, lo - 1, -1):
            dj = d[j] if j >= 0 else np.float32(1e30)
            if dj - start_dist > dr:
                r_cur = d[(j + start_idx) // 2]
                cnt = start_idx - j
                if cnt * r_best >= max_count * r_cur or (
                        r_best < 1e-7 and cnt >= max_count):
                    r_best = r_cur
                    max_count = cnt
                start_dist = dj
                start_idx = j
        return r_best, max_count
    raise ValueError(variant)


def radius_hist10(dists: np.ndarray, min_r: int, max_r: int, dr: float = 1.0):
    """OpenCV 4.x/5.x HoughCircleEstimateRadiusInvoker inner loop: a
    10-bins-per-dr histogram over distances; runs are 10-bin windows
    anchored at each highest-unconsumed nonempty bin, walked from large
    radii down; rCur is the window midpoint; larger count/r wins, ties go
    to the later (smaller-r) run. Returns (r_best f32, max_count int)."""
    nbins_per_dr = 10
    nbins = int(round((max_r - min_r) / dr * nbins_per_dr))
    bins = np.zeros(max(nbins, 1), np.int64)
    b = np.rint((dists - np.float32(min_r)) / np.float32(dr)
                * nbins_per_dr).astype(np.int64)
    np.clip(b, 0, nbins - 1, out=b)
    np.add.at(bins, b, 1)
    r_best = 0.0
    max_count = 0
    j = nbins - 1
    while j > 0:
        if bins[j]:
            upbin = j
            cur_count = 0
            while j > upbin - nbins_per_dr and j >= 0:
                cur_count += int(bins[j])
                j -= 1
            r_cur = (upbin + j) / 2.0 / nbins_per_dr * dr + min_r
            if (cur_count * r_best >= max_count * r_cur
                    or (r_best < 1.19e-7 and cur_count >= max_count)):
                r_best = r_cur
                max_count = cur_count
        j -= 1
    return np.float32(r_best), max_count


def oracle_circles(emask, sx, sy, min_r, max_r, acc_threshold, min_dist,
                   variant: str):
    H, W = emask.shape
    acc = accumulator(emask, sx, sy, min_r, max_r)
    cy_l, cx_l, votes = centre_list(acc, acc_threshold)
    nzy, nzx = np.nonzero(emask)
    nzy = nzy.astype(np.float32)
    nzx = nzx.astype(np.float32)
    min_r2 = np.float32(min_r * min_r)
    max_r2 = np.float32(max_r * max_r)
    md2 = np.float32(min_dist * min_dist)

    if variant == "hist10":
        # modern flow: estimate a radius for EVERY centre, keep supported
        # ones, sort by (support desc, r desc, x asc, y asc), THEN greedy
        # minDist overlap removal in that order
        est = []
        for cyi, cxi in zip(cy_l, cx_l):
            cx = np.float32(cxi + 0.5)
            cy = np.float32(cyi + 0.5)
            _dx = (cx - nzx).astype(np.float32)
            _dy = (cy - nzy).astype(np.float32)
            r2 = _dx * _dx + _dy * _dy
            sel = (r2 >= min_r2) & (r2 <= max_r2)
            dists = np.sqrt(r2[sel], dtype=np.float32)
            r_best, max_count = radius_hist10(dists, min_r, max_r)
            if max_count > acc_threshold:
                est.append((float(cx), float(cy), float(r_best), max_count))
        est.sort(key=lambda t: (-t[3], -t[2], t[0], t[1]))
        out = []
        for (cx, cy, r, _cnt) in est:
            good = True
            for (ax, ay, _ar) in out:
                ddx = ax - cx
                ddy = ay - cy
                if np.float32(ddx * ddx + ddy * ddy) < md2:
                    good = False
                    break
            if good:
                out.append((cx, cy, r))
        return out

    out = []
    for cyi, cxi in zip(cy_l, cx_l):
        cx = np.float32(cxi + 0.5)
        cy = np.float32(cyi + 0.5)
        clash = False
        for (ax, ay, _ar) in out:
            ddx = np.float32(ax - cx)
            ddy = np.float32(ay - cy)
            if ddx * ddx + ddy * ddy < md2:
                clash = True
                break
        if clash:
            continue
        _dx = (cx - nzx).astype(np.float32)
        _dy = (cy - nzy).astype(np.float32)
        r2 = _dx * _dx + _dy * _dy
        sel = (r2 >= min_r2) & (r2 <= max_r2)
        dists = np.sqrt(r2[sel], dtype=np.float32)
        r_best, max_count = radius_scan(dists, 1.0, variant)
        if max_count > acc_threshold:
            out.append((float(cx), float(cy), float(r_best)))
    return out


def main(args):
    name = args[0] if args else "ex12"
    which = [int(a) for a in args[1:]] or None
    variants_to_try = ["hist10"]

    from img2sgf_tpu.config import DetectionConfig

    cfg = DetectionConfig()
    img = Image.open(f"{FIXTURES}/{name}.jpg").convert("RGB")
    rgb = ref_preprocess(img)
    grey = cv.cvtColor(rgb, cv.COLOR_BGR2GRAY)
    edges = cv.Canny(rgb, 50, 200, apertureSize=3, L2gradient=False)
    _, per_variant = detect_circles(rgb, grey, edges, cfg.maxblur)

    # rebuild the plane list exactly as detect_circles does
    planes = [grey, edges]
    for b in range(cfg.maxblur + 1):
        k = 2 * b + 1
        planes.append(cv.medianBlur(grey, k))
        planes.append(cv.GaussianBlur(grey, (k, k), k))

    idxs = which if which is not None else range(len(planes))
    score = {v: [0, 0] for v in variants_to_try}  # [match_circles, total]
    for vi in idxs:
        plane = planes[vi]
        ref = np.asarray(per_variant[vi]).reshape(-1, 3)
        emask, sx, sy = cv_emask_steps(plane, cfg.circle_canny_high)
        for var in variants_to_try:
            got = oracle_circles(
                emask, sx, sy, cfg.circle_min_radius, cfg.circle_max_radius,
                cfg.circle_acc_threshold, cfg.circle_min_dist, var)
            got_a = np.asarray(got, np.float32).reshape(-1, 3)
            n_match = 0
            exact_order = len(got_a) == len(ref)
            for i in range(min(len(got_a), len(ref))):
                if np.allclose(got_a[i], ref[i], atol=1e-3):
                    n_match += 1
                else:
                    exact_order = False
            score[var][0] += n_match
            score[var][1] += max(len(got_a), len(ref))
            print(f"  v{vi} {var}: mine={len(got_a)} cv2={len(ref)} "
                  f"matched_in_order={n_match} exact={exact_order}",
                  flush=True)
    print({v: f"{s[0]}/{s[1]}" for v, s in score.items()})


if __name__ == "__main__":
    main(sys.argv[1:])
