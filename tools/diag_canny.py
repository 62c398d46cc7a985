"""Stage-isolated Canny parity vs cv2 (TEST UTILITY).

cv2.Canny(p, T, T) returns exactly the NMS-passing pixels with mag > T
(strong set, no propagation needed), which isolates Sobel/magnitude/NMS
parity from hysteresis-convergence parity.

Usage: JAX_PLATFORMS=cpu python tools/diag_canny.py ex1 [ex5 ...]
"""

from __future__ import annotations

import sys

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import cv2 as cv
import jax.numpy as jnp

from reference_headless import preprocess as ref_preprocess

FIXTURES = "/root/reference/test_images"


def main(names):
    from img2sgf_tpu.ops.canny import canny

    for name in names or ["ex1"]:
        img = Image.open(f"{FIXTURES}/{name}.jpg").convert("RGB")
        rgb = ref_preprocess(img)
        grey = cv.cvtColor(rgb, cv.COLOR_BGR2GRAY)
        print(f"{name}: plane {grey.shape}")

        for (tag, plane, lo, hi) in (
            ("grey 50/100", grey, 50, 100),
            ("rgb  50/200", rgb, 50, 200),
        ):
            jp = jnp.asarray(plane)
            # strong set only (low == high)
            want_s = cv.Canny(plane, hi, hi, apertureSize=3, L2gradient=False)
            got_s = np.asarray(canny(jp, hi, hi, iters=24))
            ds = int((want_s != got_s).sum())
            # full, at increasing iteration caps
            want = cv.Canny(plane, lo, hi, apertureSize=3, L2gradient=False)
            diffs = []
            for it in (24, 64, 256, 1024):
                got = np.asarray(canny(jp, lo, hi, iters=it))
                diffs.append(int((want != got).sum()))
            n = want.size
            print(f"  {tag}: strong_diff={ds}  "
                  f"full_diff@24/64/256/1024={diffs}  "
                  f"({100.0 * diffs[-1] / n:.4f}% residual)")
            if diffs[-1] and diffs[-1] == diffs[-2]:
                # converged but still different: where?
                got = np.asarray(canny(jp, lo, hi, iters=1024))
                yy, xx = np.nonzero(want != got)
                for y, x in list(zip(yy, xx))[:6]:
                    print(f"    ({y},{x}): cv2={want[y, x]} mine={got[y, x]}")


if __name__ == "__main__":
    main(sys.argv[1:])
