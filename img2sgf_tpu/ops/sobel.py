"""3x3 Sobel derivatives with OpenCV BORDER_REPLICATE semantics.

Used by Canny (img2sgf.py:162-165 via cv.Canny) and by the circle detector's
gradient voting (cv.HoughCircles HOUGH_GRADIENT internals).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import pad_replicate


def sobel3(img):
    """Return (dx, dy) int32 Sobel derivatives of a [..., H, W] image.

    dx kernel: [[-1,0,1],[-2,0,2],[-1,0,1]], dy = dx^T (OpenCV cv.Sobel with
    ksize=3, BORDER_REPLICATE as used inside cv.Canny).
    """
    x = pad_replicate(img.astype(jnp.int32), 1)
    H, W = img.shape[-2], img.shape[-1]

    def at(dy, dx):
        return x[..., 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]

    # Separable: smooth [1,2,1] one axis, diff [-1,0,1] the other
    gx = (
        (at(-1, 1) + 2 * at(0, 1) + at(1, 1))
        - (at(-1, -1) + 2 * at(0, -1) + at(1, -1))
    )
    gy = (
        (at(1, -1) + 2 * at(1, 0) + at(1, 1))
        - (at(-1, -1) + 2 * at(-1, 0) + at(-1, 1))
    )
    return gx, gy
