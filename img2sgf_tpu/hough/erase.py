"""Circle erasure: blank each circle's bounding box, repaint a centre dot.

Reproduces img2sgf.py:188-198: for every detected circle, a filled black
rectangle over the bounding box grown by 2 px (inclusive corners, like
cv.rectangle), then a filled radius-1 circle (a 5-pixel diamond, verified
against cv.circle) in white at the rounded centre.

TPU-native: instead of a per-circle Python loop, the union of all boxes is
computed as an outer-product OR — rows[H, C] @ cols[C, W] on the MXU —
and the dots as a second rank-C outer product. No scatter, no loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def erase_circles(edges_u8, circles_xyr, valid, hw=None):
    """edges_u8: [H, W] uint8; circles_xyr: [C, 3] (cx, cy, r); valid: [C].

    Returns uint8 [H, W]. hw=(h, w): content dims inside a fixed canvas —
    painting is clipped to the content block like cv.rectangle/cv.circle
    clip to the image.
    """
    H, W = edges_u8.shape
    xc, yc, r = circles_xyr[:, 0], circles_xyr[:, 1], circles_xyr[:, 2]
    r = r + 2.0  # circle edges stick out past the bbox (img2sgf.py:193)
    x0 = jnp.round(xc - r)
    x1 = jnp.round(xc + r)
    y0 = jnp.round(yc - r)
    y1 = jnp.round(yc + r)

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    rows = (
        (ys[None, :] >= y0[:, None]) & (ys[None, :] <= y1[:, None]) & valid[:, None]
    ).astype(jnp.float32)  # [C, H]
    cols = (
        (xs[None, :] >= x0[:, None]) & (xs[None, :] <= x1[:, None])
    ).astype(jnp.float32)  # [C, W]
    boxed = (rows.T @ cols) > 0  # [H, W]

    # centre dots: 5-px diamond at (round(xc), round(yc))
    cxi = jnp.round(xc)
    cyi = jnp.round(yc)
    dot = jnp.zeros((H, W), jnp.bool_)
    for dy, dx in ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)):
        drow = ((ys[None, :] == (cyi[:, None] + dy)) & valid[:, None]).astype(jnp.float32)
        dcol = (xs[None, :] == (cxi[:, None] + dx)).astype(jnp.float32)
        dot = dot | ((drow.T @ dcol) > 0)

    out = jnp.where(boxed, jnp.uint8(0), edges_u8)
    out = jnp.where(dot, jnp.uint8(255), out)
    if hw is not None:
        from ..ops.common import region_mask

        out = out * region_mask((H, W), hw[0], hw[1], jnp.uint8)
    return out
