"""erase_circles vs a numpy oracle of the reference's sequential paint loop.

The reference paints, PER circle in list order, a filled black rectangle
over the grown bounding box then a white radius-1 dot (img2sgf.py:191-198).
Order matters: a later circle's box overpaints earlier circles' dots. The
oracle replicates cv.rectangle (inclusive corners, clipped) and cv.circle
radius 1 (5-px diamond) semantics.
"""

import numpy as np
import jax.numpy as jnp

from img2sgf_tpu.hough.erase import erase_circles


def oracle(edges, circles):
    out = edges.copy()
    H, W = out.shape
    for xc, yc, r in circles:
        r = r + 2.0
        x0, y0 = int(round(xc - r)), int(round(yc - r))
        x1, y1 = int(round(xc + r)), int(round(yc + r))
        out[max(y0, 0) : y1 + 1, max(x0, 0) : x1 + 1] = 0
        cx, cy = int(round(xc)), int(round(yc))
        for dy, dx in ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)):
            if 0 <= cy + dy < H and 0 <= cx + dx < W:
                out[cy + dy, cx + dx] = 255
    return out


def test_erase_order_layering():
    rng = np.random.default_rng(7)
    H = W = 96
    edges = (rng.random((H, W)) < 0.3).astype(np.uint8) * 255
    # dense overlapping circles so later boxes cover earlier dots
    n = 40
    circles = np.stack(
        [
            rng.uniform(5, W - 5, n).astype(np.float32),
            rng.uniform(5, H - 5, n).astype(np.float32),
            rng.uniform(2, 9, n).astype(np.float32),
        ],
        axis=1,
    )
    # OpenCV circle centres carry +0.5; keep some half-integer values
    circles[:, :2] = np.round(circles[:, :2] * 2) / 2

    want = oracle(edges, circles)
    got = np.asarray(
        erase_circles(
            jnp.asarray(edges), jnp.asarray(circles), jnp.ones(n, bool)
        )
    )
    assert (got == want).all()

    # with interspersed invalid rows: only valid circles paint, in order
    valid = rng.random(n) < 0.7
    want_v = oracle(edges, circles[valid])
    got_v = np.asarray(
        erase_circles(jnp.asarray(edges), jnp.asarray(circles), jnp.asarray(valid))
    )
    assert (got_v == want_v).all()
