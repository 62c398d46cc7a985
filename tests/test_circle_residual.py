"""Pinned bound on the per-variant circle-stream residual vs cv2.

PARITY.md tracks board-level parity (bit-exact on all 14 detectable
fixtures); this test pins the deeper metric — raw per-variant circle
streams against cv2 5.0's own HoughCircles output (committed as
tests/golden/*/circles_per_variant.npz) on the three fixtures that
historically carried deltas (ex4/ex5/ex12, docs/PARITY.md).

Round-4 root cause (docs/DESIGN.md "Residual circle deltas"): the round-3
deltas were candidate-budget truncations on junk-dense planes (proposal
rank up to ~4.4k, ring-budget cuts); the round-4 budget raise closed them.
The single structural residual is a cascade-smear case on ex4 v9 where the
approximate accumulator's nearest NMS maximum sits 3 px from cv2's exact
cell — outside the ±2 recovery reach. This test fails if budget or
selection changes ever regress the streams beyond the pinned counts.

Runs the PRODUCTION pooled-overflow path at native fixture size (slow
tier: several-minute CPU compiles).
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from img2sgf_tpu.config import DetectionConfig
from img2sgf_tpu.hostio import load_rgb
from img2sgf_tpu.pipeline.detect import (
    _circles_pooled, _pre_circles, _variant_dedup,
)

GOLDEN = pathlib.Path(__file__).parent / "golden"
FIXTURES = pathlib.Path("/root/reference/test_images")

# (fixture, max missed cv2 circles, max extra circles) over all 10 variant
# streams. Bounds are the measured round-4 residual (see module docstring);
# any increase is a regression.
PINNED = [
    ("ex4", 1, 0),
    ("ex5", 0, 0),
    ("ex12", 0, 0),
]


def production_per_variant(rgb, cfg):
    dev = jnp.asarray(rgb)
    _, _, variants = jax.jit(lambda im: _pre_circles(im, cfg, None))(dev)
    keep, expand = _variant_dedup(cfg, variants.shape[0])
    pool = variants[jnp.asarray(keep)]
    circles, valid = jax.jit(lambda p: _circles_pooled(p, cfg, None))(pool)
    circles = np.asarray(circles)[np.asarray(expand)]
    valid = np.asarray(valid)[np.asarray(expand)]
    return [circles[v][valid[v]] for v in range(len(expand))]


@pytest.mark.slow
@pytest.mark.parametrize("name,max_miss,max_extra", PINNED)
def test_circle_stream_residual_pinned(name, max_miss, max_extra):
    golden = np.load(GOLDEN / name / "circles_per_variant.npz")
    rgb = load_rgb(str(FIXTURES / f"{name}.jpg"))
    mine = production_per_variant(rgb, DetectionConfig())
    tot_miss = tot_extra = 0
    for v in range(len(mine)):
        ref = golden[f"v{v}"]
        got = mine[v]
        used = np.zeros(len(got), bool)
        for c in ref:
            # nearest UNUSED detected circle within the 2 px gate (a
            # nearest-only match would count a miss whenever the single
            # nearest row was already claimed, even with another in-gate
            # candidate free — flaky on dense duplicate-adjacent streams)
            d = (np.hypot(got[:, 0] - c[0], got[:, 1] - c[1])
                 if len(got) else np.empty((0,)))
            d = np.where(used, np.inf, d)
            j = int(np.argmin(d)) if len(d) else -1
            if j >= 0 and d[j] <= 2.0:
                used[j] = True
            else:
                tot_miss += 1
        tot_extra += int((~used).sum())
    assert tot_miss <= max_miss, f"{name}: {tot_miss} missed cv2 circles"
    assert tot_extra <= max_extra, f"{name}: {tot_extra} extra circles"
