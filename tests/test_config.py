"""DetectionConfig hygiene: no silently-dead fields.

Every reference tunable either observably affects the pipeline or is
validated-static (sobel_aperture — the reference never changes it from 3,
img2sgf.py:49, and ops/sobel.py implements only the 3x3 stencil).
"""

import numpy as np
import pytest

from img2sgf_tpu.config import DetectionConfig


def test_sobel_aperture_is_validated_static():
    with pytest.raises(ValueError):
        DetectionConfig(sobel_aperture=5)
    assert DetectionConfig().sobel_aperture == 3


@pytest.mark.slow
def test_line_threshold_field_is_the_default_threshold():
    """detect_board with no explicit threshold uses cfg.line_threshold
    (img2sgf.py:44); passing the same value explicitly must match."""
    from img2sgf_tpu.pipeline import detect_board

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (96, 96, 3)).astype(np.uint8)
    cfg = DetectionConfig(
        line_threshold=37,
        max_center_candidates=32,
        overflow_center_candidates=0,
        max_circles_per_variant=16,
        max_lines=64,
        hysteresis_iters=4,
    )
    import jax

    a = jax.jit(lambda im: detect_board(im, cfg), backend="cpu")(img)
    b = jax.jit(lambda im: detect_board(im, cfg, 37.0), backend="cpu")(img)
    np.testing.assert_array_equal(np.asarray(a.full_board), np.asarray(b.full_board))
    np.testing.assert_array_equal(np.asarray(a.hlines), np.asarray(b.hlines))
