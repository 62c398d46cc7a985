"""Parity tests: Hough lines vs cv2, clustering vs sklearn, grid solve vs
the reference-headless replica, on real fixture edge maps."""

import math
import pathlib
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

from img2sgf_tpu.grid import cluster_1d, validate_axis
from img2sgf_tpu.hough import hough_lines_intercepts

STAGES = pathlib.Path("/tmp/img2sgf_stages")
ANGLE_DELTA = math.pi / 180.0


def _stage(name):
    """Load the reference-pipeline stage dump, regenerating it on demand.

    /tmp does not survive CI environments, so a missing dump is rebuilt by
    re-running the headless reference replica on the fixture (a few
    seconds) instead of skipping — the cv2 parity cases must actually run
    in a clean checkout.
    """
    f = STAGES / f"{name}.npz"
    if not f.exists():
        pytest.importorskip("cv2")
        pytest.importorskip("sklearn")
        from PIL import Image

        from reference_headless import run_pipeline

        src = pathlib.Path("/root/reference/test_images") / f"{name}.jpg"
        if not src.exists():
            pytest.skip(f"fixture image {src} missing")
        res = run_pipeline(Image.open(src).convert("RGB"))
        STAGES.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            f,
            grey=res.grey,
            edges=res.edges,
            circles_removed=res.circles_removed,
            circles_raw=res.circles_raw,
        )
    return np.load(f)


def _pad(vals, cap=512):
    v = np.full(cap, np.inf, np.float32)
    v[: len(vals)] = np.asarray(vals, np.float32).ravel()
    m = np.zeros(cap, bool)
    m[: len(vals)] = True
    return jnp.asarray(v), jnp.asarray(m)


@pytest.mark.parametrize("name,threshold", [("ex1", 74), ("ex2", 71), ("ex9", 29)])
@pytest.mark.parametrize("horizontal", [True, False])
def test_hough_lines_vs_cv2(name, threshold, horizontal):
    cv = pytest.importorskip("cv2")
    from reference_headless import find_lines

    removed = _stage(name)["circles_removed"]
    want = np.sort(find_lines(removed, threshold, horizontal).ravel())
    vals, valid, count = hough_lines_intercepts(
        jnp.asarray(removed), threshold, horizontal, ANGLE_DELTA, 512
    )
    got = np.sort(np.asarray(vals)[np.asarray(valid)])
    assert int(count) == len(want), f"count {int(count)} vs {len(want)}"
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_cluster_vs_sklearn():
    pytest.importorskip("sklearn")
    from reference_headless import cluster_centres

    rng = np.random.default_rng(0)
    for trial in range(20):
        n_clusters = rng.integers(2, 25)
        centres = np.sort(rng.uniform(0, 700, n_clusters))
        pts = np.concatenate(
            [c + rng.uniform(-3, 3, rng.integers(1, 5)) for c in centres]
        )
        rng.shuffle(pts)
        want = cluster_centres(pts.reshape(-1, 1))
        vals, valid = _pad(pts)
        got_c, got_n = cluster_1d(vals, valid, 10.0, 64)
        got = np.asarray(got_c)[: int(got_n)]
        assert len(got) == len(want), f"trial {trial}"
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cluster_single_point_fails_like_reference():
    vals, valid = _pad([100.0])
    _, n = cluster_1d(vals, valid, 10.0, 64)
    assert int(n) == 0


def _run_axis(coords):
    v = np.full(64, np.inf, np.float32)
    v[: len(coords)] = coords
    x, n, ok, reason, _diag = validate_axis(jnp.asarray(v), len(coords), 19, 10.0, 1.6)
    return np.asarray(x)[: int(n)], bool(ok)


@pytest.mark.parametrize(
    "coords",
    [
        # complete 19-line grid, 30px spacing
        list(np.arange(19) * 30.0 + 12.0),
        # gaps: missing lines 5 and 11
        [12.0 + 30 * i for i in range(19) if i not in (5, 11)],
        # 21 lines (bounding box) -> outer two dropped
        list(np.arange(21) * 30.0),
        # 20 lines (caption) -> last dropped
        list(np.arange(20) * 30.0),
        # adjacent double-detection -> too close -> invalid
        [0.0, 4.0, 30.0, 60.0],
        # single line -> invalid
        [55.0],
        # empty -> invalid
        [],
        # two lines only -> valid tiny grid
        [100.0, 130.0],
        # big gap of ~3 spacings
        [0.0, 30.0, 60.0, 150.0, 180.0],
        # irregular spacing within ratio
        [0.0, 28.0, 58.0, 90.0, 118.0],
    ],
)
def test_validate_axis_vs_reference(coords):
    from reference_headless import complete_grid, truncate_grid

    reasons = []
    want = truncate_grid(complete_grid(truncate_grid(np.asarray(coords, float) if len(coords) else np.zeros(0)), reasons))
    got, ok = _run_axis(np.asarray(coords, np.float32))
    if want is None:
        assert not ok
    else:
        assert ok
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-3)
