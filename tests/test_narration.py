"""Log-narration parity: the session's decision log must reproduce the
reference's verbatim log script (img2sgf.py log() calls).

Two layers:
  * axis-level: every grid-solve message (truncate/complete/truncate,
    img2sgf.py:335-430) compared string-for-string against the oracle
    (tools/reference_headless with log capture) on controlled coordinate
    sets covering each branch;
  * fixture-level: the full narration for ex9 (small partial-board scan)
    from a real pipeline run vs the oracle's full script.
"""

import pathlib
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

from img2sgf_tpu.grid import validate_axis
from img2sgf_tpu.gui.session import DetectSession

AXIS_CASES = [
    list(np.arange(19) * 30.0 + 12.0),                     # complete grid
    [12.0 + 30 * i for i in range(19) if i not in (5, 11)],  # gaps
    list(np.arange(21) * 30.0),                            # bounding box
    list(np.arange(20) * 30.0),                            # caption line
    [0.0, 4.0, 30.0, 60.0],                                # too close
    [55.0],                                                # one line
    [],                                                    # none
    [100.0, 130.0],                                        # tiny grid
    [0.0, 30.0, 60.0, 150.0, 180.0],                       # big gap fill
    [0.0, 28.0, 58.0, 90.0, 118.0],                        # irregular
    list(np.arange(26) * 30.0),                            # too big
]


def _oracle_axis_log(coords):
    from reference_headless import complete_grid, truncate_grid

    msgs = []
    log = msgs.append
    log("Assessing horizontal lines.")
    x = np.asarray(coords, float) if len(coords) else np.zeros(0)
    reasons = []
    truncate_grid(complete_grid(truncate_grid(x, log), reasons, log), log)
    return msgs


def _session_axis_log(coords):
    msgs = []
    s = DetectSession(log=msgs.append)
    v = np.full(64, np.inf, np.float32)
    v[: len(coords)] = coords
    _x, _n, _ok, reason, diag = validate_axis(
        jnp.asarray(v), len(coords), 19, 10.0, 1.6
    )
    s._narrate_axis("horizontal", len(coords), np.asarray(diag), int(reason))
    return msgs


@pytest.mark.parametrize("coords", AXIS_CASES)
def test_axis_narration_matches_reference(coords):
    assert _session_axis_log(coords) == _oracle_axis_log(coords)


@pytest.mark.slow
def test_fixture_narration_ex9():
    """Full-script narration on ex9 vs the reference oracle.

    Because lines are detected on the circle-erased edge map and the
    circle sets still diverge slightly (PARITY.md, ex9 140 vs 139 — a few
    tangent lines differ), a raw script diff against the oracle's own run
    would compare two different detection states. Instead:
      * the preprocess-stage script must match the oracle verbatim;
      * the line/cluster/grid narration must match what the ORACLE would
        log when fed OUR circles_removed map (exercising cv2 HoughLines +
        sklearn clustering + the grid solve with verbatim log capture) —
        i.e. given the same state, the narration is line-for-line the
        reference's;
      * the identify_board messages must match the oracle's true run
        verbatim (ex9's final board is bit-exact).
    """
    pytest.importorskip("cv2")
    pytest.importorskip("sklearn")
    from PIL import Image

    from reference_headless import (
        cluster_centres,
        complete_grid,
        find_lines,
        run_pipeline,
        truncate_grid,
    )

    src = pathlib.Path("/root/reference/test_images/ex9.jpg")
    if not src.exists():
        pytest.skip("fixture image missing")
    img = Image.open(src).convert("RGB")
    oracle = run_pipeline(img)

    got = []
    s = DetectSession(log=got.append)
    s.load_image(np.asarray(img))
    s.process()

    # oracle narration on OUR erased edge map
    want = [
        "\nProcessing image",
        "Contrast = 70",
        "Brightness = 50",
        "Converting to greyscale",
        "Running Canny edge detection algorithm",
        "Detecting circles",
    ]
    log = want.append
    removed = np.asarray(s.result.circles_removed)
    thr = s.line_threshold
    hlines = find_lines(removed, thr, True)
    vlines = find_lines(removed, thr, False)
    log(f"Found {len(hlines)} distinct horizontal lines and "
        f"{len(vlines)} distinct vertical lines")
    hcentres = cluster_centres(hlines)
    vcentres = cluster_centres(vlines)
    log(f"Got {len(hcentres)} horizontal and {len(vcentres)} vertical grid lines")
    log("Assessing horizontal lines.")
    hc = truncate_grid(complete_grid(truncate_grid(hcentres, log), [], log), log)
    if hc is not None:
        log("Assessing vertical lines.")
        truncate_grid(complete_grid(truncate_grid(vcentres, log), [], log), log)

    n = len(want)
    assert got[:n] == want
    # identify_board narration exactly (img2sgf.py:501-534)
    assert got[n:] == oracle.log[-3:]
