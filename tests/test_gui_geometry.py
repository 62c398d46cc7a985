"""GUI coordinate-math tests (no display needed).

The click geometry of the board editor, the canvas fit scale, and the
histogram pixel->data transform are module-level pure functions in
gui/app.py; each is pinned here against an independent transcription of
the reference's math (img2sgf.py:955-1001 edit_board, :579-585 get_scale,
:744-748 scale_brightness).
"""

import numpy as np
import pytest

from img2sgf_tpu.core import Alignment
from img2sgf_tpu.gui.app import (
    board_click_action, canvas_fit_scale, hist_pixel_to_data,
)


# --- reference oracle (transcribed from img2sgf.py:955-1001) -------------

def _ref_action(x, y, w, h, hsize, vsize):
    BOARD_SIZE = 19
    cmin, cmax = 30, min(w, h) - 30
    grid_space = (cmax - cmin) / 18
    if (cmin - grid_space / 2 < x < cmax + grid_space / 2
            and cmin - grid_space / 2 < y < cmax + grid_space / 2):
        i = round((x - cmin) / (cmax - cmin) * 18)
        j = round((y - cmin) / (cmax - cmin) * 18)
        return ("cycle", i, j)
    c1, c2 = min(w, h) / 2 - 12, min(w, h) / 2 + 12
    horiz = vert = None
    if hsize < BOARD_SIZE and vsize < BOARD_SIZE:
        if not (cmin < x < cmax or cmin < y < cmax):
            horiz = Alignment.LEFT if x < cmin else Alignment.RIGHT
            vert = Alignment.TOP if y < cmin else Alignment.BOTTOM
    elif vsize < BOARD_SIZE and c1 < x < c2:
        vert = Alignment.TOP if y < cmin else Alignment.BOTTOM
    elif hsize < BOARD_SIZE and c1 < y < c2:
        horiz = Alignment.LEFT if x < cmin else Alignment.RIGHT
    return ("align", horiz, vert)


@pytest.mark.parametrize("w,h", [(460, 460), (500, 460), (460, 700), (222, 222)])
@pytest.mark.parametrize("hsize,vsize", [(19, 19), (17, 19), (19, 3), (8, 6)])
def test_click_action_matches_reference_sweep(w, h, hsize, vsize):
    xs = np.linspace(0, w - 1, 41)
    ys = np.linspace(0, h - 1, 41)
    for x in xs:
        for y in ys:
            assert board_click_action(x, y, w, h, hsize, vsize) == \
                _ref_action(x, y, w, h, hsize, vsize), (x, y, w, h, hsize, vsize)


def test_click_on_grid_points_cycles_that_intersection():
    w = h = 460  # board geometry as draw_board lays it out (img2sgf.py:920-921)
    width = min(w, h) - 60
    coords = [i * width / 18 + 30 for i in range(19)]
    for i in (0, 3, 9, 18):
        for j in (0, 9, 15):
            assert board_click_action(coords[i], coords[j], w, h, 19, 19) == \
                ("cycle", i, j)


def test_corner_board_alignment_dots():
    w = h = 460
    # corner positions: a click outside BOTH bands picks a corner
    assert board_click_action(10, 10, w, h, 8, 6) == \
        ("align", Alignment.LEFT, Alignment.TOP)
    assert board_click_action(450, 452, w, h, 8, 6) == \
        ("align", Alignment.RIGHT, Alignment.BOTTOM)
    # inside the x band -> dead zone even though y is outside the board
    assert board_click_action(200, 5, w, h, 8, 6) == ("align", None, None)


def test_side_board_alignment_strip():
    w = h = 460
    mid = min(w, h) / 2
    # vsize<19 (top/bottom position): only the 24px centre strip responds
    assert board_click_action(mid, 5, w, h, 19, 3) == \
        ("align", None, Alignment.TOP)
    assert board_click_action(mid, 455, w, h, 19, 3) == \
        ("align", None, Alignment.BOTTOM)
    assert board_click_action(mid + 30, 5, w, h, 19, 3) == ("align", None, None)
    # hsize<19 (left/right position)
    assert board_click_action(5, mid, w, h, 17, 19) == \
        ("align", Alignment.LEFT, None)
    assert board_click_action(455, mid, w, h, 17, 19) == \
        ("align", Alignment.RIGHT, None)
    # full board: clicks outside the grid never produce an alignment change
    assert board_click_action(5, mid, w, h, 19, 19) == ("align", None, None)


def test_canvas_fit_scale_matches_reference():
    # reference get_scale: min(x_c/x_i, y_c/y_i) (img2sgf.py:579-585)
    assert canvas_fit_scale(750, 747, 400, 400) == min(400 / 750, 400 / 747)
    assert canvas_fit_scale(100, 400, 400, 400) == 1.0
    # degenerate unrealized canvas (winfo 0/1 before mapping) stays finite
    assert canvas_fit_scale(200, 100, 0, 0) > 0


def test_hist_pixel_to_data_recovers_threshold():
    # Agg (no Tk) stand-in for the histogram canvas: same Figure geometry
    # as the settings pane (figsize 3x2 @130dpi)
    import matplotlib
    matplotlib.use("Agg", force=True)
    from matplotlib.figure import Figure

    fig = Figure(figsize=(3, 2), dpi=130)
    ax = fig.add_subplot(1, 1, 1)
    rng = np.random.default_rng(0)
    ax.hist(rng.uniform(0, 255, 300), bins=20, range=[0, 255], color="pink")
    fig.canvas.draw()
    height = int(fig.bbox.height)
    for t in (0.0, 64.0, 128.0, 250.0):
        # forward transform: data -> display (origin bottom-left), then
        # convert to Tk's top-left origin the way the widget reports events
        px, py_disp = ax.transData.transform((t, 0.0))
        ev_y = height - py_disp
        got = hist_pixel_to_data(ax, px, ev_y, height)
        assert abs(got - t) < 0.5, (t, got)
