"""DetectSession logic tests (no display, no pipeline run): zoom geometry,
reclassification staging, stone cycling, alignment editing."""

import types

import numpy as np
import pytest

from img2sgf_tpu.core import Alignment, BoardStates
from img2sgf_tpu.gui.session import DetectSession


def _fake_result(hsize=19, vsize=19, inten=None, stones=None):
    r = types.SimpleNamespace()
    r.board_ready = True
    r.valid_grid = True
    r.hsize = hsize
    r.vsize = vsize
    r.intensities = np.full((19, 19), 200.0) if inten is None else inten
    r.stone_mask = np.zeros((19, 19), bool) if stones is None else stones
    r.num_black = 0
    r.num_white = 0
    r.side_to_move = 1
    return r


def _session_with_board(hsize=19, vsize=19, **kw):
    s = DetectSession(log=lambda *_: None)
    s.input_rgb = np.zeros((100, 100, 3), np.uint8)
    s.result = _fake_result(hsize, vsize, **kw)
    s.detected_board = np.zeros((19, 19), np.int32)
    s.apply_alignment()
    return s


def test_reclassify_uses_cached_intensities_only():
    inten = np.full((19, 19), 200.0)
    stones = np.zeros((19, 19), bool)
    stones[3, 3] = stones[4, 4] = True
    inten[3, 3] = 50.0  # dark -> black
    s = _session_with_board(inten=inten, stones=stones)
    s.reclassify()
    assert s.detected_board[3, 3] == BoardStates.BLACK
    assert s.detected_board[4, 4] == BoardStates.WHITE
    # threshold drag to 40: both become white, side flips to black-to-play
    s.black_stone_threshold = 40
    s.reclassify()
    assert s.detected_board[3, 3] == BoardStates.WHITE
    assert s.side_to_move == 1


def test_cycle_stone_left_and_right():
    s = _session_with_board()
    s.cycle_stone(0, 0, right_click=False)
    assert s.full_board[0, 0] == BoardStates.WHITE
    s.cycle_stone(0, 0, right_click=False)
    assert s.full_board[0, 0] == BoardStates.BLACK
    s.cycle_stone(0, 0, right_click=False)
    assert s.full_board[0, 0] == BoardStates.EMPTY
    s.cycle_stone(1, 1, right_click=True)
    assert s.full_board[1, 1] == BoardStates.BLACK
    assert s.board_edited


def test_alignment_moves_part_board():
    s = _session_with_board(hsize=5, vsize=7)
    s.detected_board[:5, :7] = BoardStates.BLACK
    s.apply_alignment()
    assert s.full_board[:5, :7].all()
    changed = s.set_alignment(Alignment.RIGHT, Alignment.BOTTOM)
    assert changed
    assert s.full_board[14:, 12:].all()
    assert not s.full_board[:14, :].any()


def test_zoom_geometry_no_rotation():
    s = DetectSession(log=lambda *_: None)
    rgb = np.zeros((400, 400, 3), np.uint8)
    s.load_image(rgb)
    s.region_rgb = rgb
    s.process = lambda: None  # geometry only
    ok = s.select_region([100, 100, 200, 200], (400, 400))
    assert ok
    np.testing.assert_allclose(s.selection, [100, 100, 200, 200])
    # reference quirk (img2sgf.py:721): threshold re-chosen from the STALE
    # pre-zoom region (400x400 -> 47), not the new 100x100 selection
    assert s.line_threshold == 47


def test_zoom_threshold_uses_stale_region_quirk():
    """Second zoom picks the threshold from the FIRST zoom's region size
    (region_PIL at img2sgf.py:721 is only recropped inside process_image)."""
    s = DetectSession(log=lambda *_: None)
    rgb = np.zeros((400, 400, 3), np.uint8)
    s.load_image(rgb)
    s.region_rgb = rgb

    def fake_process():
        # crop the region as process() would (crop_and_rotate, rot 0)
        x1, y1, x2, y2 = (int(v) for v in s.selection)
        s.region_rgb = s.input_rgb[y1:y2, x1:x2]

    s.process = fake_process
    assert s.select_region([0, 0, 200, 200], (400, 400))
    assert s.line_threshold == 47  # from the 400x400 pre-zoom region
    assert s.select_region([0, 0, 100, 100], (400, 400))
    # chosen from the 200x200 first-zoom region (200/12.8+16=31), not 100x100
    assert s.line_threshold == 31


def test_zoom_out_full_parameter_reset():
    """zoom_out re-runs initialise_parameters (img2sgf.py:736): rotation,
    contrast/brightness, black threshold, alignment and selection all
    reset to defaults."""
    s = DetectSession(log=lambda *_: None)
    rgb = np.zeros((300, 400, 3), np.uint8)
    s.load_image(rgb)
    s.process = lambda: None
    s.rotate_deg = 10.0
    s.contrast = 90
    s.brightness = 10
    s.black_stone_threshold = 60
    s.board_alignment = [Alignment.RIGHT, Alignment.BOTTOM]
    s.selection = np.array([10, 10, 50, 50])
    s.zoom_out()
    assert s.rotate_deg == 0.0
    assert s.contrast == s.cfg.contrast
    assert s.brightness == s.cfg.brightness
    assert s.black_stone_threshold == s.cfg.black_stone_threshold
    assert s.board_alignment == [Alignment.LEFT, Alignment.TOP]
    np.testing.assert_allclose(s.selection, [0, 0, 400, 300])
    assert s.line_threshold == 39  # 300/12.8+16 from the full image


def test_zoom_rejects_tiny_rectangles():
    s = DetectSession(log=lambda *_: None)
    rgb = np.zeros((400, 400, 3), np.uint8)
    s.load_image(rgb)
    s.region_rgb = rgb
    s.process = lambda: None
    assert not s.select_region([100, 100, 105, 200], (400, 400))


def _reference_select_region_oracle(sel_global, sel_local, canvas_wh,
                                    image_wh, region_wh, rotate_deg):
    """Independent transcription of the reference's select_region math
    (img2sgf.py:677-714), including its quirks verbatim: the NON-orthogonal
    "rotation matrix" [[cos, sin], [sin, cos]] (:704-705), the
    missing-paren rectangle_centre (:107, y = y1 + y2/2), and the
    (-xdelta, ydelta) asymmetric compensation (:707)."""
    import math

    xs = sorted((sel_local[0], sel_local[2]))
    ys = sorted((sel_local[1], sel_local[3]))
    x_c, y_c = canvas_wh
    x_i, y_i = region_wh
    scale = max(x_i / x_c, y_i / y_c)

    def centre(a):
        return np.array(((a[0] + a[2]) / 2, a[1] + a[3] / 2))

    old = np.asarray(sel_global, float)
    old_centre = centre(old)
    new = np.array((old[0] + scale * xs[0], old[1] + scale * ys[0],
                    old[0] + scale * xs[1], old[1] + scale * ys[1]))
    new_centre = centre(new)
    offset = new_centre - old_centre
    theta = -rotate_deg * math.pi / 180
    rot = np.array(((math.cos(theta), math.sin(theta)),
                    (math.sin(theta), math.cos(theta))))
    xdelta, ydelta = rot @ offset - offset
    new += (-xdelta, ydelta, -xdelta, ydelta)
    new[0] = round(max(new[0], 0))
    new[1] = round(max(new[1], 0))
    new[2] = round(min(new[2], image_wh[0]))
    new[3] = round(min(new[3], image_wh[1]))
    return new


def test_zoom_geometry_rotated_matches_reference_math():
    """session.select_region at rotate_deg != 0 must reproduce the
    reference's rotation-compensation math exactly (VERDICT r3 #6),
    including after a prior zoom (selection base != origin)."""
    for angle in (-17.0, -5.0, 3.5, 12.0, 90.0):
        for base, local, canvas in [
            ([0, 0, 640, 480], [50, 40, 300, 260], (320, 240)),
            ([60, 30, 500, 400], [12, 25, 200, 180], (400, 300)),
            ([100, 100, 620, 460], [210, 170, 80, 35], (256, 256)),
        ]:
            s = DetectSession(log=lambda *_: None)
            rgb = np.zeros((480, 640, 3), np.uint8)
            s.load_image(rgb)
            s.selection = np.asarray(base, float)
            region = np.zeros((base[3] - base[1], base[2] - base[0], 3),
                              np.uint8)
            s.region_rgb = region
            s.rotate_deg = angle
            s.process = lambda: None  # geometry only
            assert s.select_region(local, canvas)
            want = _reference_select_region_oracle(
                base, local, canvas, (640, 480),
                (region.shape[1], region.shape[0]), angle)
            np.testing.assert_allclose(np.asarray(s.selection, float), want,
                                       atol=1e-9, err_msg=f"angle={angle}")


@pytest.mark.slow
def test_zoom_detects_grid_on_ex15():
    """End-to-end zoom UX on ex15 (a needs-zoom book scan, README): full
    size finds no grid (the auto threshold, 104, is too high for the
    scan's weak lines); zooming in detects one, and the session's result
    agrees BIT-FOR-BIT with the reference algorithm run on the session's
    exact crop at the same threshold.

    The round-4 version of this test zoomed to coordinates on which the
    REFERENCE itself finds no grid (verified directly: run_pipeline on
    that exact crop+threshold returns board_ready=False at every commit
    since the test was added) — it encoded an expectation the reference
    never met, and had never passed. The coordinates below were probed
    against the reference first: the top-left quarter detects a partial
    board, and the second zoom re-runs it at the threshold the stale-
    region quirk picks from the first zoom's dims (choose(497) = 54)."""
    import pathlib

    cv2 = pytest.importorskip("cv2")  # noqa: F841  (oracle needs it)
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import reference_headless as rh
    from PIL import Image

    from img2sgf_tpu.hostio import load_rgb

    img_path = "/root/reference/test_images/ex15.jpg"
    if not pathlib.Path(img_path).exists():
        pytest.skip("reference fixtures unavailable")
    rgb = load_rgb(img_path)
    s = DetectSession(log=lambda *_: None)
    s.load_image(rgb)
    s.process()
    assert not s.board_ready  # full page: no grid (matches golden ex15)

    # zoom 1: the top-left quarter (canvas 800x600, display scale ~1.99
    # -> image region ~(4,4)-(501,501), the upper part of the diagram)
    assert s.select_region([2, 2, 252, 252], (800, 600))
    assert s.board_ready, "ex15 top-left zoom did not detect a grid"
    # zoom 2: the whole zoomed canvas — exercises the stale-threshold
    # quirk (threshold re-chosen from zoom 1's region dims: 54)
    assert s.select_region([5, 5, 795, 595], (800, 600))
    assert s.board_ready, "second ex15 zoom lost the grid"
    assert int(s.line_threshold) == 54  # the quirk's value, pinned

    # agreement with the reference algorithm on the SAME crop + threshold
    x1, y1, x2, y2 = (int(v) for v in s.selection)
    ref = rh.run_pipeline(Image.fromarray(rgb).crop((x1, y1, x2, y2)),
                          line_threshold=int(s.line_threshold))
    assert ref.board_ready
    assert (int(s.result.hsize), int(s.result.vsize)) == (ref.hsize, ref.vsize)
    np.testing.assert_array_equal(np.asarray(s.full_board),
                                  np.asarray(ref.full_board))
