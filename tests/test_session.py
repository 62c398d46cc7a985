"""DetectSession logic tests (no display, no pipeline run): zoom geometry,
reclassification staging, stone cycling, alignment editing."""

import types

import numpy as np

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
