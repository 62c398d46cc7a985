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
    # threshold re-chosen for the 100x100 region
    assert s.line_threshold == 23


def test_zoom_rejects_tiny_rectangles():
    s = DetectSession(log=lambda *_: None)
    rgb = np.zeros((400, 400, 3), np.uint8)
    s.load_image(rgb)
    s.region_rgb = rgb
    s.process = lambda: None
    assert not s.select_region([100, 100, 105, 200], (400, 400))
