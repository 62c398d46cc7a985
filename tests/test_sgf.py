"""Golden tests for the SGF writer vs hand-derived reference strings.

The expected strings follow to_SGF (img2sgf.py:781-810) exactly: header,
PL tag, AB/AW ordering by side to move, and trailing newlines.
"""

import numpy as np

from img2sgf_tpu.core import BLACK, WHITE, BoardStates, guess_side_to_move, to_sgf


def _board(stones):
    b = np.zeros((19, 19), dtype=np.int32)
    for (i, j), s in stones.items():
        b[i, j] = s
    return b


def test_empty_board_black_to_move():
    sgf = to_sgf(_board({}), side_to_move=BLACK)
    assert sgf == "(;GM[1]FF[4]SZ[19]\nPL[B]\n\n\n)\n"


def test_single_black_stone():
    b = _board({(3, 4): BoardStates.BLACK})
    sgf = to_sgf(b, side_to_move=BLACK)
    assert sgf == "(;GM[1]FF[4]SZ[19]\nPL[B]\nAB[de]\n\n)\n"


def test_black_and_white_white_to_move():
    # White to move: AW tag comes first (Lizzie quirk, img2sgf.py:802-809)
    b = _board({(0, 0): BoardStates.BLACK, (18, 18): BoardStates.WHITE})
    sgf = to_sgf(b, side_to_move=WHITE)
    assert sgf == "(;GM[1]FF[4]SZ[19]\nPL[W]\nAW[ss]\nAB[aa]\n)\n"


def test_scan_order_row_major_in_i_then_j():
    b = _board(
        {
            (2, 5): BoardStates.BLACK,
            (2, 3): BoardStates.BLACK,
            (1, 9): BoardStates.BLACK,
        }
    )
    sgf = to_sgf(b, side_to_move=BLACK)
    assert "AB[bj][cd][cf]" in sgf


def test_guess_side_to_move():
    assert guess_side_to_move(_board({})) == BLACK
    assert guess_side_to_move(_board({(0, 0): BoardStates.BLACK})) == WHITE
    b = _board({(0, 0): BoardStates.BLACK, (1, 1): BoardStates.WHITE})
    assert guess_side_to_move(b) == BLACK  # ties -> black
