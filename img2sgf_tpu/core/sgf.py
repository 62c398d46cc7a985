"""SGF (Smart Game Format) writer.

Byte-identical output to the reference's to_SGF (img2sgf.py:781-810),
including its quirks:
  - the side to move's stones are listed first, because Lizzie infers the
    turn from AB/AW tag order (img2sgf.py:802-809);
  - when one colour is absent its tag is omitted but the newline remains.
"""

from __future__ import annotations

import string

import numpy as np

from .board import BLACK, BoardStates


def to_sgf(board, side_to_move: int = BLACK, board_size: int = 19) -> str:
    """Render a [board_size, board_size] array of BoardStates to SGF text.

    `board` is indexed [i, j] with i = column, j = row (reference layout).
    `side_to_move` is 1 for black, 2 for white (img2sgf.py:89).
    """
    board = np.asarray(board)
    letters = string.ascii_lowercase
    out = "(;GM[1]FF[4]SZ[" + str(board_size) + "]\n"
    out += "PL[B]\n" if side_to_move == BLACK else "PL[W]\n"

    black_moves, white_moves = "", ""
    if (board == BoardStates.BLACK).any():
        black_moves += "AB"
        for i in range(board_size):
            for j in range(board_size):
                if board[i, j] == BoardStates.BLACK:
                    black_moves += "[" + letters[i] + letters[j] + "]"
    if (board == BoardStates.WHITE).any():
        white_moves += "AW"
        for i in range(board_size):
            for j in range(board_size):
                if board[i, j] == BoardStates.WHITE:
                    white_moves += "[" + letters[i] + letters[j] + "]"

    if side_to_move == BLACK:
        out += black_moves + "\n" + white_moves + "\n" + ")\n"
    else:
        out += white_moves + "\n" + black_moves + "\n" + ")\n"
    return out


def guess_side_to_move(board) -> int:
    """Black to play iff #black <= #white (img2sgf.py:529-534)."""
    board = np.asarray(board)
    nb = int((board == BoardStates.BLACK).sum())
    nw = int((board == BoardStates.WHITE).sum())
    return 1 if nb <= nw else 2
