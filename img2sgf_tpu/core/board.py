"""Board model: cell states, alignment, and board placement.

Reference semantics: img2sgf.py:82-89 (BoardStates, Alignment) and
align_board (img2sgf.py:484-494).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np


class BoardStates(enum.IntEnum):
    EMPTY = 0
    BLACK = 1
    WHITE = 2
    STONE = 3  # temporary flag: stone present, colour not yet determined


class Alignment(enum.IntEnum):
    TOP = 0
    BOTTOM = 1
    LEFT = 2
    RIGHT = 3


# Side-to-move encoding (img2sgf.py:89)
BLACK, WHITE = 1, 2


def align_board_np(part: np.ndarray, alignment, board_size: int = 19) -> np.ndarray:
    """Place an hsize x vsize part-board into a full board (host-side numpy).

    `part` is indexed [i, j] with i = column (x) and j = row (y), like the
    reference's detected_board. `alignment` is (horizontal, vertical) i.e.
    (LEFT|RIGHT, TOP|BOTTOM), matching board_alignment (img2sgf.py:627).
    """
    hsize, vsize = part.shape
    board = np.zeros((board_size, board_size), dtype=part.dtype)
    xoff = board_size - hsize if alignment[0] == Alignment.RIGHT else 0
    yoff = board_size - vsize if alignment[1] == Alignment.BOTTOM else 0
    board[xoff : xoff + hsize, yoff : yoff + vsize] = part
    return board


def align_board_jnp(part, hsize, vsize, align_right, align_bottom, board_size: int = 19):
    """Jittable align_board over a fixed-capacity part board.

    `part` is a [board_size, board_size] array whose top-left [hsize, vsize]
    block holds the detected part-board (rest is ignored). hsize/vsize are
    traced ints; align_right/align_bottom are traced bools.
    Returns the full [board_size, board_size] board.
    """
    part = jnp.asarray(part)
    xoff = jnp.where(align_right, board_size - hsize, 0)
    yoff = jnp.where(align_bottom, board_size - vsize, 0)
    ii = jnp.arange(board_size)[:, None]
    jj = jnp.arange(board_size)[None, :]
    src_i = ii - xoff
    src_j = jj - yoff
    inside = (src_i >= 0) & (src_i < hsize) & (src_j >= 0) & (src_j < vsize)
    src_i = jnp.clip(src_i, 0, board_size - 1)
    src_j = jnp.clip(src_j, 0, board_size - 1)
    return jnp.where(inside, part[src_i, src_j], 0)
