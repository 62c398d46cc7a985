from .board import BLACK, WHITE, Alignment, BoardStates, align_board_jnp, align_board_np
from .sgf import guess_side_to_move, to_sgf

__all__ = [
    "BLACK",
    "WHITE",
    "Alignment",
    "BoardStates",
    "align_board_jnp",
    "align_board_np",
    "guess_side_to_move",
    "to_sgf",
]
