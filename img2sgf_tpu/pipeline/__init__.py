from .detect import BoardResult, detect_board, detect_board_batch, detect_board_jit

__all__ = ["BoardResult", "detect_board", "detect_board_batch", "detect_board_jit"]
