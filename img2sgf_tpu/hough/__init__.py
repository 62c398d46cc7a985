from .lines import hough_lines_intercepts

__all__ = ["hough_lines_intercepts"]
