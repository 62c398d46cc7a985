from .cluster import cluster_1d
from .complete import complete_grid, truncate_grid, validate_axis, validate_grid
from .identify import closest_indices, identify_board, intersection_intensities

__all__ = [
    "cluster_1d",
    "complete_grid",
    "truncate_grid",
    "validate_axis",
    "validate_grid",
    "closest_indices",
    "identify_board",
    "intersection_intensities",
]
