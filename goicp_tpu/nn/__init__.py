from goicp_tpu.nn.brute import min_dist_sq, nearest_neighbor
from goicp_tpu.nn.grid import DistanceGrid, build_distance_grid

__all__ = [
    "min_dist_sq",
    "nearest_neighbor",
    "DistanceGrid",
    "build_distance_grid",
]
