from .partition import SlabPartition
from .dist_operator import DistPoissonOperator
from .dist_solve import solve_cg_merged_dist, solve_cg_dist

__all__ = [
    "SlabPartition",
    "DistPoissonOperator",
    "solve_cg_merged_dist",
    "solve_cg_dist",
]
