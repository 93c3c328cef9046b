from .partition import BlockPartition, SlabPartition
from .dist_adaptive import (
    AdaptivePartition,
    DistAdaptivePoisson,
    solve_cg_merged_dist_adaptive,
)
from .dist_adaptive_mg import DistAdaptiveMultigrid, solve_cg_mg_dist_adaptive
from .dist_amr import amr_loop_distributed
from .dist_fdm import DistFDM, solve_cg_fdm_dist
from .dist_multigrid import DistMultigrid, solve_cg_mg_dist
from .dist_operator import DistOperator, DistPoissonOperator, halo_combine
from .dist_solve import (
    make_device_mesh,
    make_dist_solver,
    make_dist_vmult,
    solve_cg_dist,
    solve_cg_merged_dist,
)

__all__ = [
    "AdaptivePartition",
    "BlockPartition",
    "DistAdaptivePoisson",
    "SlabPartition",
    "solve_cg_merged_dist_adaptive",
    "DistAdaptiveMultigrid",
    "solve_cg_mg_dist_adaptive",
    "amr_loop_distributed",
    "DistFDM",
    "DistMultigrid",
    "DistOperator",
    "solve_cg_fdm_dist",
    "DistPoissonOperator",
    "solve_cg_mg_dist",
    "halo_combine",
    "make_device_mesh",
    "make_dist_solver",
    "make_dist_vmult",
    "solve_cg_dist",
    "solve_cg_merged_dist",
]
