from .operator_base import MatrixFreeOperator, assemble_rhs, l2_norm_function
from .poisson import PoissonOperator
from .helmholtz import HelmholtzOperator
from .mass import MassOperator

__all__ = [
    "MatrixFreeOperator",
    "PoissonOperator",
    "HelmholtzOperator",
    "MassOperator",
    "assemble_rhs",
    "l2_norm_function",
]
