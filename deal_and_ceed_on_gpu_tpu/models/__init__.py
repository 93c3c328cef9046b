from .operator_base import MatrixFreeOperator, assemble_rhs, l2_norm_function
from .poisson import PoissonOperator
from .helmholtz import HelmholtzOperator
from .mass import MassOperator
from .vector import VectorOperator
from .bp import BP_SPECS, make_bp_operator
from .operator_base import tensor_product_diagonal

__all__ = [
    "MatrixFreeOperator",
    "PoissonOperator",
    "HelmholtzOperator",
    "MassOperator",
    "VectorOperator",
    "BP_SPECS",
    "make_bp_operator",
    "tensor_product_diagonal",
    "assemble_rhs",
    "l2_norm_function",
]
