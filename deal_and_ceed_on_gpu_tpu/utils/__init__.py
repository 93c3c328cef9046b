from . import checkpoint, native, oracle, profiling, vtk
from .logging import pcout0, rank0_print
from .timer import Timer

__all__ = [
    "oracle",
    "native",
    "vtk",
    "profiling",
    "checkpoint",
    "pcout0",
    "rank0_print",
    "Timer",
]
