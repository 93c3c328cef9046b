from . import oracle
from .logging import pcout0, rank0_print
from .timer import Timer

__all__ = ["oracle", "pcout0", "rank0_print", "Timer"]
