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


def enable_compilation_cache(path: str = "~/.cache/deal_and_ceed_tpu_jax"):
    """Persistent XLA compilation cache for the benchmark drivers: large
    cycle programs take minutes to compile on the dev chip, and repeated
    driver runs hit identical programs."""
    import os

    import jax

    d = os.path.expanduser(path)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
