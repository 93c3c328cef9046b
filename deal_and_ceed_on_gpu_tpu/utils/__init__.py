from . import checkpoint, native, oracle, profiling, vtk
from .hoist import jit_hoisted
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
    "ensure_x64",
    "enable_compilation_cache",
    "jit_hoisted",
]


def ensure_x64(dtype) -> None:
    """Enable ``jax_enable_x64`` when ``dtype`` is a 64-bit type.

    Driver CLIs take ``--dtype float64``; without this, JAX silently
    truncates every f64 array to f32 (the axon TPU plugin ignores the
    ``JAX_ENABLE_X64`` env var, so the config update is the only reliable
    switch) — the step-64 golden fingerprint (60 iterations, L2
    0.0205268514) is an f64 result and quietly degrades to 64 its
    otherwise."""
    import jax

    if "64" in str(dtype):
        jax.config.update("jax_enable_x64", True)


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
