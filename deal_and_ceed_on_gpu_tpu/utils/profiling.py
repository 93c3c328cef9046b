"""Tracing/profiling utilities (reference aux subsystem: nvprof/NVVP
workflow documented in README.md:50-88, ``-lineinfo`` builds, Timer +
cudaDeviceSynchronize fencing).

TPU equivalents:
- :func:`trace` — context manager around ``jax.profiler`` producing an
  xplane trace viewable in XProf/Perfetto/TensorBoard (the nvprof timeline
  analog).
- :func:`op_stats` — quick wall-clock + achieved-throughput numbers for a
  jitted function with ``block_until_ready`` fencing (the Timer analog).
- :func:`roofline` — bytes/FLOP accounting helper for matrix-free applies.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "op_stats", "roofline"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpu_trace"):
    """Capture a device trace: ``with trace('/tmp/t'): f(x)``; inspect with
    XProf/TensorBoard ('Trace Viewer')."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def op_stats(fn: Callable, *args, n_warmup=2, n_iter=10, work_items=None):
    """Time a jitted callable with proper fencing; returns dict with
    best/mean seconds and items/s if ``work_items`` given."""
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    stats = {
        "best_s": best,
        "mean_s": sum(times) / len(times),
        "n_iter": n_iter,
    }
    if work_items:
        stats["items_per_s"] = work_items / best
    return stats


# Measured on the axon-tunneled v5e dev chip (round 2, see
# ARCHITECTURE.md "measured bounds"); production v5e spec values are
# ~819 GB/s HBM and ~5x the matmul rate.
MEASURED_DEV_CHIP = {
    "hbm_gbps": 600.0,  # XLA streaming (480-600 measured)
    "pallas_dma_gbps": 145.0,  # HBM<->VMEM rate inside Pallas kernels
    "f32_highest_tps": 14.0,  # large matmuls, Precision.HIGHEST
    "bf16_tps": 40.0,
    "vpu_aligned_tps": 3.9,  # leading-dim tap slices
    "vpu_shifted_tps": 1.1,  # sublane/lane-shifted taps
}


def roofline(
    n_dofs,
    degree,
    dtype_bytes=4,
    hbm_gbps=MEASURED_DEV_CHIP["hbm_gbps"],
    flops_tps=MEASURED_DEV_CHIP["vpu_aligned_tps"],
    pallas_dma_gbps=MEASURED_DEV_CHIP["pallas_dma_gbps"],
):
    """Back-of-envelope bounds for one BP5 operator apply on the
    stencil/separable paths: ideal traffic = read + write of the nodal
    grid; FLOPs = three banded 1D sweeps (2(2p+1) each). Defaults use the
    dev chip's MEASURED rates, including the Pallas in-kernel DMA ceiling
    (~4x below the chip's XLA streaming rate). Returns ceilings in
    GDoF/s."""
    traffic = 2 * n_dofs * dtype_bytes
    flops = 6 * (2 * degree + 1) * n_dofs
    return {
        "bandwidth_bound_gdofs": n_dofs / (traffic / (hbm_gbps * 1e9)) / 1e9,
        "pallas_dma_bound_gdofs": n_dofs
        / (traffic / (pallas_dma_gbps * 1e9))
        / 1e9,
        "compute_bound_gdofs": n_dofs / (flops / (flops_tps * 1e12)) / 1e9,
    }
