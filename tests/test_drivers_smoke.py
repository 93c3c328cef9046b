"""Driver smoke tests (CPU): the CLIs stay runnable end-to-end."""

import numpy as np

from deal_and_ceed_on_gpu_tpu.drivers import bp, bp5


def test_bp5_run_cycle_smoke():
    cfg = bp5.BP5Config(
        degree=2, n_iterations=10, n_repetitions=1, dtype="float64",
        backend="separable", modes=("pcg-standard", "pcg-merged", "fdm-direct", "vmult"),
    )
    res = bp5.run_cycle(12, cfg)
    assert set(res) >= {"pcg-standard", "pcg-merged", "fdm-direct", "vmult", "l2_norm"}
    assert res["vmult"] > 0 and np.isfinite(res["l2_norm"])


def test_bp5_distributed_cycle_smoke():
    """Distributed driver: pcg-merged + vmult on a 2x2 block mesh (cycle 9
    has mx,my,mz = 2,2,3 — uneven in z, exercising the padding path)."""
    cfg = bp5.BP5Config(
        degree=2, n_iterations=10, n_repetitions=1, dtype="float64",
        backend="structured", modes=("pcg-merged", "vmult"),
    )
    res = bp5.run_cycle_distributed(9, 2, 2, cfg)
    assert res["pcg-merged"] > 0 and res["vmult"] > 0


def test_bp_sweep_smoke():
    res = bp.run_sweep(
        "bp1", degrees=[2], target_dofs=2000, n_iterations=5, n_repetitions=1,
        dtype="float64", modes=("pcg-merged",),
    )
    assert res[2]["pcg-merged"] > 0


def test_bp5_pallas_backend_cycle_smoke():
    """run_cycle with backend='pallas': whole solves in the padded layout
    (interpret-mode kernel on CPU)."""
    cfg = bp5.BP5Config(
        degree=2, n_iterations=12, n_repetitions=1, dtype="float64",
        backend="pallas", modes=("pcg-standard", "pcg-merged", "vmult"),
        pallas_opts=dict(interpret=True),
    )
    res = bp5.run_cycle(8, cfg)
    assert res["pcg-merged"] > 0 and res["vmult"] > 0
    assert np.isfinite(res["l2_norm"])


def test_bp5_pcg_ir_mode_smoke():
    """pcg-ir mode: mixed-precision refinement to a true f64 1e-10
    residual inside the driver."""
    cfg = bp5.BP5Config(
        degree=2, n_iterations=10, n_repetitions=1, dtype="float64",
        backend="separable", modes=("pcg-ir",),
    )
    res = bp5.run_cycle(10, cfg)
    assert res["pcg-ir"] > 0 and np.isfinite(res["l2_norm"])


def test_bp5_pallas_bf16_stream_cycle_smoke():
    """run_cycle with backend='pallas' + stream_dtype=bfloat16: solves run
    on bf16 HBM vectors with f32 dots (interpret-mode kernel on CPU)."""
    cfg = bp5.BP5Config(
        degree=2, n_iterations=12, n_repetitions=1, dtype="float32",
        backend="pallas", modes=("pcg-merged", "vmult"),
        pallas_opts=dict(interpret=True), stream_dtype="bfloat16",
    )
    res = bp5.run_cycle(8, cfg)
    assert res["pcg-merged"] > 0 and res["vmult"] > 0
    assert np.isfinite(res["l2_norm"])


def test_bp5_pallas_general_backend_cycle_smoke():
    """run_cycle with backend='pallas_general' (Gauss rule)."""
    cfg = bp5.BP5Config(
        degree=2, n_iterations=12, n_repetitions=1, dtype="float64",
        backend="pallas_general", rule="gauss",
        modes=("pcg-merged",), pallas_opts=dict(interpret=True),
    )
    res = bp5.run_cycle(8, cfg)
    assert res["pcg-merged"] > 0 and np.isfinite(res["l2_norm"])


def test_amr_driver_cli_smoke(tmp_path, monkeypatch, capsys):
    """The AMR CLI end-to-end: MG preconditioner, f32 reduction default,
    and VTU output all work through main()."""
    import sys

    from deal_and_ceed_on_gpu_tpu.drivers import amr

    out = tmp_path / "sol.vtu"
    monkeypatch.setattr(
        sys, "argv",
        ["amr", "--base", "3", "--steps", "1", "--precond", "mg",
         "--dtype", "float32", "--write-solution", str(out)],
    )
    amr.main()
    text = capsys.readouterr().out
    assert "estimate" in text and str(out) in text
    assert out.exists() and out.stat().st_size > 0
    # the f32 default target (1e-5) must actually converge: no step may
    # burn the full 800-iteration budget
    its = [int(line.split()[3]) for line in text.splitlines()
           if line.strip() and line.split()[0].isdigit()]
    assert its and max(its) < 800


def test_bp5_auto_backend_resolves_by_size():
    """backend='auto' encodes the measured solver-selection guidance:
    small uniform GLL meshes -> separable; Gauss rule -> pallas_general
    (interpret on CPU via pallas_opts)."""
    cfg = bp5.BP5Config(
        degree=2, n_iterations=8, n_repetitions=1, dtype="float64",
        backend="auto", modes=("pcg-merged",),
    )
    res = bp5.run_cycle(10, cfg)  # 35k DoFs -> separable
    assert res["pcg-merged"] > 0 and np.isfinite(res["l2_norm"])
    cfg = bp5.BP5Config(
        degree=2, n_iterations=8, n_repetitions=1, dtype="float64",
        backend="auto", rule="gauss", modes=("pcg-merged",),
        pallas_opts=dict(interpret=True),
    )
    res = bp5.run_cycle(8, cfg)
    assert res["pcg-merged"] > 0 and np.isfinite(res["l2_norm"])


def test_bp5_f64_pallas_falls_back_to_separable():
    """--dtype float64 --backend pallas (no interpret): refused loudly by
    default (Mosaic kernels are f32/bf16-only — VERDICT r3 item 4); with
    the explicit --f64-fallback opt-in the f64 modes run the separable
    path. Passing on the CPU test platform proves the fallback fired — a
    real (non-interpret) pallas build here raises 'Only interpret mode is
    supported on CPU'. The pcg-ir mode keeps its f32 pallas inner operator
    without the opt-in (TPU-verified via the bp5 driver; its CPU smoke is
    the interpret-mode pcg-ir test)."""
    import pytest

    cfg = bp5.BP5Config(
        degree=2, n_iterations=12, n_repetitions=1, dtype="float64",
        backend="pallas", modes=("pcg-merged", "vmult"),
    )
    with pytest.raises(SystemExit, match="pcg-ir"):
        bp5.run_cycle(8, cfg)
    cfg = bp5.BP5Config(
        degree=2, n_iterations=12, n_repetitions=1, dtype="float64",
        backend="pallas", modes=("pcg-merged", "vmult"), f64_fallback_ok=True,
    )
    res = bp5.run_cycle(8, cfg)
    assert res["pcg-merged"] > 0 and res["vmult"] > 0
    assert np.isfinite(res["l2_norm"])
