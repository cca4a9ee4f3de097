"""End-to-end coupled-solver tests: full run (implicit + explicit paths),
diagnostics CSV schema, VTK/PVD outputs, checkpoint/resume."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import Config, build_grid, build_kit, initialize_state
from pd_mg_pin_corrosion_tpu import grains as grains_mod
from pd_mg_pin_corrosion_tpu.coupling import CoupledSolver, diagnostics


def coupled_cfg(tmp_path, use_implicit=1):
    cfg = Config()
    cfg.dx = 5.0e-6
    cfg.R_wire = 20.0e-6
    cfg.L_wire = 100.0e-6
    cfg.R_tube = 80.0e-6
    cfg.L_upstream = 60.0e-6
    cfg.L_downstream = 60.0e-6
    cfg.c0 = 0.5
    cfg.cfl_factor = 0.25
    cfg.flow_conv_tol = 1.0e-4
    cfg.flow_max_iters = 4000
    cfg.D_grain = 5.0e-11
    cfg.D_gb = 5.0e-9
    cfg.gb_width_cells = 1
    cfg.T_final = 10.0
    cfg.corrosion_steps_per_check = 20
    cfg.use_implicit = use_implicit
    cfg.implicit_output_every = 10**9
    cfg.diagnostic_every = 1
    cfg.output_every_corr = 10
    cfg.output_dir = str(tmp_path / "out")
    cfg.precision = "f64"
    return cfg.compute_derived()


def run_solver(cfg):
    grid = build_grid(cfg)
    g = grains_mod.generate(grid, cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, grains=g, dtype=kit.jdtype)
    solver = CoupledSolver()
    final = solver.run(grid, state, kit, cfg)
    return grid, kit, solver, final


def test_coupled_implicit_run(tmp_path):
    cfg = coupled_cfg(tmp_path, use_implicit=1)
    grid, kit, solver, final = run_solver(cfg)

    # dissolution actually progressed with these fast diffusivities
    assert solver.total_dissolved > 0

    # diagnostics.csv: schema identical to reference (coupling.cpp:74)
    with open(f"{cfg.output_dir}/diagnostics.csv") as f:
        header = f.readline().strip()
        rows = [l.strip().split(",") for l in f if l.strip()]
    assert header == "time_s,time_h,pin_mass_loss_pct,solid_nodes,v_max,C_max_fluid"
    assert len(rows) >= 1
    assert all(len(r) == 6 for r in rows)
    times = [float(r[0]) for r in rows]
    assert times == sorted(times)
    losses = [float(r[2]) for r in rows]
    assert losses[-1] > 0.0

    # mass_loss.csv (coupling.cpp:78)
    with open(f"{cfg.output_dir}/mass_loss.csv") as f:
        assert f.readline().strip() == "time_h,pin_mass_loss_pct"

    # VTK outputs + crash-safe PVDs exist
    files = os.listdir(cfg.output_dir)
    assert "simulation.pvd" in files
    assert "flow.pvd" in files
    assert any(f.startswith("state_") and f.endswith(".vti") for f in files)
    assert any(f.startswith("final_") for f in files)

    # diagnostics device function consistent with CSV tail
    d = diagnostics(final, kit)
    assert float(d[0]) == pytest.approx(losses[-1], rel=1e-6)


def test_coupled_explicit_run(tmp_path):
    cfg = coupled_cfg(tmp_path, use_implicit=0)
    cfg.T_final = 0.02
    cfg.corrosion_steps_per_check = 40
    grid, kit, solver, final = run_solver(cfg)
    # explicit path produced diagnostics and finished
    assert os.path.exists(f"{cfg.output_dir}/diagnostics.csv")
    C = np.asarray(final.C)
    assert np.isfinite(C).all()


def test_checkpoint_roundtrip(tmp_path):
    from pd_mg_pin_corrosion_tpu.checkpoint import load_checkpoint, save_checkpoint

    cfg = coupled_cfg(tmp_path)
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, 123.5, {"cycle": 7})
    restored, t, meta = load_checkpoint(path, state)
    assert t == 123.5
    assert meta["cycle"] == 7
    np.testing.assert_array_equal(np.asarray(restored.C), np.asarray(state.C))
    np.testing.assert_array_equal(np.asarray(restored.node_type),
                                  np.asarray(state.node_type))


def test_checkpoint_fingerprint_mismatch_refused(tmp_path):
    """Resuming with a different config or grid must be refused — a silently
    mismatched restore produces garbage."""
    from pd_mg_pin_corrosion_tpu.checkpoint import (fingerprint,
                                                    load_checkpoint,
                                                    save_checkpoint)

    cfg = coupled_cfg(tmp_path)
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    fp = fingerprint(cfg, grid)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, 1.0, {}, fp)

    # same cfg+grid: accepted; T_final/output_dir changes are resume-compatible
    cfg_ok = coupled_cfg(tmp_path)
    cfg_ok.T_final = 99.0
    cfg_ok.output_dir = str(tmp_path / "elsewhere")
    assert fingerprint(cfg_ok, grid) == fp
    load_checkpoint(path, state, fp)

    # physics key changed: refused
    cfg_bad = coupled_cfg(tmp_path)
    cfg_bad.D_liquid *= 2.0
    fp_bad = fingerprint(cfg_bad, grid)
    assert fp_bad != fp
    with pytest.raises(ValueError, match="different config/grid"):
        load_checkpoint(path, state, fp_bad)


def test_coupled_resume(tmp_path):
    """checkpoint_every + resume_from through the orchestrator (new
    capability; the reference restarts from t=0)."""
    cfg = coupled_cfg(tmp_path)
    cfg.T_final = 3.0
    cfg.checkpoint_every = 1
    grid, kit, solver, final = run_solver(cfg)
    ckpt = f"{cfg.output_dir}/checkpoint.npz"
    assert os.path.exists(ckpt)

    # resume into a longer run
    cfg2 = coupled_cfg(tmp_path)
    cfg2.output_dir = str(tmp_path / "out2")
    cfg2.T_final = 4.0
    cfg2.resume_from = ckpt
    grid2 = build_grid(cfg2)
    kit2 = build_kit(grid2, cfg2)
    state2 = initialize_state(grid2, cfg2, dtype=kit2.jdtype)
    solver2 = CoupledSolver()
    final2 = solver2.run(grid2, state2, kit2, cfg2)

    # resumed run continued past the checkpoint time and stayed consistent
    with open(f"{cfg2.output_dir}/diagnostics.csv") as f:
        rows = [l.split(",") for l in f.readlines()[1:] if l.strip()]
    assert rows, "resumed run wrote no diagnostics"
    assert float(rows[0][0]) > 0.5  # starts from checkpoint clock, not t=0
    nt_final = np.asarray(final2.node_type)
    assert np.isfinite(np.asarray(final2.C)).all()
