"""End-to-end coupled corrosion on an AMR grid: CoupledSolver + UKit +
VTU/PVD outputs + fictitious refresh inside the loop."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import unstructured as u
from pd_mg_pin_corrosion_tpu.amr import build_amr_grid
from pd_mg_pin_corrosion_tpu.config import Config
from pd_mg_pin_corrosion_tpu.coupling import CoupledSolver
from pd_mg_pin_corrosion_tpu.fields import initialize_state
from pd_mg_pin_corrosion_tpu import grains as grains_mod


def test_amr_coupled_run(tmp_path):
    cfg = Config()
    cfg.dx = 5.0e-6
    cfg.use_amr = 1
    cfg.amr_ratio = 2
    cfg.amr_buffer = 30.0e-6
    cfg.R_wire = 20.0e-6
    cfg.L_wire = 80.0e-6
    cfg.R_tube = 100.0e-6
    cfg.L_upstream = 80.0e-6
    cfg.L_downstream = 80.0e-6
    cfg.c0 = 0.5
    cfg.cfl_factor = 0.25
    cfg.flow_conv_tol = 1.0e-4
    cfg.flow_max_iters = 3000
    cfg.D_grain = 5.0e-11
    cfg.D_gb = 5.0e-9
    cfg.gb_width_cells = 1
    cfg.T_final = 5.0
    cfg.corrosion_steps_per_check = 10
    cfg.use_implicit = 1
    cfg.implicit_output_every = 10**9
    cfg.diagnostic_every = 1
    cfg.output_dir = str(tmp_path / "out")
    cfg.precision = "f64"
    cfg.compute_derived()

    grid = build_amr_grid(cfg)
    assert int((grid.node_type == 1).sum()) > 0  # SOLID present
    assert int((grid.node_type == 6).sum()) > 0  # FICTITIOUS present

    g = grains_mod.generate(grid, cfg)
    kit = u.build_ukit(grid, cfg)
    state = initialize_state(grid, cfg, grains=g, dtype=kit.jdtype)

    solver = CoupledSolver()
    final = solver.run(grid, state, kit, cfg)

    # corrosion progressed and stayed finite
    assert solver.total_dissolved > 0
    assert np.isfinite(np.asarray(final.C)).all()
    assert np.isfinite(np.asarray(final.vel)).all()

    # AMR writer produced VTU snapshots + PVD
    files = os.listdir(cfg.output_dir)
    assert any(f.endswith(".vtu") for f in files)
    assert "simulation.pvd" in files
    with open(f"{cfg.output_dir}/diagnostics.csv") as f:
        rows = f.readlines()
    assert len(rows) > 1


def test_amr_coupled_run_block_backend(tmp_path):
    """Same end-to-end coupled corrosion through the BLOCK-structured AMR
    backend (amr_blocks) — the production default (amr_backend=structured):
    dissolution progresses, VTU/PVD written, diagnostics logged."""
    from pd_mg_pin_corrosion_tpu import amr_blocks as ab

    cfg = Config()
    cfg.dx = 5.0e-6
    cfg.use_amr = 1
    cfg.amr_ratio = 2
    cfg.amr_buffer = 30.0e-6
    cfg.R_wire = 20.0e-6
    cfg.L_wire = 80.0e-6
    cfg.R_tube = 100.0e-6
    cfg.L_upstream = 80.0e-6
    cfg.L_downstream = 80.0e-6
    cfg.c0 = 0.5
    cfg.cfl_factor = 0.25
    cfg.flow_conv_tol = 1.0e-4
    cfg.flow_max_iters = 3000
    cfg.D_grain = 5.0e-11
    cfg.D_gb = 5.0e-9
    cfg.gb_width_cells = 1
    cfg.T_final = 5.0
    cfg.corrosion_steps_per_check = 10
    cfg.use_implicit = 1
    cfg.implicit_output_every = 10**9
    cfg.diagnostic_every = 1
    cfg.output_dir = str(tmp_path / "out_blk")
    cfg.precision = "f64"
    cfg.compute_derived()

    grid = ab.build_amr_block_grid(cfg)
    assert int((grid.node_type == 1).sum()) > 0  # SOLID present
    assert int((grid.node_type == 6).sum()) > 0  # FICTITIOUS present

    g = ab.generate_grains_b(grid, cfg)
    kit = ab.build_bkit(grid, cfg)
    state = ab.initialize_state_b(grid, cfg, grains=g, dtype=kit.jdtype)

    solver = CoupledSolver()
    final = solver.run(grid, state, kit, cfg)

    assert solver.total_dissolved > 0
    assert np.isfinite(np.asarray(final.C)).all()
    assert np.isfinite(np.asarray(final.vel)).all()

    files = os.listdir(cfg.output_dir)
    assert any(f.endswith(".vtu") for f in files)
    assert "simulation.pvd" in files
    with open(f"{cfg.output_dir}/diagnostics.csv") as f:
        rows = f.readlines()
    assert len(rows) > 1


@pytest.mark.slow
def test_amr_block_coupled_fused_cycles_matches_host(tmp_path):
    """coupled_fused_cycles on the block-structured AMR backend (the
    production AMR path) must reproduce the host-driven cycle loop's
    trajectory — this is the backend/workload the fused loop targets."""
    from pd_mg_pin_corrosion_tpu import amr_blocks as ab

    def make(outdir, fused):
        cfg = Config()
        cfg.dx = 5.0e-6
        cfg.use_amr = 1
        cfg.amr_ratio = 2
        cfg.amr_buffer = 30.0e-6
        cfg.R_wire = 20.0e-6
        cfg.L_wire = 80.0e-6
        cfg.R_tube = 100.0e-6
        cfg.L_upstream = 80.0e-6
        cfg.L_downstream = 80.0e-6
        cfg.c0 = 0.5
        cfg.flow_conv_tol = 1.0e-4
        cfg.flow_max_iters = 2000
        cfg.D_grain = 5.0e-11
        cfg.D_gb = 5.0e-9
        cfg.T_final = 5.0
        cfg.corrosion_steps_per_check = 10
        cfg.use_implicit = 1
        cfg.implicit_output_every = 10**9
        cfg.diagnostic_every = 1
        cfg.output_dir = str(outdir)
        cfg.precision = "f64"
        cfg.coupled_fused_cycles = fused
        cfg.compute_derived()
        grid = ab.build_amr_block_grid(cfg)
        g = ab.generate_grains_b(grid, cfg)
        kit = ab.build_bkit(grid, cfg)
        state = ab.initialize_state_b(grid, cfg, grains=g, dtype=kit.jdtype)
        solver = CoupledSolver()
        final = solver.run(grid, state, kit, cfg)
        return cfg, solver, final

    cfg_h, solver_h, final_h = make(tmp_path / "host", 0)
    cfg_f, solver_f, final_f = make(tmp_path / "fused", 3)

    assert solver_h.total_dissolved > 0
    assert solver_f.total_dissolved == solver_h.total_dissolved
    assert solver_f.total_implicit_steps == solver_h.total_implicit_steps
    assert solver_f.flow_solve_count == solver_h.flow_solve_count

    for name in ("diagnostics.csv", "mass_loss.csv"):
        with open(f"{cfg_h.output_dir}/{name}") as f:
            host_rows = f.read()
        with open(f"{cfg_f.output_dir}/{name}") as f:
            fused_rows = f.read()
        assert fused_rows == host_rows, name

    np.testing.assert_array_equal(np.asarray(final_f.node_type),
                                  np.asarray(final_h.node_type))
    np.testing.assert_allclose(np.asarray(final_f.C),
                               np.asarray(final_h.C), rtol=0, atol=1e-12)
