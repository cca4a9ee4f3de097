"""Coupled-run parity against the reference binary's diagnostics.csv.

tests/golden/parity_diagnostics_ref.csv was produced by the actual C++
reference (g++ -O2 -fopenmp -DPD_DIM=2, OMP_NUM_THREADS=1, Eigen 3.4) on
tests/golden/parity.cfg: a full corrosion run — steady flow solves, 10
adaptive implicit transport steps, phase change dissolving all 180 solid
nodes across 6 coupling cycles.

This rebuild reproduces the trajectory (gs_parity mode: the reference's
in-place sequential outlet/smoothing sweeps are replayed exactly):
  time_s / solid_nodes                     exact
  pin_mass_loss_pct, v_max, C_max_fluid    <= 1e-6 relative (BASELINE.md
                                           target)
Measured state (round 4, after the bit-exact grain-RNG fix): the entire
diagnostics.csv is BYTE-IDENTICAL to the reference binary's. The asserts
keep 1e-6 of headroom so a future XLA version's 1-ulp drift doesn't read
as a regression; for scale, the reference binary rebuilt with FMA enabled
(-march=x86-64-v3) disagrees with its own -O2 build by 1e-1 on this
workload (docs/runs/parity_floor/REPORT.md).
"""

import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import Config, build_grid, build_kit, initialize_state
from pd_mg_pin_corrosion_tpu import grains as grains_mod
from pd_mg_pin_corrosion_tpu.coupling import CoupledSolver

import os

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.slow
def test_coupled_run_matches_reference_binary(tmp_path):
    cfg = Config.load(os.path.join(GOLDEN_DIR, "parity.cfg"))
    cfg.output_dir = str(tmp_path / "out")
    cfg.precision = "f64"
    cfg.gs_parity = 1
    cfg.implicit_output_every = 10**9  # diagnostics only, no VTI churn

    grid = build_grid(cfg)
    g = grains_mod.generate(grid, cfg)  # D_gb == D_grain: RNG-independent
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, grains=g, dtype=kit.jdtype)
    CoupledSolver().run(grid, state, kit, cfg)

    ref = np.atleast_1d(np.genfromtxt(
        os.path.join(GOLDEN_DIR, "parity_diagnostics_ref.csv"),
        delimiter=",", names=True))
    ours = np.atleast_1d(np.genfromtxt(
        f"{cfg.output_dir}/diagnostics.csv", delimiter=",", names=True))

    assert len(ours) == len(ref)
    np.testing.assert_array_equal(ours["solid_nodes"], ref["solid_nodes"])
    np.testing.assert_allclose(ours["time_s"], ref["time_s"], rtol=1e-9)
    np.testing.assert_allclose(ours["pin_mass_loss_pct"],
                               ref["pin_mass_loss_pct"], rtol=1e-6)
    np.testing.assert_allclose(ours["v_max"], ref["v_max"], rtol=1e-6)
    np.testing.assert_allclose(ours["C_max_fluid"], ref["C_max_fluid"],
                               rtol=1e-6)
