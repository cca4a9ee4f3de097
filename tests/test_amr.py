"""AMR validation — ports of the reference's 4 AMR tests (tests/test_amr.cpp):
grid-construction invariants + IDW interpolation, and implicit transport on
the two-level grid compared against BOTH the analytic solution and a
uniform-fine-grid run of the structured solver (isolating AMR-coupling error
from discretization error).

GOLDEN PARITY NUMBERS come from running the reference test_amr binary
(g++ -O2 -fopenmp -DPD_DIM=2): fine=1600 coarse=2749 fict=948 total=5297,
IDW max err 4.249e-02; diffusion L2_ana=2.1234e-02 L2_vs_uni=5.4820e-03
mass=1.75e-01%; advection L2_ana=4.4491e-01 L2_vs_uni=8.1940e-05
C_peak=0.8381; adv-diff L2_ana=4.4286e-01 L2_vs_uni=8.3000e-05 C_peak=0.8370.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import unstructured as u
from pd_mg_pin_corrosion_tpu.amr import build_amr_grid
from pd_mg_pin_corrosion_tpu.config import Config
from pd_mg_pin_corrosion_tpu.fields import initialize_state
from pd_mg_pin_corrosion_tpu.grid import (FICTITIOUS, FLUID, OUTSIDE, WALL,
                                          build_grid)
from pd_mg_pin_corrosion_tpu.kit import build_kit
from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai


def make_amr_test_config(D_liquid, Q_flow):
    """tests/test_amr.cpp:28-72."""
    cfg = Config()
    cfg.dx = 5.0e-6
    cfg.m_ratio = 3
    cfg.R_wire = 0.0
    cfg.L_wire = 0.0
    cfg.R_tube = 200.0e-6
    cfg.L_upstream = 300.0e-6
    cfg.L_downstream = 300.0e-6
    cfg.c0 = 5.0
    cfg.Q_flow = Q_flow
    cfg.D_liquid = D_liquid
    cfg.D_grain = 0.0
    cfg.D_gb = 0.0
    cfg.D_precip = 0.0
    cfg.precip_fraction = 0.0
    cfg.C_sat = 10.0
    cfg.alpha_art_diff = 0.0
    cfg.gb_width_cells = 0
    cfg.use_amr = 1
    cfg.amr_ratio = 2
    cfg.amr_buffer = 100.0e-6
    cfg.precision = "f64"
    return cfg.compute_derived()


def amr_setup(cfg, v_axial=0.0):
    grid = build_amr_grid(cfg)
    kit = u.build_ukit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    nt = grid.node_type
    movers = (nt == FLUID) | (nt == 3) | (nt == 4) | (nt == FICTITIOUS)
    vel = np.zeros((grid.N_total, 2))
    vel[:, 1] = np.where(movers, v_axial, 0.0)
    state = replace(state, vel=jnp.asarray(vel))
    return grid, kit, state


def amr_gaussian(state, grid, sigma, r0, z0):
    """IC on FLUID and FICTITIOUS nodes (test_amr.cpp:112-125)."""
    nt = grid.node_type
    mask = (nt == FLUID) | (nt == FICTITIOUS)
    g = np.exp(-((grid.pos[:, 0] - r0) ** 2 + (grid.pos[:, 1] - z0) ** 2)
               / (2.0 * sigma**2))
    return replace(state, C=jnp.asarray(np.where(mask, g, 0.0)))


def exact(grid_pos, r0, z0, sigma, D, t, v_z=0.0):
    sig2t = sigma**2 + 2.0 * D * t
    dr = grid_pos[:, 0] - r0
    dz = grid_pos[:, 1] - (z0 + v_z * t)
    return (sigma**2 / sig2t) * np.exp(-(dr * dr + dz * dz) / (2.0 * sig2t))


def l2_weighted(C, C_ref, fluid, vol):
    e2 = ((C - C_ref) ** 2 * vol)[fluid].sum()
    r2 = (C_ref**2 * vol)[fluid].sum()
    return float(np.sqrt(e2 / (r2 + 1e-30)))


def run_amr_implicit(state, kit, dt_fixed, t_end):
    op = jax.jit(lambda s: u.assemble(s, kit))(state)
    step = jax.jit(lambda s, dt: u.update_fictitious(
        u.implicit_step(s, op, kit, dt)[0], kit))
    t = 0.0
    while t < t_end - 1e-12:
        dt = min(dt_fixed, t_end - t)
        state = step(state, dt)
        t += dt
    return state


def run_uniform_implicit(cfg_amr, sigma, r0, z0, v_axial, dt_fixed, t_end):
    """Uniform-fine reference run of the structured solver
    (test_amr.cpp:249-290)."""
    import copy
    cfg = copy.copy(cfg_amr)
    cfg.use_amr = 0
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    nt = grid.node_type
    movers = (nt == FLUID) | (nt == 3) | (nt == 4)
    vel = np.zeros(grid.shape + (2,))
    vel[..., 1] = np.where(movers, v_axial, 0.0)
    g = np.exp(-((grid.pos[..., 0] - r0) ** 2 + (grid.pos[..., 1] - z0) ** 2)
               / (2.0 * sigma**2))
    C0 = np.where(nt == FLUID, g, 0.0)
    state = replace(state, vel=jnp.asarray(vel), C=jnp.asarray(C0))

    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    step = jax.jit(lambda s, dt: ai.implicit_step(s, op, kit, dt)[0])
    t = 0.0
    while t < t_end - 1e-12:
        dt = min(dt_fixed, t_end - t)
        state = step(state, dt)
        t += dt
    return grid, state


def l2_vs_uniform(amr_C, amr_grid, uni_grid, uni_C):
    """Volume-weighted L2 of the AMR solution vs nearest uniform-fine node
    (test_amr.cpp:217-246)."""
    uni_flat_C = np.asarray(uni_C).ravel()
    nt_uni = uni_grid.node_type.ravel()
    err2 = ref2 = 0.0
    for i in np.flatnonzero(amr_grid.node_type == FLUID):
        px, py = amr_grid.pos[i]
        ii = int(round((px - uni_grid.origin[0]) / uni_grid.dx))
        jj = int(round((py - uni_grid.origin[1]) / uni_grid.dx))
        C_ref = 0.0
        if 0 <= ii < uni_grid.Nx and 0 <= jj < uni_grid.Ny:
            n = jj * uni_grid.Nx + ii
            if nt_uni[n] not in (OUTSIDE, WALL):
                C_ref = uni_flat_C[n]
        vol = amr_grid.dx_local[i] ** 2
        e = amr_C[i] - C_ref
        err2 += e * e * vol
        ref2 += C_ref * C_ref * vol
    return float(np.sqrt(err2 / (ref2 + 1e-30)))


# ============================================================================


def test_amr_grid_construction():
    """test_amr.cpp:296-421 — grid invariants + IDW interpolation."""
    cfg = make_amr_test_config(1.0e-9, 1.667e-9)
    grid = build_amr_grid(cfg)

    nt = grid.node_type
    lvl = grid.grid_level
    n_fict = int((nt == FICTITIOUS).sum())
    n_fine = int(((nt != FICTITIOUS) & (lvl == 0)).sum())
    n_coarse = int(((nt != FICTITIOUS) & (lvl == 1)).sum())
    n_fluid = int((nt == FLUID).sum())

    # goldens: exact reference counts
    assert n_fine == 1600
    assert n_coarse == 2749
    assert n_fict == 948
    assert n_fluid == 3600
    assert grid.N_total == 5297

    # no isolated fluid nodes
    has_nbrs = (grid.nbr_vol > 0).any(axis=1)
    assert bool(has_nbrs[nt == FLUID].all())

    # every fictitious node has IDW sources summing to 1
    assert np.allclose(grid.fict_w.sum(axis=1), 1.0)

    # IDW reproduction of the Poiseuille profile (golden max err 4.249e-02)
    v = 1.5 * cfg.U_in * (1.0 - np.minimum(grid.pos[:, 0] ** 2 / cfg.R_tube**2, 1.0))
    vi = (v[grid.fict_src] * grid.fict_w).sum(axis=1)
    ve = v[grid.fict_nodes]
    mask = ve > 1e-6
    max_err = float((np.abs(vi[mask] - ve[mask]) / ve[mask]).max())
    assert max_err < 0.10
    assert max_err == pytest.approx(4.249e-02, rel=1e-3)

    # PD-NS dt is sane on the AMR kit
    kit = u.build_ukit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    dt = float(u.compute_dt_ns(state, kit))
    assert np.isfinite(dt) and dt > 0


def test_amr_diffusion():
    """test_amr.cpp:427-526 — goldens L2_ana=2.1234e-02,
    L2_vs_uniform=5.4820e-03, mass=1.75e-01%."""
    D = 1.0e-9
    cfg = make_amr_test_config(D, 0.0)
    grid, kit, state = amr_setup(cfg)
    sigma, r0, z0, t_end = 30e-6, 0.0, 0.0, 0.5
    state = amr_gaussian(state, grid, sigma, r0, z0)

    fluid = grid.node_type == FLUID
    vol = grid.dx_local**2
    mass0 = float((np.asarray(state.C) * vol)[fluid].sum())

    state = run_amr_implicit(state, kit, 0.01, t_end)
    C = np.asarray(state.C)

    Cex = np.where(fluid, exact(grid.pos, r0, z0, sigma, D, t_end), 0.0)
    l2_ana = l2_weighted(C, Cex, fluid, vol)
    mass1 = float((C * vol)[fluid].sum())
    mass_change = abs(mass1 - mass0) / mass0 * 100.0

    assert l2_ana == pytest.approx(2.1234e-02, rel=2e-3)
    assert mass_change == pytest.approx(0.175, rel=0.05)

    uni_grid, uni_state = run_uniform_implicit(cfg, sigma, r0, z0, 0.0, 0.01, t_end)
    l2_uni = l2_vs_uniform(C, grid, uni_grid, uni_state.C)
    assert l2_uni < 0.10
    assert l2_uni == pytest.approx(5.4820e-03, rel=5e-3)


def test_amr_advection():
    """test_amr.cpp:532-~650 — goldens L2_ana=4.4491e-01,
    L2_vs_uniform=8.1940e-05, C_peak=0.8381."""
    D = 1.0e-12
    v_axial = 0.05
    cfg = make_amr_test_config(D, 0.0)
    grid, kit, state = amr_setup(cfg, v_axial)
    sigma, r0, z0, t_end = 20e-6, 0.0, -20e-6, 0.0005
    state = amr_gaussian(state, grid, sigma, r0, z0)

    fluid = grid.node_type == FLUID
    vol = grid.dx_local**2
    mass0 = float((np.asarray(state.C) * vol)[fluid].sum())

    state = run_amr_implicit(state, kit, 5e-5, t_end)
    C = np.asarray(state.C)

    Cex = np.where(fluid, exact(grid.pos, r0, z0, sigma, D, t_end, v_axial), 0.0)
    l2_ana = l2_weighted(C, Cex, fluid, vol)
    C_peak = float(C[fluid].max())
    mass1 = float((C * vol)[fluid].sum())

    assert l2_ana == pytest.approx(4.4491e-01, rel=2e-3)
    assert C_peak == pytest.approx(0.8381, rel=2e-3)
    assert abs(mass1 - mass0) / mass0 < 0.05  # ref mass_err=7.14e-03%

    uni_grid, uni_state = run_uniform_implicit(cfg, sigma, r0, z0, v_axial,
                                               5e-5, t_end)
    l2_uni = l2_vs_uniform(C, grid, uni_grid, uni_state.C)
    assert l2_uni < 0.10
    assert l2_uni == pytest.approx(8.1940e-05, rel=0.05)


def test_amr_advection_diffusion():
    """test_amr.cpp last test — goldens L2_ana=4.4286e-01,
    L2_vs_uniform=8.3000e-05, C_peak=0.8370."""
    D = 1.0e-9
    v_axial = 0.05
    cfg = make_amr_test_config(D, 0.0)
    grid, kit, state = amr_setup(cfg, v_axial)
    sigma, r0, z0, t_end = 20e-6, 0.0, -20e-6, 0.0005
    state = amr_gaussian(state, grid, sigma, r0, z0)

    fluid = grid.node_type == FLUID
    vol = grid.dx_local**2

    state = run_amr_implicit(state, kit, 5e-5, t_end)
    C = np.asarray(state.C)

    Cex = np.where(fluid, exact(grid.pos, r0, z0, sigma, D, t_end, v_axial), 0.0)
    l2_ana = l2_weighted(C, Cex, fluid, vol)
    C_peak = float(C[fluid].max())
    assert l2_ana == pytest.approx(4.4286e-01, rel=2e-3)
    assert C_peak == pytest.approx(0.8370, rel=2e-3)

    uni_grid, uni_state = run_uniform_implicit(cfg, sigma, r0, z0, v_axial,
                                               5e-5, t_end)
    l2_uni = l2_vs_uniform(C, grid, uni_grid, uni_state.C)
    assert l2_uni < 0.10
    assert l2_uni == pytest.approx(8.3000e-05, rel=0.05)
