"""Block-structured AMR backend (amr_blocks.py) vs the gather backend and
the reference goldens.

The block backend must reproduce the gather backend's node sets and IDW
tables exactly (same lattices, zones, bands — grid.cpp:349-654) and its
physics to summation-order roundoff: within a level all bond geometry is
identical (uniform stencil == per-node cell-list search on a regular
lattice), so any disagreement beyond ~1e-12 in f64 is a bug.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import amr_blocks as ab
from pd_mg_pin_corrosion_tpu import unstructured as u
from pd_mg_pin_corrosion_tpu.amr import build_amr_grid
from pd_mg_pin_corrosion_tpu.fields import initialize_state
from pd_mg_pin_corrosion_tpu.grid import FICTITIOUS, FLUID, OUTSIDE

from test_amr import make_amr_test_config, exact, l2_weighted


def _mapping(bgrid: ab.ABGrid, ggrid):
    """Index map block-layout -> gather-layout by (position, level)."""
    key = {}
    for i in range(ggrid.N_total):
        k = (round(ggrid.pos[i, 0] * 1e9), round(ggrid.pos[i, 1] * 1e9),
             int(ggrid.grid_level[i]))
        key[k] = i
    act = np.flatnonzero(bgrid.node_type != OUTSIDE)
    gmap = np.empty(act.size, np.int64)
    for r, n in enumerate(act):
        k = (round(bgrid.pos[n, 0] * 1e9), round(bgrid.pos[n, 1] * 1e9),
             int(bgrid.grid_level[n]))
        gmap[r] = key[k]
    return act, gmap


def _block_setup(cfg, v_axial=0.0):
    grid = ab.build_amr_block_grid(cfg)
    kit = ab.build_bkit(grid, cfg)
    state = ab.initialize_state_b(grid, cfg, dtype=jnp.float64)
    nt = grid.node_type
    movers = (nt == FLUID) | (nt == 3) | (nt == 4) | (nt == FICTITIOUS)
    vel = np.zeros((grid.N_total, 2))
    vel[:, 1] = np.where(movers, v_axial, 0.0)
    return grid, kit, replace(state, vel=jnp.asarray(vel))


def test_block_grid_matches_gather_and_goldens():
    cfg = make_amr_test_config(1.0e-9, 1.667e-9)
    bgrid = ab.build_amr_block_grid(cfg)
    ggrid = build_amr_grid(cfg)

    nt = bgrid.node_type
    lvl = bgrid.grid_level
    active = nt != OUTSIDE
    n_fict = int((nt == FICTITIOUS).sum())
    n_fine = int((active & (nt != FICTITIOUS) & (lvl == 0)).sum())
    n_coarse = int((active & (nt != FICTITIOUS) & (lvl == 1)).sum())

    # reference goldens (test_amr.cpp, see tests/test_amr.py header)
    assert n_fine == 1600
    assert n_coarse == 2749
    assert n_fict == 948
    assert int((nt == FLUID).sum()) == 3600

    # node-for-node equality with the gather backend
    act, gmap = _mapping(bgrid, ggrid)
    assert act.size == ggrid.N_total  # same active sets
    np.testing.assert_array_equal(nt[act], ggrid.node_type[gmap])

    # IDW tables: same golden Poiseuille reproduction error
    v = 1.5 * cfg.U_in * (1.0 - np.minimum(
        bgrid.pos[:, 0] ** 2 / cfg.R_tube**2, 1.0))
    vi = (v[bgrid.fict_src] * bgrid.fict_w).sum(axis=1)
    ve = v[bgrid.fict_idx]
    mask = ve > 1e-6
    max_err = float((np.abs(vi[mask] - ve[mask]) / ve[mask]).max())
    assert max_err == pytest.approx(4.249e-02, rel=1e-3)
    assert np.allclose(bgrid.fict_w.sum(axis=1), 1.0)


def test_block_flow_step_matches_gather():
    """A full BC + NS-step + fictitious-refresh iteration must agree with
    the gather backend to f64 summation roundoff on every active node."""
    cfg = make_amr_test_config(1.0e-9, 1.667e-9)
    bgrid = ab.build_amr_block_grid(cfg)
    bkit = ab.build_bkit(bgrid, cfg)
    bstate = ab.initialize_state_b(bgrid, cfg, dtype=jnp.float64)
    ggrid = build_amr_grid(cfg)
    gkit = u.build_ukit(ggrid, cfg)
    gstate = initialize_state(ggrid, cfg, dtype=jnp.float64)

    act, gmap = _mapping(bgrid, ggrid)
    dtb = float(ab.compute_dt_ns(bstate, bkit))
    dtg = float(u.compute_dt_ns(gstate, gkit))
    assert dtb == pytest.approx(dtg, rel=1e-12)

    def bstep(s):
        from pd_mg_pin_corrosion_tpu import dispatch
        ops = dispatch.ops_for(bkit)
        s = ops.apply_inlet_bc(s, bkit)
        s = ops.apply_outlet_bc(s, bkit)
        s = ops.apply_wall_bc(s, bkit)
        s = ops.apply_solid_surface_bc(s, bkit)
        s = ops.ns_step(s, bkit, dtb)
        s = ops.apply_wall_bc(s, bkit)
        return ops.update_fictitious(s, bkit)

    def gstep(s):
        s = u.apply_inlet_bc(s, gkit)
        s = u.apply_outlet_bc(s, gkit)
        s = u.apply_wall_bc(s, gkit)
        s = u.apply_solid_surface_bc(s, gkit)
        s = u.ns_step(s, gkit, dtg)
        s = u.apply_wall_bc(s, gkit)
        return u.update_fictitious(s, gkit)

    bs, gs = bstate, gstate
    jb = jax.jit(bstep)
    jg = jax.jit(gstep)
    for _ in range(10):
        bs = jb(bs)
        gs = jg(gs)

    rho_b = np.asarray(bs.rho)[act]
    rho_g = np.asarray(gs.rho)[gmap]
    vel_b = np.asarray(bs.vel)[act]
    vel_g = np.asarray(gs.vel)[gmap]
    # identical bond sets; different summation order -> roundoff-level only.
    # (The wall-mirror source can differ on a handful of staircase nodes —
    # lattice-rounded vs nearest-in-neighborhood — so compare non-wall.)
    nonwall = bgrid.node_type[act] != 2
    np.testing.assert_allclose(rho_b[nonwall], rho_g[nonwall],
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(vel_b[nonwall], vel_g[nonwall],
                               rtol=1e-9, atol=1e-12)


def test_block_diffusion_golden():
    """Reference AMR diffusion goldens through the BLOCK backend
    (test_amr.cpp:427-526): L2_ana=2.1234e-02, mass drift 0.175 %."""
    D = 1.0e-9
    cfg = make_amr_test_config(D, 0.0)
    bgrid, bkit, state = _block_setup(cfg)
    sigma, r0, z0, t_end = 30e-6, 0.0, 0.0, 0.5

    nt = bgrid.node_type
    mask = (nt == FLUID) | (nt == FICTITIOUS)
    g = np.exp(-((bgrid.pos[:, 0] - r0) ** 2 + (bgrid.pos[:, 1] - z0) ** 2)
               / (2.0 * sigma**2))
    state = replace(state, C=jnp.asarray(np.where(mask, g, 0.0)))

    fluid = nt == FLUID
    vol = bgrid.dx_local**2
    mass0 = float((np.asarray(state.C) * vol)[fluid].sum())

    op = jax.jit(lambda s: ab.assemble(s, bkit))(state)
    step = jax.jit(lambda s, dt: ab.update_fictitious(
        ab.implicit_step(s, op, bkit, dt)[0], bkit))
    t = 0.0
    while t < t_end - 1e-12:
        dt = min(0.01, t_end - t)
        state = step(state, dt)
        t += dt

    C = np.asarray(state.C)
    Cex = np.where(fluid, exact(bgrid.pos, r0, z0, sigma, D, t_end), 0.0)
    l2_ana = l2_weighted(C, Cex, fluid, vol)
    mass1 = float((C * vol)[fluid].sum())
    mass_change = abs(mass1 - mass0) / mass0 * 100.0

    assert l2_ana == pytest.approx(2.1234e-02, rel=2e-3)
    assert mass_change == pytest.approx(0.175, rel=0.05)


def test_block_advection_diffusion_golden():
    """Reference AMR advection-diffusion goldens through the BLOCK backend:
    L2_ana=4.4286e-01, C_peak=0.8370."""
    D = 1.0e-9
    v_axial = 0.05
    cfg = make_amr_test_config(D, 0.0)
    bgrid, bkit, state = _block_setup(cfg, v_axial)
    sigma, r0, z0, t_end = 20e-6, 0.0, -20e-6, 0.0005

    nt = bgrid.node_type
    mask = (nt == FLUID) | (nt == FICTITIOUS)
    g = np.exp(-((bgrid.pos[:, 0] - r0) ** 2 + (bgrid.pos[:, 1] - z0) ** 2)
               / (2.0 * sigma**2))
    state = replace(state, C=jnp.asarray(np.where(mask, g, 0.0)))

    fluid = nt == FLUID
    vol = bgrid.dx_local**2

    op = jax.jit(lambda s: ab.assemble(s, bkit))(state)
    step = jax.jit(lambda s, dt: ab.update_fictitious(
        ab.implicit_step(s, op, bkit, dt)[0], bkit))
    t = 0.0
    while t < t_end - 1e-12:
        dt = min(5e-5, t_end - t)
        state = step(state, dt)
        t += dt

    C = np.asarray(state.C)
    Cex = np.where(fluid, exact(bgrid.pos, r0, z0, sigma, D, t_end, v_axial),
                   0.0)
    l2_ana = l2_weighted(C, Cex, fluid, vol)
    C_peak = float(C[fluid].max())
    assert l2_ana == pytest.approx(4.4286e-01, rel=2e-3)
    assert C_peak == pytest.approx(0.8370, rel=2e-3)


@pytest.mark.slow
def test_block_warm_start_same_answer():
    """cfg.flow_warm_start on the block-AMR backend is correctness-neutral:
    the warm-started steady solve converges by the UNCHANGED eps gate to
    the same flow field as the cold start (same contract as the uniform
    path's test_flow.py::test_coarse_warm_start_same_answer)."""
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.solvers import coarse_warm_start, solve_steady

    # scaled-down params_amr.cfg (same wire/ratio/buffer, coarser dx and a
    # shorter, narrower cell): cold solve converges in ~26k iters; probed
    # 2026-08-20 — cold 25,700 iters / warm 11,800 coarse + 17,400 fine,
    # fields rel-L2 2.1e-2
    cfg = Config()
    cfg.dx = 5.0e-6
    cfg.R_wire = 40e-6
    cfg.L_wire = 100e-6
    cfg.R_tube = 150e-6
    cfg.L_upstream = 120e-6
    cfg.L_downstream = 120e-6
    cfg.c0 = 0.5
    cfg.cfl_factor = 0.05
    cfg.flow_max_iters = 60000
    cfg.use_amr = 1
    cfg.amr_ratio = 3
    cfg.amr_buffer = 50.0e-6
    cfg.precision = "f64"
    cfg.compute_derived()

    grid = ab.build_amr_block_grid(cfg)
    kit = ab.build_bkit(grid, cfg)
    state0 = ab.initialize_state_b(grid, cfg, dtype=jnp.float64)

    st_cold, it_cold, eps_c, conv_c, div_c = solve_steady(state0, kit)
    assert bool(conv_c) and not bool(div_c)

    cfg.flow_warm_start = 3
    state_w, coarse_iters = coarse_warm_start(state0, grid, kit, cfg)
    assert coarse_iters > 0  # coarse uniform solve actually ran
    st_warm, it_warm, eps_w, conv_w, div_w = solve_steady(state_w, kit)
    assert bool(conv_w) and not bool(div_w)

    v_c = np.asarray(st_cold.vel)
    v_w = np.asarray(st_warm.vel)
    fluid = grid.node_type == FLUID
    num = np.sqrt(((v_c - v_w)[fluid] ** 2).sum())
    den = np.sqrt((v_c[fluid] ** 2).sum())
    assert num / den < 0.05, f"warm/cold fields differ: {num / den:.3e}"
