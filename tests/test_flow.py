"""PD-NS flow solver tests: EOS, dt, single step, steady Poiseuille.

Mirrors the reference's in-path Poiseuille validation (src/pd_ns.cpp:341-368)
and unit-checks the bond sums against a tiny-N numpy oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import (FLUID, Config, build_grid, build_kit,
                                     initialize_state)
from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt, ns_step, tait_pressure
from pd_mg_pin_corrosion_tpu.solvers import poiseuille_l2_error, solve_steady


def poiseuille_cfg():
    cfg = Config()
    cfg.R_wire = 0.0
    cfg.L_wire = 0.0
    cfg.R_tube = 100e-6
    cfg.L_upstream = 150e-6
    cfg.L_downstream = 150e-6
    cfg.c0 = 5.0
    cfg.cfl_factor = 0.25
    cfg.flow_conv_tol = 1e-6
    cfg.flow_max_iters = 30000
    cfg.precision = "f64"
    return cfg.compute_derived()


def test_tait_eos():
    cfg = poiseuille_cfg()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    B = cfg.rho_f * cfg.c0**2 / cfg.gamma_eos
    rho = jnp.asarray([cfg.rho_f, 1.01 * cfg.rho_f, 0.1 * cfg.rho_f, 3.0 * cfg.rho_f])
    p = np.asarray(tait_pressure(rho, kit))
    assert p[0] == pytest.approx(0.0, abs=1e-12)
    assert p[1] == pytest.approx(B * (1.01**cfg.gamma_eos - 1.0), rel=1e-12)
    # clamped at ratio in [0.5, 2]
    assert p[2] == pytest.approx(B * (0.5**cfg.gamma_eos - 1.0), rel=1e-12)
    assert p[3] == pytest.approx(B * (2.0**cfg.gamma_eos - 1.0), rel=1e-12)


def test_compute_dt_matches_formula():
    cfg = poiseuille_cfg()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    dt = float(compute_dt(state, kit))
    v_max = 1.5 * cfg.U_in  # Poiseuille warm start peak
    dt_cfl = cfg.dx / (cfg.c0 + v_max + 1e-30)
    nu = cfg.mu_f / cfg.rho_f
    dt_visc = 0.25 * cfg.dx**2 / (nu + 1e-30)
    D_v = cfg.eta_density * cfg.c0 * cfg.delta
    dt_dens = 0.25 * cfg.dx**2 / (D_v + 1e-30)
    expected = cfg.cfl_factor * min(dt_cfl, dt_visc, dt_dens)
    assert dt == pytest.approx(expected, rel=1e-12)


def test_ns_step_against_numpy_oracle():
    """One NS step vs a direct per-node CSR-style numpy implementation."""
    cfg = poiseuille_cfg()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    dt = 1e-7

    out = ns_step(state, kit, dt)

    # --- numpy oracle (follows pd_ns.cpp:78-180 literally) ---
    nt = grid.node_type.ravel()
    shape = grid.shape
    N = nt.size
    rho = np.asarray(state.rho).ravel()
    vel = np.asarray(state.vel).reshape(N, 2)
    B = cfg.rho_f * cfg.c0**2 / cfg.gamma_eos
    p = B * (np.clip(rho / cfg.rho_f, 0.5, 2.0) ** cfg.gamma_eos - 1.0)

    PI = np.pi
    V_H = PI * cfg.delta**2
    beta_lap = 4.0 / (PI * cfg.delta**2)
    alpha = 2.0
    D_v = cfg.eta_density * cfg.c0 * cfg.delta

    st = grid.stencil
    rho_new = rho.copy()
    vel_new = vel.copy()
    rng = np.random.default_rng(0)
    fluid_nodes = np.flatnonzero(nt == FLUID)
    sample = rng.choice(fluid_nodes, size=50, replace=False)

    for n in sample:
        j0, i0 = np.unravel_index(n, shape)
        mass_conv = mass_diff = 0.0
        mom_conv = np.zeros(2)
        mom_pres = np.zeros(2)
        mom_visc = np.zeros(2)
        for s in range(st.size):
            dj, di = st.offsets[s]
            jj, ii = j0 + dj, i0 + di
            if not (0 <= jj < shape[0] and 0 <= ii < shape[1]):
                continue
            m = jj * shape[1] + ii
            if nt[m] == 5:  # OUTSIDE
                continue
            xi = st.dist[s]
            e = st.evec[s]
            V_j = st.vol[s]
            mass_conv += np.dot(rho[m] * vel[m] - rho[n] * vel[n], e) / xi * V_j
            mass_diff += beta_lap * D_v * (rho[m] - rho[n]) / xi**2 * V_j
            for d in range(2):
                conv_d = sum(
                    (rho[m] * vel[m, d] * vel[m, dp] - rho[n] * vel[n, d] * vel[n, dp]) * e[dp]
                    for dp in range(2)
                )
                mom_conv[d] += conv_d / xi * V_j
                mom_pres[d] += (p[m] - p[n]) * e[d] / xi * V_j
                mom_visc[d] += (vel[m, d] - vel[n, d]) / xi**2 * V_j
        rn = rho[n] + dt * (-(alpha / V_H) * mass_conv + mass_diff)
        rho_new[n] = np.clip(rn, 0.5 * cfg.rho_f, 2.0 * cfg.rho_f)
        vel_new[n] = vel[n] + dt / rho[n] * (
            -(alpha / V_H) * (mom_conv + mom_pres) + cfg.mu_f * beta_lap * mom_visc
        )

    out_rho = np.asarray(out.rho).ravel()
    out_vel = np.asarray(out.vel).reshape(N, 2)
    np.testing.assert_allclose(out_rho[sample], rho_new[sample], rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(out_vel[sample], vel_new[sample], rtol=1e-12, atol=1e-18)


def wire_cfg():
    """Small 2D flow-cell WITH a wire, so the initial solve has a wake to
    develop (the warm start's target workload)."""
    cfg = Config()
    cfg.dx = 2.5e-6
    cfg.R_wire = 15e-6
    cfg.L_wire = 40e-6
    cfg.R_tube = 60e-6
    cfg.L_upstream = 60e-6
    cfg.L_downstream = 60e-6
    cfg.c0 = 5.0
    cfg.flow_max_iters = 30000
    cfg.precision = "f64"
    return cfg.compute_derived()


@pytest.mark.slow
def test_coarse_warm_start_same_answer():
    """cfg.flow_warm_start is a CORRECTNESS-neutral knob: the warm-started
    fine solve must converge by the UNCHANGED eps gate to the same flow
    field as the cold start. (Iteration-count benefit is geometry-dependent
    — on this small 2D cell the acoustic transient re-excited by the
    interpolated field cancels the head start; see the flow_warm_start
    config comment for where it pays.)"""
    from pd_mg_pin_corrosion_tpu.solvers import coarse_warm_start

    cfg = wire_cfg()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state0 = initialize_state(grid, cfg, dtype=jnp.float64)

    st_cold, it_cold, eps_c, conv_c, div_c = solve_steady(state0, kit)
    assert bool(conv_c) and not bool(div_c)

    cfg.flow_warm_start = 2
    state_w, coarse_iters = coarse_warm_start(state0, grid, kit, cfg)
    assert coarse_iters > 0  # coarse solve actually ran
    st_warm, it_warm, eps_w, conv_w, div_w = solve_steady(state_w, kit)
    assert bool(conv_w) and not bool(div_w)

    # same converged answer (both passed the same eps < flow_conv_tol gate)
    v_c = np.asarray(st_cold.vel)
    v_w = np.asarray(st_warm.vel)
    fluid = grid.node_type == FLUID
    num = np.sqrt(((v_c - v_w)[fluid] ** 2).sum())
    den = np.sqrt((v_c[fluid] ** 2).sum())
    assert num / den < 0.05, f"warm/cold fields differ: {num / den:.3e}"


@pytest.mark.slow
def test_steady_poiseuille():
    """End-to-end: flow converges and matches the analytic profile."""
    cfg = poiseuille_cfg()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    st, iters, eps, conv, div = solve_steady(state, kit)
    assert bool(conv)
    assert not bool(div)
    err = poiseuille_l2_error(st, grid, cfg)
    assert err < 0.05, f"Poiseuille L2 error too large: {err}"
    # flow magnitude sane: within 10% of analytic peak
    vmax = float(jnp.max(jnp.linalg.norm(st.vel, axis=-1)))
    assert abs(vmax - 1.5 * cfg.U_in) / (1.5 * cfg.U_in) < 0.1
