"""Transport solver validation — ports of the reference's 4 self-asserting
tests (tests/test_implicit.cpp): pure diffusion, pure advection, combined
advection-diffusion (Gaussian pulses vs analytic solutions), and bi-material
interface dissolution.

GOLDEN PARITY NUMBERS: the reference binary was built (g++ -O2 -fopenmp
-DPD_DIM=2, Eigen 3.4) and run; the constants asserted below are its actual
printed outputs. Note the reference FAILS its own tests 2-3 thresholds
(implicit advection L2 = 0.75589 > its asserted 0.40 — the per-bond upwind
stabilization is strongly dissipative at Pe ~ 5e5). This rebuild reproduces
the reference's *actual* numerics to 4-5 significant digits, which is the
meaningful parity criterion; the reference's aspirational thresholds are
kept where its own binary passes them.
"""

import math
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import (FLUID, SOLID_MG, Config, build_grid,
                                     build_kit, initialize_state)
from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai
from pd_mg_pin_corrosion_tpu.ops.ard import (apply_phase_change, ard_step,
                                             compute_dt)


def make_test_config(D_liquid, Q_flow):
    """Pin-less test domain (tests/test_implicit.cpp:25-61)."""
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
    cfg.C_sat = 10.0         # don't trigger salt layer in tests
    cfg.alpha_art_diff = 0.0
    cfg.gb_width_cells = 0
    cfg.precip_fraction = 0.0
    cfg.precision = "f64"
    return cfg.compute_derived()


def setup(cfg, v_axial=0.0):
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    nt = grid.node_type
    movers = (nt == FLUID) | (nt == 3) | (nt == 4)  # FLUID|INLET|OUTLET
    vel = np.zeros(grid.shape + (2,))
    vel[..., 1] = np.where(movers, v_axial, 0.0)
    state = replace(state, vel=jnp.asarray(vel))
    return grid, kit, state


def gaussian_pulse(state, grid, sigma, r0, z0):
    fluid = grid.node_type == FLUID
    g = np.exp(
        -((grid.pos[..., 0] - r0) ** 2 + (grid.pos[..., 1] - z0) ** 2)
        / (2.0 * sigma * sigma)
    )
    return replace(state, C=jnp.asarray(np.where(fluid, g, 0.0)))


def gaussian_exact(grid, r0, z0, sigma, D, t, v_r=0.0, v_z=0.0):
    """Analytic spreading/translating Gaussian (test_implicit.cpp:117-126)."""
    sig2t = sigma**2 + 2.0 * D * t
    dr = grid.pos[..., 0] - (r0 + v_r * t)
    dz = grid.pos[..., 1] - (z0 + v_z * t)
    return (sigma**2 / sig2t) * np.exp(-(dr * dr + dz * dz) / (2.0 * sig2t))


def l2_error(C, C_ref, fluid):
    e = C[fluid] - C_ref[fluid]
    return math.sqrt(float(np.sum(e * e) / (np.sum(C_ref[fluid] ** 2) + 1e-30)))


def run_explicit(state, kit, dt_fixed, t_end):
    step = jax.jit(lambda s, dt: ard_step(s, kit, dt))
    t = 0.0
    while t < t_end:
        dt = min(dt_fixed, t_end - t)
        state = step(state, dt)
        t += dt
    return state


def run_implicit(state, kit, dt_fixed, t_end):
    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    step = jax.jit(lambda s, dt: ai.implicit_step(s, op, kit, dt)[0])
    t = 0.0
    while t < t_end - 1e-12:
        dt = min(dt_fixed, t_end - t)
        state = step(state, dt)
        t += dt
    return state


# ============================================================================
# Test 1: Pure PD diffusion (test_implicit.cpp:167-327)
# ============================================================================

def test_diffusion():
    D = 1.0e-9
    cfg = make_test_config(D, 0.0)
    grid, kit, state0 = setup(cfg)
    fluid = grid.node_type == FLUID

    sigma, r0, z0 = 30.0e-6, 0.0, 0.0
    t_end = 0.5
    state0 = gaussian_pulse(state0, grid, sigma, r0, z0)
    mass0 = float(np.asarray(state0.C)[fluid].sum())
    C_exact = gaussian_exact(grid, r0, z0, sigma, D, t_end)

    # explicit reference — golden: reference binary prints 1.6092e-02
    dt_exp = float(compute_dt(state0, kit))
    se = run_explicit(state0, kit, dt_exp, t_end)
    Ce = np.asarray(se.C)
    err_exp = l2_error(Ce, C_exact, fluid)
    assert err_exp < 0.05
    assert err_exp == pytest.approx(1.6092e-02, rel=2e-3)
    assert abs(Ce[fluid].sum() - mass0) / mass0 < 0.01

    # implicit at two dt values: accuracy + backward-Euler convergence rate
    # goldens: reference prints 1.9647e-02 (dt=0.01), 8.5236e-02 (dt=0.25)
    errs = {}
    for dt_impl in (0.01, 0.25):
        si = run_implicit(state0, kit, dt_impl, t_end)
        Ci = np.asarray(si.C)
        errs[dt_impl] = l2_error(Ci, C_exact, fluid)
        assert abs(Ci[fluid].sum() - mass0) / mass0 < 0.01
    assert errs[0.01] < 0.05, f"finest implicit L2 {errs[0.01]}"
    assert errs[0.01] == pytest.approx(1.9647e-02, rel=2e-3)
    assert errs[0.25] == pytest.approx(8.5236e-02, rel=2e-3)
    # O(dt) temporal convergence (reference conv_rate=0.66 at this pair)
    rate = math.log(errs[0.25] / errs[0.01]) / math.log(0.25 / 0.01)
    assert rate > 0.4


# ============================================================================
# Test 2: Pure PD advection (test_implicit.cpp:333-487)
# ============================================================================

def test_advection():
    D = 1.0e-12
    v_axial = 0.1
    cfg = make_test_config(D, 0.0)
    grid, kit, state0 = setup(cfg, v_axial)
    fluid = grid.node_type == FLUID

    sigma, r0, z0 = 40.0e-6, 0.0, -100.0e-6
    t_end = 0.001  # displacement 100 um = 20 dx
    state0 = gaussian_pulse(state0, grid, sigma, r0, z0)
    mass0 = float(np.asarray(state0.C)[fluid].sum())
    C_exact = gaussian_exact(grid, r0, z0, sigma, D, t_end, 0.0, v_axial)

    # explicit with advection-limited dt (test_implicit.cpp:364-366)
    # golden: reference binary prints 9.9685e-02
    dt_exp = min(0.5 * cfg.dx / v_axial, cfg.cfl_factor_corr * cfg.dx / v_axial)
    se = run_explicit(state0, kit, dt_exp, t_end)
    Ce = np.asarray(se.C)
    err_exp = l2_error(Ce, C_exact, fluid)
    assert err_exp == pytest.approx(9.9685e-02, rel=2e-3)
    assert abs(Ce[fluid].sum() - mass0) / mass0 < 0.01

    # implicit golden: reference binary prints 7.5589e-01, C_peak=0.8005
    # (the reference's own asserted threshold of 0.40 FAILS on its binary;
    # parity with its actual numerics is the gate here)
    si = run_implicit(state0, kit, 1e-4, t_end)
    Ci = np.asarray(si.C)
    err_impl = l2_error(Ci, C_exact, fluid)
    assert err_impl == pytest.approx(7.5589e-01, rel=2e-3)
    assert float(Ci[fluid].max()) == pytest.approx(0.8005, rel=2e-3)
    assert abs(Ci[fluid].sum() - mass0) / mass0 < 0.01


# ============================================================================
# Test 3: Combined advection-diffusion (test_implicit.cpp:493-673)
# ============================================================================

def test_advection_diffusion():
    D = 1.0e-9
    v_axial = 0.05
    cfg = make_test_config(D, 0.0)
    grid, kit, state0 = setup(cfg, v_axial)
    fluid = grid.node_type == FLUID

    sigma, r0, z0 = 40.0e-6, 0.0, -100.0e-6
    t_end = 0.002
    state0 = gaussian_pulse(state0, grid, sigma, r0, z0)
    mass0 = float(np.asarray(state0.C)[fluid].sum())
    C_exact = gaussian_exact(grid, r0, z0, sigma, D, t_end, 0.0, v_axial)

    # golden: reference binary prints explicit 9.9426e-02
    dt_exp = float(compute_dt(state0, kit))
    se = run_explicit(state0, kit, dt_exp, t_end)
    Ce = np.asarray(se.C)
    err_exp = l2_error(Ce, C_exact, fluid)
    assert err_exp == pytest.approx(9.9426e-02, rel=2e-3)
    assert abs(Ce[fluid].sum() - mass0) / mass0 < 0.01

    # implicit golden: reference prints 7.5642e-01, C_peak=0.8168 at dt=1e-4
    # (reference's own 0.20 threshold fails on its binary; see module docstring)
    si = run_implicit(state0, kit, 1e-4, t_end)
    Ci = np.asarray(si.C)
    err_impl = l2_error(Ci, C_exact, fluid)
    assert err_impl == pytest.approx(7.5642e-01, rel=2e-3)
    assert float(Ci[fluid].max()) == pytest.approx(0.8168, rel=2e-3)
    assert abs(Ci[fluid].sum() - mass0) / mass0 < 0.01


# ============================================================================
# Test 4: Solid-liquid interface dissolution (test_implicit.cpp:679-903)
# ============================================================================

def test_interface_dissolution():
    cfg = Config()
    cfg.dx = 5.0e-6
    cfg.m_ratio = 3
    cfg.R_wire = 0.0
    cfg.L_wire = 0.0
    cfg.R_tube = 25.0e-6
    cfg.L_upstream = 100.0e-6
    cfg.L_downstream = 100.0e-6
    cfg.c0 = 5.0
    cfg.Q_flow = 0.0
    cfg.D_liquid = 1.0e-9
    cfg.D_grain = 5.0e-11
    cfg.D_gb = 5.0e-9
    cfg.C_sat = 10.0
    cfg.alpha_art_diff = 0.0
    cfg.gb_width_cells = 0
    cfg.precip_fraction = 0.0
    cfg.precision = "f64"
    cfg.compute_derived()

    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)

    # hand-built half-domain: FLUID with z<0 becomes SOLID at C=1
    nt = np.asarray(state.node_type).copy()
    C = np.zeros(grid.shape)
    phase = np.ones(grid.shape, np.uint8)
    make_solid = (nt == FLUID) & (grid.pos[..., 1] < 0.0)
    nt[make_solid] = SOLID_MG
    C[make_solid] = cfg.C_solid_init
    phase[make_solid] = 0
    rho = np.asarray(state.rho).copy()
    rho[make_solid] = cfg.rho_m
    state = replace(
        state,
        node_type=jnp.asarray(nt),
        C=jnp.asarray(C),
        phase=jnp.asarray(phase),
        rho=jnp.asarray(rho),
        vel=jnp.zeros_like(state.vel),
    )
    # golden: reference counts 200 solid (199 converted FLUID + 1 node at the
    # origin that classifies SOLID_MG even at R_wire=0) and 199 fluid
    n_solid_total = int((nt == SOLID_MG).sum())
    assert n_solid_total in (200, 201)
    C_solid_init_sum = float(C[nt == SOLID_MG].sum())

    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    step = jax.jit(lambda s, dt: ai.implicit_step(s, op, kit, dt)[0])

    t = 0.0
    while t < 100.0 - 1e-9:
        state = step(state, 1.0)
        t += 1.0

    Cn = np.asarray(state.C)
    solid = np.asarray(state.node_type) == SOLID_MG
    fluid = np.asarray(state.node_type) == FLUID
    C_solid_min = float(Cn[solid].min())
    C_fluid_max = float(Cn[fluid].max())
    total_C = float(Cn[solid].sum() + Cn[fluid].sum())

    # 1. solid surface C decreased
    assert C_solid_min < cfg.C_solid_init - 1e-10
    # 2. fluid C increased near the interface
    assert C_fluid_max > 1e-10
    # 3. total C must not increase (absorbing BCs may remove mass);
    #    golden: reference prints total 140.1633 of initial 200.0 at t=100s
    assert total_C <= C_solid_init_sum * 1.01
    assert total_C == pytest.approx(140.1633, rel=5e-3)

    # 4. run longer; dissolution mechanism fires
    #    golden: reference dissolves 60 nodes by t=10000s, leaving 141 solid
    while t < 10000.0 - 1e-9:
        state = step(state, 10.0)
        t += 10.0
    state2, n_dissolved = apply_phase_change(state, kit)
    n_dissolved = int(n_dissolved)
    assert n_dissolved == 60
    nt2 = np.asarray(state2.node_type)
    assert int((nt2 == SOLID_MG).sum()) == n_solid_total - n_dissolved


def test_micro_d_factor_accel_extension():
    """corrosion_accel_l (EXTENSION, not in the reference): exposure-driven
    amplification 10^(+V_L/l) composing with the Hermann decay 10^(-V_L/l).
    Defaults (both 0) must leave every reference workload untouched."""
    from pd_mg_pin_corrosion_tpu.ops.ard import micro_d_factor

    cfg = make_test_config(1e-9, 0.0)
    assert float(micro_d_factor(cfg, 0.37, jnp.float64)) == 1.0

    cfg.corrosion_decay_l = 0.5
    assert float(micro_d_factor(cfg, 0.3, jnp.float64)) == pytest.approx(
        10.0 ** (-0.3 / 0.5), rel=1e-12)

    cfg.corrosion_accel_l = 0.944
    assert float(micro_d_factor(cfg, 0.3, jnp.float64)) == pytest.approx(
        10.0 ** (-0.3 / 0.5) * 10.0 ** (0.3 / 0.944), rel=1e-12)

    cfg.corrosion_decay_l = 0.0
    assert float(micro_d_factor(cfg, 0.3, jnp.float64)) == pytest.approx(
        10.0 ** (0.3 / 0.944), rel=1e-12)


def test_accel_scales_interface_weights():
    """With accel set, the implicit operator's interface bond weights scale
    by exactly 10^(V_L/l) (solid micro-D << D_liquid makes the harmonic
    mean ~2*D_s, i.e. linear in the factor); LL bonds are unaffected."""
    cfg = make_test_config(1e-9, 0.0)
    cfg.R_wire = 40.0e-6
    cfg.L_wire = 200.0e-6
    cfg.D_grain = 1e-16
    cfg.D_gb = 1e-14
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)

    op0 = ai.assemble(state, kit, 0.25)  # accel disabled: factor 1
    cfg.corrosion_accel_l = 1.0
    op1 = ai.assemble(state, kit, 0.25)  # factor 10^0.25

    W0 = np.asarray(op0.W)
    W1 = np.asarray(op1.W)
    changed = ~np.isclose(W1, W0, rtol=1e-13, atol=0.0)
    nz = W0 != 0.0
    assert changed.any(), "accel must change interface weights"
    ratio = W1[changed & nz] / W0[changed & nz]
    # harmonic mean 2*DL*Ds*f/(DL + Ds*f) ~= 2*Ds*f to O(Ds/DL) ~ 1e-5
    assert np.allclose(ratio, 10.0 ** 0.25, rtol=1e-4)
