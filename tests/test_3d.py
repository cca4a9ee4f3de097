"""3D (dim=3) path tests: grid construction, stencil, a bounded short flow
run, and transport machinery.

3D stability note (documented reference-faithful behavior): the reference's
own PD_DIM=3 build diverges at its default eta_density=0.1 (an axial
acoustic mode grows; verified by building and running the reference with
-DPD_DIM=3 — v_max blows up at iter ~1200 with the same trajectory this
rebuild produces). Stronger delta-SPH density diffusion (eta_density ~ 1.0)
keeps 3D bounded, which is what config/params_3d.cfg ships with.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import (FLUID, SOLID_MG, Config, build_grid,
                                     build_kit, initialize_state)
from pd_mg_pin_corrosion_tpu import boundary as bc
from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai
from pd_mg_pin_corrosion_tpu.ops.ard import apply_phase_change, ard_step
from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt, ns_step


def cfg3d():
    cfg = Config()
    cfg.dim = 3
    cfg.dx = 5e-6
    cfg.R_wire = 15e-6
    cfg.L_wire = 60e-6
    cfg.R_tube = 50e-6
    cfg.L_upstream = 40e-6
    cfg.L_downstream = 40e-6
    cfg.Q_flow = 1.667e-10
    cfg.eta_density = 1.0
    cfg.D_grain = 5e-11
    cfg.D_gb = 5e-9
    cfg.precision = "f64"
    return cfg.compute_derived()


def test_3d_grid():
    cfg = cfg3d()
    grid = build_grid(cfg)
    assert grid.dim == 3
    assert grid.shape == (grid.Nz, grid.Ny, grid.Nx)
    assert grid.Ny == grid.Nx  # square cross-section (grid.cpp:59)
    counts = grid.type_counts()
    assert counts["SOLID_MG"] > 0
    assert counts["OUTSIDE"] > 0  # corners outside the circular wall annulus

    # solid confined to the wire cylinder
    nt = grid.node_type
    solid = nt == SOLID_MG
    r = np.sqrt(grid.pos[..., 0] ** 2 + grid.pos[..., 1] ** 2)
    assert np.all(r[solid] <= cfg.R_wire + 1e-12)
    assert np.all(grid.pos[..., 2][solid] >= -1e-12)

    # 3D stencil size: integer lattice points with norm <= m + 1/2
    count = sum(
        1
        for dk in range(-4, 5)
        for dj in range(-4, 5)
        for di in range(-4, 5)
        if (di, dj, dk) != (0, 0, 0) and (di**2 + dj**2 + dk**2) ** 0.5 <= 3.5
    )
    assert grid.stencil.size == count


def test_3d_wall_mirror_matches_gather_oracle():
    """The z-invariant-column + fallback mirror path (boundary._wall_mirror,
    3D branch) must equal the direct flat-gather of grid.mirror_idx."""
    cfg = cfg3d()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)

    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.uniform(900.0, 1100.0, grid.shape))
    vel = jnp.asarray(rng.normal(size=grid.shape + (3,)))
    state = initialize_state(grid, cfg, dtype=jnp.float64)

    rho_m, vel_m = bc._wall_mirror(state, kit, rho, vel)

    # oracle: per-node flat gather from the host mirror table
    mi = grid.mirror_idx.ravel()
    nt = grid.node_type.ravel()
    rho_o = np.asarray(rho).ravel().copy()
    vel_o = np.asarray(vel).reshape(-1, 3).copy()
    has = mi >= 0
    rho_o[has] = np.asarray(rho).ravel()[mi[has]]
    vel_o[has] = -np.asarray(vel).reshape(-1, 3)[mi[has]]
    none = (nt == 2) & ~has  # WALL without source
    rho_o[none] = cfg.rho_f
    vel_o[none] = 0.0

    np.testing.assert_array_equal(np.asarray(rho_m).ravel(), rho_o)
    np.testing.assert_array_equal(np.asarray(vel_m).reshape(-1, 3), vel_o)
    # the fallback list must stay small relative to the primary columns
    assert kit.wm_fb_dst.size < 0.2 * (kit.wm_dst_cols.size * grid.Nz + 1)


def test_3d_wall_mirror_padded_grid_oracle():
    """Same oracle on an axially PADDED grid (pad_grid_axial, the
    multi-device layout): the padded OUTSIDE z-planes must not demote wall
    columns out of the mirror tables (round-2 ADVICE, high: the previous
    all-planes invariance check routed every wall node to the never-applied
    fallback list, silently disabling the 3D wall BC exactly in the
    multi-chip configuration). OUTSIDE nodes are excluded from the
    comparison — nothing ever reads them."""
    from pd_mg_pin_corrosion_tpu.grid import OUTSIDE, pad_grid_axial

    cfg = cfg3d()
    grid = pad_grid_axial(build_grid(cfg), 8)
    kit = build_kit(grid, cfg)

    # the padded grid must keep a real primary-column mirror table
    assert kit.wm_dst_cols.size > 0, \
        "padded grid produced zero primary mirror columns"
    # and any fallback nodes there are will actually be applied (the 3D
    # branch now consumes wm_fb_*), so no silent no-op either way

    rng = np.random.default_rng(1)
    rho = jnp.asarray(rng.uniform(900.0, 1100.0, grid.shape))
    vel = jnp.asarray(rng.normal(size=grid.shape + (3,)))
    state = initialize_state(grid, cfg, dtype=jnp.float64)

    rho_m, vel_m = bc._wall_mirror(state, kit, rho, vel)

    mi = grid.mirror_idx.ravel()
    nt = grid.node_type.ravel()
    rho_o = np.asarray(rho).ravel().copy()
    vel_o = np.asarray(vel).reshape(-1, 3).copy()
    has = mi >= 0
    rho_o[has] = np.asarray(rho).ravel()[mi[has]]
    vel_o[has] = -np.asarray(vel).reshape(-1, 3)[mi[has]]
    none = (nt == 2) & ~has
    rho_o[none] = cfg.rho_f
    vel_o[none] = 0.0

    live = nt != OUTSIDE
    np.testing.assert_array_equal(np.asarray(rho_m).ravel()[live], rho_o[live])
    np.testing.assert_array_equal(
        np.asarray(vel_m).reshape(-1, 3)[live], vel_o[live])
    # every wall node with a mirror actually changed (BC is not a no-op)
    wall_has = (nt == 2) & has
    assert wall_has.any()
    assert not np.allclose(np.asarray(rho_m).ravel()[wall_has],
                           np.asarray(rho).ravel()[wall_has])


def test_3d_subcell_mirror_oracle():
    """wall_mirror_subcell=1: wall values = bilinear interpolation of the
    reflected point (rho symmetric, vel antisymmetric), verified against a
    direct numpy oracle on the primary columns."""
    cfg = cfg3d()
    cfg.wall_mirror_subcell = 1
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)

    # every primary column's weights sum to 1 and are non-negative
    G = np.asarray(kit.wm_G)
    P = int(kit.wm_dst_cols.size)
    sums = G[:, :P].sum(axis=0)
    assert np.all(sums > 0.999) and np.all(sums < 1.001)
    assert np.all(G >= 0)
    # most columns are genuinely interpolated (not one-hot)
    n_weighted = int(((G[:, :P] > 0).sum(axis=0) > 1).sum())
    assert n_weighted > 0.5 * P

    rng = np.random.default_rng(2)
    rho = jnp.asarray(rng.uniform(900.0, 1100.0, grid.shape))
    vel = jnp.asarray(rng.normal(size=grid.shape + (3,)))
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    rho_m, vel_m = bc._wall_mirror(state, kit, rho, vel)

    # oracle on a few random primary columns at a few z-planes
    Nz, Ny, Nx = grid.shape
    dst = np.asarray(kit.wm_dst_cols)
    r2 = np.asarray(rho).reshape(Nz, Ny * Nx)
    v2 = np.asarray(vel).reshape(Nz, Ny * Nx, 3)
    for p in rng.choice(P, size=min(40, P), replace=False):
        q = int(dst[p])
        w = G[:, p]
        nz_cols = np.flatnonzero(w)
        for k in (0, Nz // 2, Nz - 1):
            exp_rho = (r2[k, nz_cols] * w[nz_cols]).sum()
            exp_vel = -(v2[k, nz_cols] * w[nz_cols, None]).sum(0)
            got_rho = np.asarray(rho_m).reshape(Nz, Ny * Nx)[k, q]
            got_vel = np.asarray(vel_m).reshape(Nz, Ny * Nx, 3)[k, q]
            np.testing.assert_allclose(got_rho, exp_rho, rtol=1e-12)
            np.testing.assert_allclose(got_vel, exp_vel, rtol=1e-12,
                                       atol=1e-12)


@pytest.mark.slow
def test_3d_flow_bounded():
    """Short 3D flow run stays bounded with eta_density=1.0."""
    cfg = cfg3d()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    dt = compute_dt(state, kit)

    @jax.jit
    def one(s):
        s = bc.apply_inlet_bc(s, kit)
        s = bc.apply_outlet_bc(s, kit)
        s = bc.apply_wall_bc(s, kit)
        s = bc.apply_solid_surface_bc(s, kit)
        sn = ns_step(s, kit, dt)
        return bc.apply_wall_bc(sn, kit)

    s = state
    for _ in range(400):
        s = one(s)
    fluid = np.asarray(s.node_type) == FLUID
    vm = np.asarray(jnp.linalg.norm(s.vel, axis=-1))[fluid]
    rho = np.asarray(s.rho)[fluid]
    assert np.isfinite(vm).all()
    assert vm.max() < 10.0 * 2.0 * cfg.U_in
    assert 0.9 * cfg.rho_f < rho.min() and rho.max() < 1.1 * cfg.rho_f


@pytest.mark.slow
def test_3d_transport_and_phase_change():
    cfg = cfg3d()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    state = replace(state, vel=jnp.zeros_like(state.vel))

    # explicit step conserves shape/finiteness
    s1 = jax.jit(lambda s: ard_step(s, kit, 1e-4))(state)
    assert np.isfinite(np.asarray(s1.C)).all()

    # implicit GMRES solve converges in 3D
    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    s2, res = jax.jit(lambda s: ai.implicit_step(s, op, kit, 1.0))(state)
    assert float(res) < 1e-9
    # solid surface C decreased, fluid picked mass up
    nt = np.asarray(state.node_type)
    assert float(np.asarray(s2.C)[nt == SOLID_MG].min()) < 1.0
    assert float(np.asarray(s2.C)[nt == FLUID].max()) > 0.0

    # long-run: dissolution mechanism fires, or (reference-test fallback,
    # test_implicit.cpp:876-895) solid C trends clearly toward threshold
    step = jax.jit(lambda s: ai.implicit_step(s, op, kit, 30.0)[0])
    s3 = s2
    for _ in range(40):
        s3 = step(s3)
    s4, n = apply_phase_change(s3, kit)
    if int(n) == 0:
        Cmin = float(np.asarray(s3.C)[nt == SOLID_MG].min())
        assert Cmin < 0.9, "solid C barely changed — interface bonds inactive?"


def test_scan_paths_match_unrolled():
    """The 3D scan-over-stencil forms must equal the Python-unrolled forms
    (which 2D uses and the golden suites validate)."""
    from unittest import mock

    from pd_mg_pin_corrosion_tpu import boundary as bc
    from pd_mg_pin_corrosion_tpu.kit import Kit
    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai
    from pd_mg_pin_corrosion_tpu.ops.ard import compute_salt_blocked

    cfg = cfg3d()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    state = replace(
        state,
        C=jnp.asarray(rng.uniform(0.0, 1.0, grid.shape)),
        vel=state.vel + 0.01 * jnp.asarray(rng.normal(size=grid.shape + (3,))))

    def run_all(k):
        out = {}
        out["ns"] = ns_step(state, k, 1e-8)
        out["ard"] = ard_step(state, k, 1e-6, 0.1)
        out["salt"] = compute_salt_blocked(state, k)
        op = ai.assemble(state, k, 0.1)
        out["W"] = op.W
        out["diag"] = op.diag
        out["mv"] = ai.matvec_M(op, k, state.C)
        out["wallC"] = bc.apply_wall_concentration_bc(state, k).C
        out["smooth"] = bc.smooth_boundary_concentration(state, k).C
        return out

    assert kit.use_scan
    scan = run_all(kit)
    with mock.patch.object(Kit, "use_scan", property(lambda self: False)):
        assert not kit.use_scan
        ref = run_all(kit)

    for key in ref:
        a, b = scan[key], ref[key]
        if key in ("ns", "ard"):
            np.testing.assert_allclose(np.asarray(a.rho), np.asarray(b.rho),
                                       rtol=1e-12)
            np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel),
                                       rtol=1e-12, atol=1e-18)
            np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C),
                                       rtol=1e-12)
        else:
            # atol floor: the upwind clamp makes LL weights exactly 0 when
            # w_adv >= w_diff; scan-vs-unrolled fusion rounds those ties to
            # tiny +-1e-13-scale garbage (physics scale ~1)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12)
