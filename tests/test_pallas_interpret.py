"""CPU-executable Pallas kernel-logic tests via the interpreter.

The Mosaic-lowered kernels are TPU-only (tests/test_pallas.py); these run
the same kernel bodies through the Pallas interpreter so kernel logic is
covered by the CI-able CPU suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import (Config, build_grid, build_kit,
                                     initialize_state)
from pd_mg_pin_corrosion_tpu import pallas_kernels as pk
from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt, ns_step


def _small_f32_2d():
    cfg = Config()
    cfg.dx = 4.0e-6
    cfg.R_wire = 20e-6
    cfg.L_wire = 80e-6
    cfg.R_tube = 60e-6
    cfg.L_upstream = 60e-6
    cfg.L_downstream = 60e-6
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float32)
    return kit, state


@pytest.mark.slow
def test_pallas_2d_interpret_matches_xla():
    """Kernel logic verified on CPU via the Pallas interpreter (the real
    Mosaic lowering is covered by the TPU-only tests above)."""
    kit, state = _small_f32_2d()
    dt = compute_dt(state, kit)
    ref = jax.jit(lambda s: ns_step(s, kit, dt))(state)
    pk.INTERPRET = True
    try:
        out = pk.ns_step_pallas(state, kit, dt)
    finally:
        pk.INTERPRET = False
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_pallas_3d_interpret_matches_xla():
    cfg = Config()
    cfg.dim = 3
    cfg.dx = 8e-6
    cfg.R_wire = 16e-6
    cfg.L_wire = 64e-6
    cfg.R_tube = 48e-6
    cfg.L_upstream = 32e-6
    cfg.L_downstream = 32e-6
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float32)
    dt = compute_dt(state, kit)
    ref = jax.jit(lambda s: ns_step(s, kit, dt))(state)
    pk.INTERPRET = True
    try:
        out = pk.ns_step_pallas_3d(state, kit, dt)
    finally:
        pk.INTERPRET = False
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=1e-9)


@pytest.mark.slow
def test_matvec3d_interpret_matches_xla():
    """3D streamed-weights stencil matvec (GMRES hot op) vs the XLA
    scan-over-stencil matvec."""
    from dataclasses import replace as _rep

    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai

    cfg = Config()
    cfg.dim = 3
    cfg.dx = 8e-6
    cfg.R_wire = 16e-6
    cfg.L_wire = 64e-6
    cfg.R_tube = 48e-6
    cfg.L_upstream = 32e-6
    cfg.L_downstream = 32e-6
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    state = _rep(state, C=jnp.asarray(
        np.where(np.asarray(state.node_type) == 1, 1.0,
                 0.3 * rng.random(kit.shape)), jnp.float32))

    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    ref = np.asarray(jax.jit(lambda o, x: ai.matvec_M(o, kit, x))(op, state.C))

    op = ai.ImplicitOperator(W=op.W, diag=op.diag, unknown=op.unknown,
                             Wf=pk.flatten_W_3d(op.W, kit))
    x = jnp.asarray(rng.random(kit.shape), jnp.float32)
    # compare on the same input
    ref = np.asarray(jax.jit(lambda o, v: ai.matvec_M(
        ai.ImplicitOperator(W=o.W, diag=o.diag, unknown=o.unknown),
        kit, v))(op, x))
    pk.INTERPRET = True
    try:
        out = np.asarray(pk.matvec_M_pallas_3d(op, kit, x))
    finally:
        pk.INTERPRET = False
    # f32 contraction-order roundoff only (the solve's accuracy comes from
    # the f64-residual refinement, not the raw f32 operator)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_matvec3d_ds_interpret_matches_f64():
    """Double-single slot sum (refinement path) vs the exact f64 slot sum:
    must be orders of magnitude tighter than a plain f32 matvec."""
    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai

    cfg = Config()
    cfg.dim = 3
    cfg.dx = 8e-6
    cfg.R_wire = 16e-6
    cfg.L_wire = 64e-6
    cfg.R_tube = 48e-6
    cfg.L_upstream = 32e-6
    cfg.L_downstream = 32e-6
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float32)

    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    op = ai.ImplicitOperator(W=op.W, diag=op.diag, unknown=op.unknown,
                             Wf=pk.flatten_W_3d(op.W, kit))

    rng = np.random.default_rng(17)
    x64 = jnp.asarray(rng.random(kit.shape), jnp.float64)
    x_hi = x64.astype(jnp.float32)
    x_lo = (x64 - x_hi.astype(jnp.float64)).astype(jnp.float32)

    # exact f64 slot sum (no diag, no mask — the kernel's contract)
    W64 = np.asarray(op.W, np.float64)
    x_p = kit.pad(x64, 0.0)
    ref = jnp.zeros(kit.shape, jnp.float64)
    for s, _, _, _ in kit.bond_iter():
        ref = ref + jnp.asarray(W64[s]) * kit.shift(x_p, s)
    ref = np.asarray(ref)

    pk.INTERPRET = True
    try:
        yh, yl = pk.matvec_slots_pallas_3d_ds(op, kit, x_hi, x_lo)
    finally:
        pk.INTERPRET = False
    out = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)

    scale = np.abs(ref).max()
    err_ds = np.abs(out - ref).max() / scale
    # plain f32 matvec on the same input, for contrast
    y32 = jnp.zeros(kit.shape, jnp.float32)
    x_p32 = kit.pad(x_hi, 0.0)
    for s, _, _, _ in kit.bond_iter():
        y32 = y32 + op.W[s] * kit.shift(x_p32, s)
    err_f32 = np.abs(np.asarray(y32, np.float64) - ref).max() / scale
    assert err_ds < 1e-10, f"ds error {err_ds:.3e}"
    assert err_ds < err_f32 * 1e-2, (err_ds, err_f32)


@pytest.mark.slow
def test_ard_kernel_interpret_matches_xla():
    from dataclasses import replace as _rep

    from pd_mg_pin_corrosion_tpu.ops.ard import ard_step

    kit, state = _small_f32_2d()
    rng = np.random.default_rng(5)
    state = _rep(state, C=jnp.asarray(
        np.where(np.asarray(state.node_type) == 1, 1.0,
                 0.3 * rng.random(kit.shape)), jnp.float32))
    ref = jax.jit(lambda s: ard_step(s, kit, 1e-4, 0.1))(state)
    pk.INTERPRET = True
    try:
        out = pk.ard_step_pallas(state, kit, 1e-4, 0.1)
    finally:
        pk.INTERPRET = False
    np.testing.assert_allclose(np.asarray(out.C), np.asarray(ref.C),
                               rtol=1e-5, atol=1e-7)

@pytest.mark.slow
def test_implicit_step_ds_refine_interpret(monkeypatch):
    """implicit_step's ds-refinement glue (x hi/lo split, f64 combine) vs
    the emulated-f64 scan refinement on the same small 3D system."""
    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai

    cfg = Config()
    cfg.dim = 3
    cfg.dx = 8e-6
    cfg.R_wire = 16e-6
    cfg.L_wire = 64e-6
    cfg.R_tube = 48e-6
    cfg.L_upstream = 32e-6
    cfg.L_downstream = 32e-6
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float32)

    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    dt = jnp.asarray(5.0, jnp.float32)

    # reference: the f64-scan refinement (use_ds False on CPU)
    s_ref, res_ref = ai.implicit_step(state, op, kit, dt)

    # ds path: force applicability (CPU otherwise rejects), interpret the
    # kernel; assemble-equivalent Wf built by hand
    op_ds = ai.ImplicitOperator(W=op.W, diag=op.diag, unknown=op.unknown,
                                Wf=pk.flatten_W_3d(op.W, kit))
    monkeypatch.setattr(pk, "matvec3d_applicable", lambda k: True)
    pk.INTERPRET = True
    try:
        s_ds, res_ds = ai.implicit_step(state, op_ds, kit, dt)
    finally:
        pk.INTERPRET = False

    # both refinements solve the same f32-entry system to ~tol in f64;
    # the solutions agree far below the f32 GMRES floor
    np.testing.assert_allclose(np.asarray(s_ds.C), np.asarray(s_ref.C),
                               rtol=5e-6, atol=5e-8)
    assert float(res_ds) < 1e-5


def test_basis_kernels_interpret_match_xla():
    """Flat-basis GMRES primitives (dots + axpy) vs their XLA forms."""
    rng = np.random.default_rng(3)
    M1, R, L = 9, pk._BR_GB * 2, 128
    V2 = jnp.asarray(rng.normal(size=(M1, R, L)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(1, R, L)), jnp.float32)
    c = jnp.asarray(rng.normal(size=M1), jnp.float64)

    pk.INTERPRET = True
    try:
        dots = pk.basis_dots_pallas(V2, w2, jnp.float64)
        axpy = pk.basis_axpy_pallas(c, V2, w2)
    finally:
        pk.INTERPRET = False

    dots_ref = jnp.sum(V2.astype(jnp.float64) * w2.astype(jnp.float64),
                       axis=(1, 2))
    np.testing.assert_allclose(np.asarray(dots), np.asarray(dots_ref),
                               rtol=2e-6, atol=1e-3)
    axpy_ref = w2 - jnp.tensordot(c.astype(jnp.float32), V2,
                                  axes=([0], [0]))[None]
    np.testing.assert_allclose(np.asarray(axpy), np.asarray(axpy_ref),
                               rtol=1e-5, atol=1e-5)


def test_gmres_flat_kernels_interpret_matches_default():
    """gmres(flat_kernels=True) through the interpreter reproduces the
    default path's solution on an SPD system with a non-flat field shape."""
    from pd_mg_pin_corrosion_tpu.ops.gmres import gmres

    rng = np.random.default_rng(7)
    n = 96
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A_np = (Q @ np.diag(np.linspace(1.0, 40.0, n)) @ Q.T).astype(np.float32)
    x_true = rng.normal(size=n).astype(np.float32)
    b = jnp.asarray((A_np @ x_true).reshape(12, 8))   # 2D field shape
    Amat = jnp.asarray(A_np)

    def Aop(v):
        return (Amat @ v.ravel()).reshape(v.shape)

    x_ref, (res_ref, _) = gmres(Aop, b, jnp.zeros_like(b), tol=1e-5,
                                restart=20, maxiter=200)

    pk.INTERPRET = True
    try:
        x_fl, (res_fl, _) = gmres(Aop, b, jnp.zeros_like(b), tol=1e-5,
                                  restart=20, maxiter=200,
                                  flat_kernels=True)
    finally:
        pk.INTERPRET = False

    assert float(res_fl) < 1e-5
    np.testing.assert_allclose(np.asarray(x_fl).ravel(), x_true,
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(x_fl), np.asarray(x_ref),
                               rtol=5e-4, atol=5e-4)
