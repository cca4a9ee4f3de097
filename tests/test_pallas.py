"""Pallas fused NS kernel: bitwise parity with the XLA stencil-shift path.

Runs only on TPU (Mosaic kernels don't lower on the CPU backend); on the
CPU test harness these are skipped and the dispatch falls back to XLA,
which the transport/flow suites already validate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import Config, build_grid, build_kit, initialize_state
from pd_mg_pin_corrosion_tpu import pallas_kernels as pk
from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt, ns_step

tpu = any(d.platform == "tpu" for d in jax.devices())
pytestmark = pytest.mark.skipif(not tpu, reason="pallas kernels need TPU")


def test_pallas_matches_xla():
    cfg = Config()
    cfg.dx = 2.0e-6
    cfg.L_upstream = 100e-6
    cfg.L_downstream = 100e-6
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    assert pk.pallas_applicable(kit)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    dt = compute_dt(state, kit)

    ref = jax.jit(lambda s: ns_step(s, kit, dt))(state)
    out = pk.ns_step_pallas(state, kit, dt)
    np.testing.assert_array_equal(np.asarray(out.rho), np.asarray(ref.rho))
    np.testing.assert_array_equal(np.asarray(out.vel), np.asarray(ref.vel))
    np.testing.assert_array_equal(np.asarray(out.pressure), np.asarray(ref.pressure))


def test_auto_fallback_f64():
    cfg = Config()
    cfg.precision = "f64"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    assert not pk.pallas_applicable(kit)  # f64 -> XLA path


def test_pallas_3d_matches_xla():
    cfg = Config.load("config/params_3d.cfg")
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    assert pk.pallas_applicable_3d(kit)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    dt = compute_dt(state, kit)

    ref = jax.jit(lambda s: ns_step(s, kit, dt))(state)
    out = pk.ns_step_pallas_3d(state, kit, dt)
    # group-major accumulation reorders the f32 bond sums vs the XLA path's
    # stencil order (a VMEM-liveness requirement) -> allclose, not bitwise
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=1e-8)


def test_pallas_3d_matvec_matches_xla():
    """Streamed-weights 3D stencil matvec (GMRES hot op) at production size."""
    from dataclasses import replace as _rep

    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai

    cfg = Config.load("config/params_3d.cfg")
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    assert pk.matvec3d_applicable(kit)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    rng = np.random.default_rng(3)
    state = _rep(state, C=jnp.asarray(
        np.where(np.asarray(state.node_type) == 1, 1.0,
                 0.2 * rng.random(kit.shape)), jnp.float32))

    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    assert op.Wf is not None  # assemble pre-flattened for the kernel
    x = jnp.asarray(rng.random(kit.shape), jnp.float32)
    ref = np.asarray(jax.jit(lambda o, v: ai.matvec_M(
        ai.ImplicitOperator(W=o.W, diag=o.diag, unknown=o.unknown),
        kit, v))(op, x))
    out = np.asarray(pk.matvec_M_pallas_3d(op, kit, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

def test_pallas_3d_ds_matvec_close_to_f64():
    """Double-single refinement slot sum vs the exact f64 slot sum on real
    Mosaic lowering (the Dekker/two-sum sequences must survive the
    compiler; x64 emulation provides the reference)."""
    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai

    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64 for the f64 reference")

    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = 8.0e-6
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    assert pk.matvec3d_applicable(kit)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)

    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    assert op.Wf is not None

    rng = np.random.default_rng(23)
    x64 = jnp.asarray(rng.random(kit.shape), jnp.float64)
    x_hi = x64.astype(jnp.float32)
    x_lo = (x64 - x_hi.astype(jnp.float64)).astype(jnp.float32)

    @jax.jit
    def slot_sum64(W, v64):
        x_p = kit.pad(v64, 0.0)
        y = jnp.zeros(kit.shape, jnp.float64)
        offs, _, _, _ = kit.stencil_jnp()

        def body(y, xs):
            W_s, off = xs
            return y + W_s.astype(jnp.float64) * kit.shift_dyn(x_p, off), None

        y, _ = jax.lax.scan(body, y, (W, offs))
        return y

    ref = np.asarray(slot_sum64(op.W, x64))
    yh, yl = pk.matvec_slots_pallas_3d_ds(op, kit, x_hi, x_lo)
    out = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)

    scale = np.abs(ref).max()
    err = np.abs(out - ref).max() / scale
    assert err < 1e-10, f"ds error {err:.3e}"
