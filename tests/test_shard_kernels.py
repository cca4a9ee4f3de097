"""shard_map'd Pallas fast paths on the virtual 8-device CPU mesh.

Kernel logic runs through the Pallas interpreter (CPU-executable, like
tests/test_pallas_interpret.py); the mesh plumbing — ppermute halo
exchange, per-shard geometry, local weight-stack flattening — is exactly
what runs on a real TPU mesh, so these tests pin the multi-chip fast
path's numerics against the single-device XLA reference.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pd_mg_pin_corrosion_tpu import Config, build_grid, build_kit, initialize_state
from pd_mg_pin_corrosion_tpu import pallas_kernels as pk
from pd_mg_pin_corrosion_tpu.grid import pad_grid_axial
from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai
from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt, ns_step
from pd_mg_pin_corrosion_tpu.parallel import shard_kernels as sk
from pd_mg_pin_corrosion_tpu.parallel.sharding import (make_mesh, shard_kit,
                                                       shard_state)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(autouse=True)
def _interpret_kernels():
    pk.INTERPRET = True
    yield
    pk.INTERPRET = False


def _cfg_2d():
    cfg = Config()
    cfg.dx = 4.0e-6
    cfg.R_wire = 20e-6
    cfg.L_wire = 80e-6
    cfg.R_tube = 60e-6
    cfg.L_upstream = 60e-6
    cfg.L_downstream = 60e-6
    cfg.precision = "f32"
    return cfg.compute_derived()


def _cfg_3d():
    cfg = Config()
    cfg.dim = 3
    cfg.dx = 8e-6
    cfg.R_wire = 16e-6
    cfg.L_wire = 64e-6
    cfg.R_tube = 48e-6
    cfg.L_upstream = 32e-6
    cfg.L_downstream = 32e-6
    cfg.Q_flow = 1.667e-10
    cfg.precision = "f32"
    return cfg.compute_derived()


def _setup(cfg):
    grid = pad_grid_axial(build_grid(cfg), 8)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=jnp.float32)
    mesh = make_mesh(8)
    kit_sh = shard_kit(kit, mesh)
    state_sh = shard_state(state, mesh)
    return kit, state, kit_sh, state_sh


@pytest.mark.slow
def test_sharded_ns_2d_matches_xla():
    kit, state, kit_sh, state_sh = _setup(_cfg_2d())
    dt = float(compute_dt(state, kit))
    ref = jax.jit(lambda s: ns_step(s, kit, dt))(state)
    out = sk.ns_step_sharded(state_sh, kit_sh, dt)
    assert len(out.rho.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_sharded_ns_3d_matches_xla():
    kit, state, kit_sh, state_sh = _setup(_cfg_3d())
    dt = float(compute_dt(state, kit))
    ref = jax.jit(lambda s: ns_step(s, kit, dt))(state)
    out = sk.ns_step_sharded(state_sh, kit_sh, dt)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_sharded_matvec_2d_matches_xla():
    kit, state, kit_sh, state_sh = _setup(_cfg_2d())
    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    x = state.C + 0.3 * kit.v_pois.astype(jnp.float32)
    ref = op.diag * x
    x_p = kit.pad(x, 0.0)
    for s, _, _, _ in kit.bond_iter():
        ref = ref + op.W[s] * kit.shift(x_p, s)
    ref = jnp.where(op.unknown, ref, 0.0)

    op_sh = jax.jit(lambda s: ai.assemble(s, kit_sh))(state_sh)
    out = sk.matvec_M_sharded(op_sh, kit_sh, x)
    # both paths accumulate 36 slot products in f32 (~1e4-scale weights);
    # they sit ~1e-5 relative from the f64 oracle each, so compare at 2e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=1e-3)


@pytest.mark.slow
def test_sharded_matvec_3d_matches_xla():
    """3D: exercises the per-shard weight-stack flatten (finalize_op_sharded)
    plus the windowed DMA matvec kernel with halo'd x."""
    kit, state, kit_sh, state_sh = _setup(_cfg_3d())
    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    x = state.C + 0.3 * kit.v_pois.astype(jnp.float32)
    ref = np.asarray(ai.matvec_M(op, kit, x))

    op_sh = jax.jit(lambda s: ai.assemble(s, kit_sh))(state_sh)
    assert op_sh.Wf is None  # CPU mesh: sharded finalize not applicable
    op_sh = sk.finalize_op_sharded(op_sh, kit_sh)
    out = sk.matvec_M_sharded(op_sh, kit_sh, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-3)


@pytest.mark.slow
def test_sharded_ns_matches_single_device_pallas_bitwise():
    """Per-node arithmetic of the sharded kernel is IDENTICAL to the
    single-device kernel (same slot order, same data) — bitwise in 2D."""
    kit, state, kit_sh, state_sh = _setup(_cfg_2d())
    dt = float(compute_dt(state, kit))
    ref = pk.ns_step_pallas(state, kit, dt)
    out = sk.ns_step_sharded(state_sh, kit_sh, dt)
    np.testing.assert_array_equal(np.asarray(out.rho), np.asarray(ref.rho))
    np.testing.assert_array_equal(np.asarray(out.vel), np.asarray(ref.vel))
