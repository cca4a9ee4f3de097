"""3D TPU-vs-CPU op acceptance harness.

The 178-slot unrolled XLA fusion of the 3D NS step MISCOMPILES on TPU at
production size (NaNs + dropped slot contributions at ~2.5% of nodes,
reproducible across processes; CPU and the Pallas kernel agree bit-exactly
— see git log). This script cross-checks every 3D device op against the
CPU backend at production size so any further miscompiles are caught
before they poison a 9-hour run.

Phase 1 (on TPU):  python scripts/validate_3d_tpu.py save
Phase 2 (on CPU):  JAX_PLATFORMS=cpu python scripts/validate_3d_tpu.py check
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/tmp/val3d_tpu.npz"


def build(dx=5.0e-6):
    import jax.numpy as jnp
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit

    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = dx
    cfg.precision = "f32"
    cfg.compute_derived()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    # a structured, non-uniform C field exercises the transport stencils
    rng = np.random.default_rng(7)
    C = (0.5 + 0.5 * np.sin(grid.pos[..., 2] * 3e4)
         * np.cos(grid.pos[..., 0] * 2e4)).astype(np.float32)
    C = np.where(np.asarray(state.node_type) == 1, 1.0, 0.2 * C)
    from dataclasses import replace
    state = replace(state, C=jnp.asarray(C))
    return cfg, grid, kit, state


def run_ops(cfg, grid, kit, state):
    import jax
    import jax.numpy as jnp
    from pd_mg_pin_corrosion_tpu import boundary as bc
    from pd_mg_pin_corrosion_tpu.ops import ard, ard_implicit as ai

    # kit and op go through jit as ARGUMENTS (pytrees), exactly as the
    # production coupling loop passes them — closing over them would embed
    # op.W (~400MB in 3D) as an HLO constant and blow the remote compiler's
    # request-size limit.
    res = {}
    from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt, ns_step
    dtf = jax.jit(compute_dt)(state, kit)
    s0 = jax.jit(ns_step)(state, kit, dtf)
    res["ns_rho"] = np.asarray(s0.rho)
    res["ns_vel"] = np.asarray(s0.vel)

    s1 = jax.jit(ard.ard_step)(state, kit, 1e-5, 0.1)
    res["ard_C"] = np.asarray(s1.C)

    op = jax.jit(ai.assemble)(state, kit, 0.1)
    res["op_diag"] = np.asarray(op.diag)
    res["op_W_sum"] = np.asarray(jnp.sum(op.W, axis=0))
    mv = jax.jit(lambda s, o, k: ai.matvec_M(o, k, s.C))(state, op, kit)
    res["matvec"] = np.asarray(mv)
    dt_a = jax.jit(ai.compute_adaptive_dt)(state, op, kit)
    res["dt_adaptive"] = np.asarray(dt_a)

    s2 = jax.jit(bc.apply_inlet_bc)(state, kit)
    res["inlet_rho"] = np.asarray(s2.rho)
    res["inlet_C"] = np.asarray(s2.C)
    s3 = jax.jit(bc.apply_outlet_bc)(state, kit)
    res["outlet_C"] = np.asarray(s3.C)
    res["outlet_vel"] = np.asarray(s3.vel)
    s4 = jax.jit(bc.apply_wall_bc)(state, kit)
    res["wall_rho"] = np.asarray(s4.rho)
    res["wall_vel"] = np.asarray(s4.vel)
    s5 = jax.jit(bc.apply_wall_concentration_bc)(state, kit)
    res["wallC"] = np.asarray(s5.C)
    s6 = jax.jit(bc.smooth_boundary_concentration)(state, kit)
    res["smooth_C"] = np.asarray(s6.C)
    res["salt"] = np.asarray(
        jax.jit(ard.compute_salt_blocked)(state, kit))

    # refinement slot sum: the Pallas double-single kernel on TPU vs the
    # exact f64 scan on CPU — the two agree to ~1e-12, so the 1e-5 gate
    # catches any Mosaic lowering defect in the Dekker/two-sum sequences
    from pd_mg_pin_corrosion_tpu import pallas_kernels as pk
    rng = np.random.default_rng(31)
    x64 = jnp.asarray(rng.random(kit.shape), jnp.float64)
    x_hi = x64.astype(jnp.float32)
    x_lo = (x64 - x_hi.astype(jnp.float64)).astype(jnp.float32)
    if pk.matvec3d_applicable(kit):
        opf = op if op.Wf is not None else ai.ImplicitOperator(
            W=op.W, diag=op.diag, unknown=op.unknown,
            Wf=pk.flatten_W_3d(op.W, kit))
        yh, yl = pk.matvec_slots_pallas_3d_ds(opf, kit, x_hi, x_lo)
        ds = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    else:
        @jax.jit
        def slot_sum64(W, v64):
            x_p = kit.pad(v64, 0.0)
            offs, _, _, _ = kit.stencil_jnp()

            def body(y, xs):
                W_s, off = xs
                return (y + W_s.astype(jnp.float64)
                        * kit.shift_dyn(x_p, off), None)

            y, _ = jax.lax.scan(body, jnp.zeros(kit.shape, jnp.float64),
                                (W, offs))
            return y

        ds = slot_sum64(op.W, x64)
    res["ds_matvec"] = np.asarray(ds, np.float32)

    # GMRES Krylov-basis kernels (dots/axpy over the windowed layout) vs
    # their exact XLA forms on CPU — both feed the production 3D solve
    geo = pk._geometry_3d(kit)
    rows, cols = geo[10], geo[8]
    rngb = np.random.default_rng(5)
    Vb = jnp.asarray(rngb.standard_normal((9, rows, cols)).astype(np.float32))
    wb = jnp.asarray(rngb.standard_normal((1, rows, cols)).astype(np.float32))
    cb = jnp.asarray(rngb.standard_normal(9).astype(np.float32))
    if pk.gmres_basis_ok(kit, state.C.size) and pk.basis_shape_ok((rows, cols)):
        dots = pk.basis_dots_pallas(Vb, wb, jnp.float64)
        axpy = pk.basis_axpy_pallas(cb, Vb, wb)[0]
    else:
        dots = jnp.sum(Vb.astype(jnp.float64) * wb.astype(jnp.float64),
                       axis=(1, 2))
        axpy = (wb - jnp.tensordot(cb, Vb, axes=([0], [0])))[0]
    res["basis_dots"] = np.asarray(dots).astype(np.float32)
    res["basis_axpy"] = np.asarray(axpy)

    # full implicit transport step: on TPU this exercises the windowed-
    # layout flat3d solve with the bf16-stream preconditioner; on CPU the
    # XLA basis path. Both are f64-residual-controlled to the same tol,
    # so the solutions agree far below the 1e-5 gate.
    s7, _res_step = jax.jit(lambda s, o, k: ai.implicit_step(s, o, k, 30.0))(
        state, op, kit)
    res["implicit_C"] = np.asarray(s7.C)
    return res


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    import jax
    if mode == "check":
        jax.config.update("jax_platforms", "cpu")
    # production (cli.py) always runs under x64; validate what ships, and
    # the ds_matvec entry needs f64 for its reference
    jax.config.update("jax_enable_x64", True)
    cfg, grid, kit, state = build()
    res = run_ops(cfg, grid, kit, state)
    if mode == "save":
        np.savez_compressed(OUT, **res)
        print(f"saved {len(res)} op outputs to {OUT}")
        return
    ref = np.load(OUT)
    bad = 0
    for k in ref.files:
        a, b = ref[k], res[k]
        if a.dtype == bool:
            a = a.astype(np.float32)
            b = b.astype(np.float32)
        nan_mismatch = int((np.isnan(a) != np.isnan(b)).sum())
        d = np.nanmax(np.abs(a - b)) if a.size else 0.0
        scale = max(np.nanmax(np.abs(b)), 1e-30)
        ok = nan_mismatch == 0 and (d / scale) < 1e-5
        bad += 0 if ok else 1
        print(f"{'OK ' if ok else 'BAD'} {k:12s} max|d|={d:.3e} "
              f"rel={d / scale:.2e} nan_mismatch={nan_mismatch}")
    print("RESULT:", "PASS" if bad == 0 else f"FAIL ({bad} ops)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
