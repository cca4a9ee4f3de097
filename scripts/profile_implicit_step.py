"""Wall-time breakdown of one implicit transport step at the production
(1M-node) 3D geometry: the Pallas matvec, the double-single refinement
matvec, the preconditioner, one full GMRES solve (with cycle counts), and
the complete implicit_step — so solver work targets the actual dominant
cost (round-3: 434 ms/step at 1.06M unknowns dominates the flagship run).

Usage: python scripts/profile_implicit_step.py [dx] [dt]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)  # match cli.py


def sync(x):
    # device->host transfer is the only reliable fence under the axon relay
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "dtype"):
            float(jnp.sum(a.astype(jnp.float32)))


def timeit(label, fn, *args, reps=10, rounds=3):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{label:46s} {best * 1e3:9.3f} ms", flush=True)
    return best


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0e-6
    dt_val = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0

    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai
    from pd_mg_pin_corrosion_tpu.ops.gmres import gmres

    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = dx
    cfg.precision = "f32"
    cfg.compute_derived()

    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    print(f"grid {grid.shape} N={grid.N_total} S={grid.stencil.size} "
          f"dt={dt_val}", flush=True)

    # NOTE: op (~750MB of W at 1M nodes) must be a jit ARGUMENT, never a
    # closure constant — baked-in constants ship with every remote-compile
    # request and exceed the axon relay's body limit (HTTP 413).
    assemble_j = jax.jit(lambda s: ai.assemble(s, kit))
    t0 = time.time()
    op = assemble_j(state)
    sync(op.W[0])
    print(f"assemble (compile+run): {time.time()-t0:.2f} s", flush=True)
    timeit("assemble", assemble_j, state)

    x = state.C

    # --- raw matvec (the GMRES hot op)
    mv = jax.jit(lambda o, v: ai.matvec_M(o, kit, v))
    timeit("matvec_M (Pallas 3D)", mv, op, x, reps=30)

    # --- double-single refinement matvec
    from pd_mg_pin_corrosion_tpu.pallas_kernels import (
        matvec3d_applicable, matvec_slots_pallas_3d_ds)
    if op.Wf is not None and matvec3d_applicable(kit):
        ds = jax.jit(lambda o, v: matvec_slots_pallas_3d_ds(
            o, kit, v, jnp.zeros_like(v)))
        timeit("matvec ds (refinement)", ds, op, x, reps=10)

    dt = jnp.asarray(dt_val, kit.jdtype)

    def A_of(o, dt):
        def A(v):
            return jnp.where(o.unknown, v - dt * ai.matvec_M(o, kit, v), v)
        return A

    def precond_of(o, dt):
        A = A_of(o, dt)
        inv_diag = 1.0 / (1.0 - dt * o.diag)

        def jacobi(v):
            return jnp.where(o.unknown, v * inv_diag, v)

        def precond(v):
            y = jacobi(v)
            for _ in range(2):
                y = y + jacobi(v - A(y))
            return y
        return precond

    timeit("A = I - dt*M", jax.jit(lambda o, v: A_of(o, dt)(v)), op, x,
           reps=30)
    timeit("precond (Neumann-2: 2xA)",
           jax.jit(lambda o, v: precond_of(o, dt)(v)), op, x, reps=10)

    # --- one MGS-equivalent traffic probe: 26 masked dot+axpy over V
    m = 25
    V = jnp.zeros((m + 1,) + x.shape, x.dtype)

    @jax.jit
    def mgs_probe(w, V):  # noqa: same shape as the gmres inner loop
        def body(i, wh):
            w, h = wh
            coef = jnp.sum(V[i] * w, dtype=jnp.float64)
            w = w - coef.astype(w.dtype) * V[i]
            h = h.at[i].add(coef)
            return (w, h)
        w, h = jax.lax.fori_loop(0, m + 1, body,
                                 (w, jnp.zeros(m + 1, jnp.float64)))
        w, h = jax.lax.fori_loop(0, m + 1, body, (w, h))
        return w, h

    timeit("MGS2 full-m sweep (52 dot+axpy)", mgs_probe, x, V, reps=5)

    # --- CGS2 probe: the batched-contraction orthogonalization that
    # replaced the sequential MGS sweeps in ops/gmres.py
    @jax.jit
    def cgs2_probe(w, V):
        h = jnp.zeros(m + 1, jnp.float64)
        for _ in range(2):
            coefs = jnp.sum(V * w, axis=tuple(range(1, V.ndim)),
                            dtype=jnp.float64)
            w = w - jnp.tensordot(coefs.astype(w.dtype), V,
                                  axes=([0], [0]))
            h = h + coefs
        return w, h

    timeit("CGS2 full-m sweep (4 contractions)", cgs2_probe, x, V, reps=5)

    # --- full inner GMRES solve at production settings
    b = state.C

    @jax.jit
    def solve(o, b):
        return gmres(A_of(o, dt), b, b, tol=1e-4, restart=25, maxiter=200,
                     M=precond_of(o, dt))

    xg, (res, cycles) = solve(op, b)
    sync(xg)
    print(f"inner GMRES: res={float(res):.3e} cycles={int(cycles)}",
          flush=True)
    timeit("inner GMRES solve (tol 1e-4)", solve, op, b, reps=3)

    # --- full implicit step
    step_j = jax.jit(lambda s, o, d: ai.implicit_step(s, o, kit, d))
    out, res = step_j(state, op, dt)
    sync(out.C)
    print(f"implicit_step residual: {float(res):.3e}", flush=True)
    timeit("implicit_step (full)", step_j, state, op, dt, reps=3)

    # adaptive dt (one matvec + reductions)
    timeit("compute_adaptive_dt", jax.jit(
        lambda s, o: ai.compute_adaptive_dt(s, o, kit)), state, op, reps=10)


if __name__ == "__main__":
    main()
