"""Per-op wall-time breakdown of one 3D steady-flow iteration at the
production (1M-node) geometry: each BC, the NS step, the convergence check,
and the full solve_steady body — so kernel-fusion work targets the actual
dominant cost (round-3 roadmap item: 8.75 ms/flow-iter vs 0.96 ms for the
2D NS step alone).

Usage: python scripts/profile_flow_iter.py [dx]
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


def timeit(label, fn, *args, reps=30):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{label:42s} {best * 1e3:8.3f} ms", flush=True)
    return best


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0e-6

    from pd_mg_pin_corrosion_tpu import boundary as bc
    from pd_mg_pin_corrosion_tpu import pallas_kernels as pk
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt, ns_step

    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = dx
    cfg.precision = "f32"
    cfg.compute_derived()

    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    print(f"grid {grid.shape} N={grid.N_total} S={grid.stencil.size}",
          flush=True)

    dt = compute_dt(state, kit)

    # each op in a fori_loop so per-call dispatch is excluded (same idiom
    # as bench.py); n=10 inner reps per timed call
    def loop(fn):
        @jax.jit
        def run(s):
            def body(_, ss):
                return fn(ss)
            return jax.lax.fori_loop(0, 10, body, s)
        return lambda s: run(s)

    reps = 3  # x10 inner
    scale = 10.0

    def t(label, fn):
        b = timeit(label, loop(fn), state, reps=reps)
        return b / scale

    total = 0.0
    total += t("apply_inlet_bc", lambda s: bc.apply_inlet_bc(s, kit))
    total += t("apply_outlet_bc", lambda s: bc.apply_outlet_bc(s, kit))
    total += t("apply_wall_bc", lambda s: bc.apply_wall_bc(s, kit))
    total += t("apply_solid_surface_bc",
               lambda s: bc.apply_solid_surface_bc(s, kit))
    if pk.pallas_applicable_3d(kit):
        total += t("ns_step (pallas 3d)",
                   lambda s: pk.ns_step_pallas_3d(s, kit, dt))
    else:
        total += t("ns_step (xla)", lambda s: ns_step(s, kit, dt))
    # second wall BC on new buffers (pd_ns.cpp:205)
    total += t("apply_wall_bc (new)", lambda s: bc.apply_wall_bc(s, kit))
    print(f"{'sum of ops':42s} {total * 1e3 * 10:8.3f} ms/10 iters "
          f"= {total * 1e3:.3f} ms/iter", flush=True)

    # the real segment body (includes the every-100-iters check under cond)
    from pd_mg_pin_corrosion_tpu.solvers import _solve_steady_segment

    carry = (state, jnp.asarray(1, jnp.int32), jnp.asarray(1.0, kit.jdtype),
             dt, jnp.asarray(False), jnp.asarray(False))

    @jax.jit
    def seg(c, n):
        return _solve_steady_segment(c, n, kit)

    n200 = jnp.asarray(200, jnp.int32)
    out = seg(carry, n200)
    sync(out[0].rho)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = seg(carry, n200)
        sync(out[0].rho)
        best = min(best, time.time() - t0)
    print(f"{'full solve_steady segment (199 iters)':42s} "
          f"{best / 199 * 1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
