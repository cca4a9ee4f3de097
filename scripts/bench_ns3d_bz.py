"""Time the fused 3D NS Pallas kernel at the production (1M-node) geometry.

Used to tune the z-block size (PD_TPU_NS3D_BZ): each invocation measures
ONE setting (the kernel reads the env at import), so sweep via

    for bz in 8 16 32; do PD_TPU_NS3D_BZ=$bz python scripts/bench_ns3d_bz.py; done

Also times the implicit-step pieces at the same size (f32 GMRES matvec,
emulated-f64 refinement matvec) so refinement-path optimizations have a
measured anchor.

Usage: python scripts/bench_ns3d_bz.py [dx] [--no-implicit]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)  # match cli.py:46


def sync(x):
    # block_until_ready returns before execution under the axon relay; the
    # only reliable fence is a device->host transfer (memory/axon-tpu-quirks)
    for a in jax.tree_util.tree_leaves(x):
        float(jnp.sum(a.astype(jnp.float32)))


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0e-6
    do_implicit = "--no-implicit" not in sys.argv

    from pd_mg_pin_corrosion_tpu import pallas_kernels as pk
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt

    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = dx
    cfg.precision = "f32"
    cfg.compute_derived()

    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    S = grid.stencil.size
    print(f"grid {grid.shape} N={grid.N_total} S={S} BZ={pk._BZ}", flush=True)

    dt = compute_dt(state, kit)

    if "--no-ns" not in sys.argv:
        @jax.jit
        def steps(s, n):
            def body(_, ss):
                return pk.ns_step_pallas_3d(ss, kit, dt)
            return jax.lax.fori_loop(0, n, body, s)

        t0 = time.time()
        sync(steps(state, 1))
        print(f"compile+1: {time.time() - t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            sync(steps(state, 50))
            best = min(best, (time.time() - t0) / 50)
        print(f"ns_step_pallas_3d: {best * 1e3:.3f} ms/step  "
              f"(~{grid.N_total * S / best / 1e9:.1f} G bond-ops/s upper bound)",
              flush=True)

    if not do_implicit:
        return

    from pd_mg_pin_corrosion_tpu.coupling import (assemble_operator,
                                                  volume_loss_fraction)
    from pd_mg_pin_corrosion_tpu.ops.ard_implicit import (implicit_step,
                                                          matvec_M)

    vol_loss = volume_loss_fraction(state, kit)
    t0 = time.time()
    op = assemble_operator(state, kit, vol_loss)
    sync(op.W)
    print(f"assemble: {time.time() - t0:.1f}s", flush=True)

    x = state.C

    # NB: op must be a jit ARGUMENT — closing over the ~750MB weight array
    # turns it into an HLO literal and the axon remote compiler rejects the
    # request (HTTP 413). See memory/axon-tpu-quirks.md.
    @jax.jit
    def mv32(o, x):
        def body(_, y):
            return matvec_M(o, kit, y)
        return jax.lax.fori_loop(0, 20, body, x)

    sync(mv32(op, x))
    t0 = time.time(); sync(mv32(op, x)); print(
        f"f32 matvec: {(time.time() - t0) / 20 * 1e3:.2f} ms", flush=True)

    if jax.config.jax_enable_x64:
        f64 = jnp.float64
        W64 = op.W.astype(f64)
        diag64 = op.diag.astype(f64)

        @jax.jit
        def mv64(W64, diag64, x64):
            def body(_, y):
                x_p = kit.pad(y, 0.0)
                acc = diag64 * y
                if kit.use_scan:
                    offs, _, _, _ = kit.stencil_jnp()

                    def sbody(a, xs):
                        W_s, off = xs
                        return a + W_s * kit.shift_dyn(x_p, off), None

                    acc, _ = jax.lax.scan(sbody, acc, (W64, offs))
                else:
                    for s, _, _, _ in kit.bond_iter():
                        acc = acc + W64[s] * kit.shift(x_p, s)
                return jnp.where(op.unknown, acc, 0.0)
            return jax.lax.fori_loop(0, 5, body, x64)

        x64 = x.astype(f64)
        sync(mv64(W64, diag64, x64))
        t0 = time.time(); sync(mv64(W64, diag64, x64)); print(
            f"f64 matvec (emulated): {(time.time() - t0) / 5 * 1e3:.2f} ms",
            flush=True)

    # full implicit step (GMRES + refinement), production dt scale
    dt_imp = jnp.asarray(30.0, kit.jdtype)
    step_fn = jax.jit(lambda s, o: implicit_step(s, o, kit, dt_imp))
    t0 = time.time(); sync(step_fn(state, op)[0].C)
    print(f"implicit_step compile+1: {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time(); sync(step_fn(state, op)[0].C)
        best = min(best, time.time() - t0)
    print(f"implicit_step: {best * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
