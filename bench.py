"""Benchmark: PD bond-ops/sec on one chip for the hot NS bond kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json target of 100M PD
bond-ops/sec/chip (the reference publishes no throughput numbers).

A "bond-op" is one full PD-NS bond evaluation (mass divergence + delta-SPH
density diffusion + momentum convection/pressure/viscous terms — the
reference's pd_ns.cpp:115-157 inner loop body). The benchmark runs the
production ns_step (not a stripped kernel) under lax.fori_loop so dispatch
overhead is excluded, on a 2D grid sized to fill the chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import OUTSIDE, build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt
    from pd_mg_pin_corrosion_tpu.pallas_kernels import ns_step_auto as ns_step

    # Large 2D flow-cell grid (~0.9M nodes): baseline geometry at dx=1um
    cfg = Config()
    cfg.dx = 1.0e-6
    cfg.R_wire = 40.0e-6
    cfg.L_wire = 400.0e-6
    cfg.R_tube = 150.0e-6
    cfg.L_upstream = 500.0e-6
    cfg.L_downstream = 500.0e-6
    cfg.precision = "f32"
    cfg.compute_derived()

    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)

    n_active = int((grid.node_type != OUTSIDE).sum())
    S = grid.stencil.size
    bonds_per_step = n_active * S

    dt = compute_dt(state, kit)

    @jax.jit
    def run(state, dt, n):
        def body(_, s):
            return ns_step(s, kit, dt)
        return jax.lax.fori_loop(0, n, body, state)

    def sync(s):
        # NOTE: under the axon TPU relay, block_until_ready returns before
        # execution completes; a host transfer of a reduction is the only
        # reliable fence, so all timings force one.
        return float(jnp.sum(s.rho))

    # warmup/compile both trip counts
    n_lo, n_hi = 50, 250
    sync(run(state, dt, n_lo))
    sync(run(state, dt, n_hi))

    # two-point measurement cancels the fixed dispatch+transfer overhead
    reps = 3
    t_lo = min_time = None
    best_lo = best_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(state, dt, n_lo))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(run(state, dt, n_hi))
        best_hi = min(best_hi, time.perf_counter() - t0)

    per_step = (best_hi - best_lo) / (n_hi - n_lo)
    bond_ops_per_sec = bonds_per_step / per_step
    print(json.dumps({
        "metric": "pd_bond_ops_per_sec_per_chip",
        "value": round(bond_ops_per_sec),
        "unit": "bond-ops/s",
        "vs_baseline": round(bond_ops_per_sec / 100e6, 3),
    }))


if __name__ == "__main__":
    main()
