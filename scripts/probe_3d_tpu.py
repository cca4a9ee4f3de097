"""Probe: 3D NS step + wall BC timing and compile cost on the real TPU.

Measures, at the params_3d.cfg production size (570k nodes, f32):
  - jit compile wall time of one coupled flow iteration (BCs + ns_step)
  - steady-state per-iteration device time
  - the wall-BC-only cost (the round-1 scaling concern)

Usage: python scripts/probe_3d_tpu.py [dx]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pd_mg_pin_corrosion_tpu import boundary as bc
from pd_mg_pin_corrosion_tpu.config import Config
from pd_mg_pin_corrosion_tpu.fields import initialize_state
from pd_mg_pin_corrosion_tpu.grid import build_grid
from pd_mg_pin_corrosion_tpu.kit import build_kit
from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt, ns_step


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0e-6
    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = dx
    cfg.precision = "f32"
    cfg.compute_derived()

    t0 = time.time()
    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    print(f"grid {grid.shape} N={grid.N_total} S={grid.stencil.size} "
          f"build={time.time()-t0:.1f}s", flush=True)

    dt = compute_dt(state, kit)

    def flow_iter(s, dt):
        s = bc.apply_inlet_bc(s, kit)
        s = bc.apply_outlet_bc(s, kit)
        s = bc.apply_wall_bc(s, kit)
        s = bc.apply_solid_surface_bc(s, kit)
        s = ns_step(s, kit, dt)
        return bc.apply_wall_bc(s, kit)

    @jax.jit
    def run(s, dt, n):
        def body(_, s):
            return flow_iter(s, dt)
        return jax.lax.fori_loop(0, n, body, s)

    @jax.jit
    def run_wall(s, n):
        def body(_, s):
            return bc.apply_wall_bc(s, kit)
        return jax.lax.fori_loop(0, n, body, s)

    def sync(s):
        return float(jnp.sum(s.rho))

    t0 = time.time()
    sync(run(state, dt, 1))
    print(f"compile+first run: {time.time()-t0:.1f}s", flush=True)

    for label, fn, counts in [
        ("flow_iter", lambda n: run(state, dt, n), (10, 50)),
        ("wall_bc", lambda n: run_wall(state, n), (10, 100)),
    ]:
        n_lo, n_hi = counts
        sync(fn(n_lo)); sync(fn(n_hi))
        best = float("inf")
        for _ in range(3):
            t0 = time.time(); sync(fn(n_lo)); t_lo = time.time() - t0
            t0 = time.time(); sync(fn(n_hi)); t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        print(f"{label}: {best*1e3:.3f} ms/iter", flush=True)

    bonds = grid.N_total * grid.stencil.size
    print(f"approx bond-ops/s (flow_iter): {bonds/best:.3e}")


if __name__ == "__main__":
    main()
