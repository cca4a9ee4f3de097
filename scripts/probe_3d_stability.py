"""3D stabilization scan: (eta_density, cfl_factor) grid on a coarse 3D mesh.

The reference's own PD_DIM=3 build diverges at its defaults (axial acoustic
mode, documented in docs/PARITY.md); eta_density=1.0 bounds it but pushes dt
to the density-diffusion limit (~3.5e-9 s at dx=5um), making steady state
unreachable (~6M iters). This scan finds the weakest stabilization that
stays bounded with an acoustic-limited dt.

Runs each combo for N iters at dx=10um (~80k nodes), reporting eps / v_max
trend / rho range. Usage: python scripts/probe_3d_stability.py [n_iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_combo(eta, cfl, n_iters, dx=10.0e-6):
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import FLUID, build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu.dispatch import ops_for
    from pd_mg_pin_corrosion_tpu.solvers import _solve_steady_segment

    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = dx
    cfg.eta_density = eta
    cfg.cfl_factor = cfl
    cfg.flow_max_iters = n_iters
    cfg.precision = "f32"
    cfg.compute_derived()

    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    ops = ops_for(kit)
    dt0 = jax.jit(ops.compute_dt_ns)(state, kit)

    carry = (state, jnp.asarray(1, jnp.int32), jnp.asarray(1.0, kit.jdtype),
             dt0, jnp.asarray(False), jnp.asarray(False))
    seg_end = 0
    t0 = time.time()
    hist = []
    while True:
        seg_end = min(seg_end + 2000, cfg.flow_max_iters)
        carry = _solve_steady_segment(
            carry, jnp.asarray(seg_end, jnp.int32), kit, False)
        st, it, eps, dtc, conv, div = carry
        fluid = st.node_type == FLUID
        vm = float(jnp.max(jnp.where(
            fluid, jnp.linalg.norm(st.vel, axis=-1), 0.0)))
        rho = jnp.where(fluid, st.rho, cfg.rho_f)
        hist.append((int(it) - 1, float(eps), vm,
                     float(jnp.min(rho)), float(jnp.max(rho))))
        if bool(conv) or bool(div) or int(it) > cfg.flow_max_iters:
            break
    st, it, eps, dtc, conv, div = carry
    wall = time.time() - t0
    tag = "CONV" if bool(conv) else ("DIV" if bool(div) else "cap")
    print(f"eta={eta:<5} cfl={cfl:<5} dt={float(dt0):.2e} N={grid.N_total} "
          f"-> {tag} it={int(it)-1} eps={float(eps):.2e} "
          f"v_max={hist[-1][2]:.3f} rho=[{hist[-1][3]:.0f},{hist[-1][4]:.0f}] "
          f"[{wall:.0f}s]", flush=True)
    for h in hist[:: max(1, len(hist) // 6)]:
        print(f"    it={h[0]:>7} eps={h[1]:.2e} v_max={h[2]:.3f} "
              f"rho=[{h[3]:.0f},{h[4]:.0f}]", flush=True)
    return tag, hist


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    for eta, cfl in [(0.1, 0.25), (0.1, 0.5), (0.05, 0.25), (0.3, 0.25)]:
        try:
            run_combo(eta, cfl, n_iters)
        except Exception as e:
            print(f"eta={eta} cfl={cfl} -> ERROR {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
