"""Loop-semantics deviation study (round-2 VERDICT next #5).

The 1M-node production run uses three config-gated deviations from the
reference's coupling-loop semantics (coupling.cpp:174-213):

  dissolution_batch=250      (reference: exit at FIRST dissolution event)
  implicit_dt_min_frac=0.05  (reference: 0.01)
  flow_max_iters_resolve     (reference: every re-solve gets the full
                              flow_max_iters budget)

This script quantifies their trajectory effect: the same 3D workload run
twice — reference semantics vs production settings — comparing the
volume-loss curve and v_max. Scale and horizon are chosen so the
reference-semantics run (O(events) flow re-solves) stays tractable on one
chip; the *relative* deviation is the quantity of interest.

Usage:  python scripts/study_loop_semantics.py [dx] [T_final]
Writes: docs/runs/loop_semantics/{ref,prod}/diagnostics.csv + REPORT.md
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(tag, dx, t_final, outdir, *, batch, dt_min_frac, resolve_cap):
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.coupling import CoupledSolver
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu import grains as grains_mod

    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = dx
    cfg.T_final = t_final
    cfg.output_dir = outdir
    cfg.checkpoint_every = 0
    cfg.flow_max_iters = 6000          # identical, reference-legal cap
    cfg.flow_output_stride = 10**9     # no VTI flood
    cfg.implicit_output_every = 10**9
    cfg.dissolution_batch = batch
    cfg.implicit_dt_min_frac = dt_min_frac
    cfg.flow_max_iters_resolve = resolve_cap
    cfg.precision = "f32"
    cfg.compute_derived()

    grid = build_grid(cfg)
    grains = grains_mod.generate(grid, cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, grains=grains, dtype=kit.jdtype)
    print(f"=== [{tag}] N={grid.N_total} batch={batch} "
          f"dt_min_frac={dt_min_frac} resolve_cap={resolve_cap} ===",
          flush=True)
    CoupledSolver().run(grid, state, kit, cfg)


def load_diag(outdir):
    rows = np.loadtxt(f"{outdir}/diagnostics.csv", delimiter=",", skiprows=1)
    return np.atleast_2d(rows)


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0e-6
    t_final = float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0
    base = "docs/runs/loop_semantics"
    os.makedirs(base, exist_ok=True)

    run_one("production", dx, t_final, f"{base}/prod",
            batch=250, dt_min_frac=0.05, resolve_cap=2000)
    run_one("reference-semantics", dx, t_final, f"{base}/ref",
            batch=1, dt_min_frac=0.01, resolve_cap=0)

    ref = load_diag(f"{base}/ref")
    prod = load_diag(f"{base}/prod")

    # compare on the overlapping time range via interpolation
    t_lo = max(ref[0, 0], prod[0, 0])
    t_hi = min(ref[-1, 0], prod[-1, 0])
    ts = np.linspace(t_lo, t_hi, 200)
    loss_r = np.interp(ts, ref[:, 0], ref[:, 2])
    loss_p = np.interp(ts, prod[:, 0], prod[:, 2])
    v_r = np.interp(ts, ref[:, 0], ref[:, 4])
    v_p = np.interp(ts, prod[:, 0], prod[:, 4])

    d_loss = np.abs(loss_p - loss_r)
    d_v = np.abs(v_p - v_r) / np.maximum(np.abs(v_r), 1e-30)
    lines = [
        "# Loop-semantics deviation study",
        "",
        f"Geometry: params_3d.cfg at dx={dx:g} (3D), T_final={t_final:g} s,",
        "flow_max_iters=6000 both runs. Reference semantics: "
        "dissolution_batch=1, implicit_dt_min_frac=0.01, uncapped "
        "re-solves. Production: 250 / 0.05 / 2000-iter re-solve cap.",
        "",
        "| Quantity | value |",
        "|---|---|",
        f"| final volume loss (reference semantics) | {ref[-1, 2]:.4f} % at t={ref[-1, 0]:.0f} s |",
        f"| final volume loss (production settings) | {prod[-1, 2]:.4f} % at t={prod[-1, 0]:.0f} s |",
        f"| max \\|delta loss\\| over overlap | {d_loss.max():.4f} % points |",
        f"| mean \\|delta loss\\| over overlap | {d_loss.mean():.4f} % points |",
        f"| max rel \\|delta v_max\\| | {d_v.max():.3e} |",
        f"| solid-count final (ref/prod) | {int(ref[-1, 3])} / {int(prod[-1, 3])} |",
        "",
    ]
    with open(f"{base}/REPORT.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
