"""2D two-anchor calibration vs the Reimers anchors — reference-native knobs.

The reference's own 2D 9 h workload (config/params_implicit_test.cfg)
overshoots the experiment badly at the far anchor (~78.5 % at 9 h vs the
~50 % target, with 22.86 % at 4.23 h as the near anchor). Unlike 3D
(which needed the corrosion_accel_l extension because its curve is too
SLOW late), the 2D planar model is too FAST late — which the reference's
own Hermann et al. 2022 Eq. 42 decay slot (`corrosion_decay_l`,
10^(-V_L/l)) can correct. This driver runs (D-scale, decay_l) points on
the params_implicit_test geometry to 9 h so both anchors can be fit with
purely reference-native physics.

Usage: python scripts/calibrate_2d.py [label=D_grain:D_gb[:decay_l[:accel_l]] ...]
Writes docs/runs/calib_2d/<label>/diagnostics.csv + REPORT.md rows.
(decay_l/accel_l of 0 = disabled; accel_l is the framework extension,
used here only for the final sub-percent polish — the main 2D result is
the reference-native rescale.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T_ANCHOR1, LOSS_ANCHOR1 = 15228.0, 22.86
T_ANCHOR2, LOSS_ANCHOR2 = 32400.0, 50.0


def run_one(label, D_grain, D_gb, decay_l, outdir, accel_l=None):
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.coupling import CoupledSolver
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu import grains as grains_mod

    cfg = Config.load("config/params_implicit_test.cfg")
    cfg.D_grain = D_grain
    cfg.D_gb = D_gb
    if decay_l is not None:
        cfg.corrosion_decay_l = decay_l
    if accel_l is not None:
        cfg.corrosion_accel_l = accel_l
    cfg.output_dir = outdir
    cfg.checkpoint_every = 0
    cfg.flow_output_stride = 10**9
    cfg.implicit_output_every = 10**9
    cfg.compute_derived()

    grid = build_grid(cfg)
    grains = grains_mod.generate(grid, cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, grains=grains, dtype=kit.jdtype)
    print(f"=== [{label}] N={grid.N_total} D_grain={D_grain:g} "
          f"D_gb={D_gb:g} decay_l={decay_l} ===", flush=True)
    CoupledSolver().run(grid, state, kit, cfg)
    return np.atleast_2d(
        np.loadtxt(f"{outdir}/diagnostics.csv", delimiter=",", skiprows=1))


def main():
    ladder = []
    for a in sys.argv[1:]:
        label, _, dv = a.partition("=")
        parts = dv.split(":")
        dg, dgb = float(parts[0]), float(parts[1])
        dl = float(parts[2]) if len(parts) > 2 else None
        al = float(parts[3]) if len(parts) > 3 else None
        ladder.append((label, dg, dgb, dl, al))
    if not ladder:
        ladder = [("baseline-9h", 1.0e-16, 1.0e-14, None, None)]

    base = "docs/runs/calib_2d"
    os.makedirs(base, exist_ok=True)
    results = []
    for label, dg, dgb, dl, al in ladder:
        rows = run_one(label, dg, dgb, dl, f"{base}/{label}", accel_l=al)
        l1 = float(np.interp(T_ANCHOR1, rows[:, 0], rows[:, 2]))
        l2 = float(np.interp(T_ANCHOR2, rows[:, 0], rows[:, 2]))
        results.append((label, dg, dgb, f"{dl}/{al}", l1, l2, rows[-1, 0]))

    report = f"{base}/REPORT.md"
    lines = []
    if not os.path.exists(report):
        lines += [
            "# 2D two-anchor calibration (reference-native knobs)",
            "",
            f"Geometry: params_implicit_test.cfg (2D r-z, dx=5e-6). Anchors: "
            f"{LOSS_ANCHOR1} % at 4.23 h, ~{LOSS_ANCHOR2:.0f} % at 9 h "
            "(Reimers et al. 2023).",
            "",
            "| label | D_grain | D_gb | decay_l | loss @4.23h | loss @9h | t_end |",
            "|---|---|---|---|---|---|---|",
        ]
    for r in results:
        lines.append(f"| {r[0]} | {r[1]:g} | {r[2]:g} | {r[3]} | "
                     f"{r[4]:.2f} % | {r[5]:.2f} % | {r[6]:.0f} s |")
    lines.append("")
    with open(report, "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
