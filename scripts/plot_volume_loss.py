#!/usr/bin/env python3
"""Volume-loss curve vs the Reimers et al. (2023) experimental anchors.

Equivalent of the reference's scripts/plot_volume_loss.py, which expects an
experimental-data file (config/metadata.csv) that is absent from its repo;
here the published anchor points are embedded as a fallback, and an external
CSV (time_h,volume_loss_pct) is used when provided.

Usage: python scripts/plot_volume_loss.py [output_dir] [experiment.csv]
"""

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# Published anchors for the 80 um Mg-4Ag wire at 1 mL/min SBF:
# ~22.86 % at 4.23 h (calibration span) and ~50 % at 9 h (headline).
REIMERS_ANCHORS = np.array([
    [0.0, 0.0],
    [4.23, 22.86],
    [9.0, 50.0],
])


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output"
    exp_csv = sys.argv[2] if len(sys.argv) > 2 else None

    path = os.path.join(outdir, "mass_loss.csv")
    data = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)
    t_h, loss = data[:, 0], data[:, 1]

    if exp_csv and os.path.exists(exp_csv):
        exp = np.loadtxt(exp_csv, delimiter=",", skiprows=1, ndmin=2)
    else:
        exp = REIMERS_ANCHORS
        print("Using embedded Reimers anchor points "
              "(pass an experiment CSV for full data).")

    fig, ax = plt.subplots(figsize=(6, 4.2))
    ax.plot(t_h, loss, "-", lw=2, label="simulation")
    ax.plot(exp[:, 0], exp[:, 1], "ks", ms=6, mfc="none", label="experiment")
    ax.set_xlabel("time [h]")
    ax.set_ylabel("pin volume loss [%]")
    ax.legend()
    ax.grid(alpha=0.3)

    # sim-vs-experiment relative error table at the anchor times
    print(f"{'t [h]':>8} {'exp [%]':>9} {'sim [%]':>9} {'rel err':>9}")
    for te, ve in exp:
        if te <= 0 or te > t_h.max():
            continue
        vs = float(np.interp(te, t_h, loss))
        rel = abs(vs - ve) / max(ve, 1e-30)
        print(f"{te:8.2f} {ve:9.2f} {vs:9.2f} {rel:9.2%}")

    out = os.path.join(outdir, "volume_loss.png")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
