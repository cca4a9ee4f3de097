#!/usr/bin/env python3
"""Poiseuille validation plots: PD-NS velocity profiles vs the analytic
2D solution v(x) = 1.5 * U_in * (1 - (x/R_tube)^2) at several axial
stations, with per-station L2 errors (equivalent of the reference's
scripts/plot_poiseuille.py over the same VTI outputs).

Usage: python scripts/plot_poiseuille.py [output_dir] [vti_file]
"""

import glob
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtk_reader import read_vti  # noqa: E402

FLUID = 0


def find_vti(outdir):
    for pat in ("flow_*.vti", "state_*.vti", "final_*.vti"):
        files = sorted(glob.glob(os.path.join(outdir, pat)))
        if files:
            return files[-1]
    raise SystemExit(f"no VTI files found in {outdir}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output_poiseuille"
    path = sys.argv[2] if len(sys.argv) > 2 else find_vti(outdir)
    print(f"Reading {path}")

    meta, fields = read_vti(path)
    x, y = meta["x"], meta["y"]
    nt = fields["node_type"].astype(int)
    vz = fields["velocity"][:, 1]
    fluid = nt == FLUID

    # infer tube radius from the fluid extent, U_in from flux conservation
    R_tube = np.abs(x[fluid]).max()
    v_peak = vz[fluid].max()
    U_in = v_peak / 1.5

    y_f = y[fluid]
    stations = np.percentile(y_f, [15, 35, 50, 65, 85])

    fig, axes = plt.subplots(1, len(stations), figsize=(4 * len(stations), 4),
                             sharey=True)
    dx = meta["spacing"][0]
    print(f"{'station y [um]':>16} {'n':>5} {'L2 rel err':>12}")
    for ax, ys in zip(axes, stations):
        sel = fluid & (np.abs(y - ys) <= 0.6 * dx)
        xs = x[sel]
        vs = vz[sel]
        order = np.argsort(xs)
        xs, vs = xs[order], vs[order]
        va = 1.5 * U_in * (1.0 - np.minimum((xs / R_tube) ** 2, 1.0))
        l2 = np.sqrt(((vs - va) ** 2).sum() / max((va**2).sum(), 1e-300))
        print(f"{ys * 1e6:16.1f} {len(xs):5d} {l2:12.3e}")

        ax.plot(xs * 1e6, vs * 1e3, "o", ms=3, label="PD-NS")
        ax.plot(xs * 1e6, va * 1e3, "-", label="analytic")
        ax.set_title(f"y = {ys * 1e6:.0f} um\nL2 = {l2:.2e}")
        ax.set_xlabel("x [um]")
    axes[0].set_ylabel("v_axial [mm/s]")
    axes[0].legend()
    fig.tight_layout()
    out = os.path.join(outdir, "poiseuille_validation.png")
    fig.savefig(out, dpi=130)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
