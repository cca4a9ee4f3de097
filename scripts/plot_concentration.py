#!/usr/bin/env python3
"""Concentration plume figure: multi-panel snapshots of the dissolved-Mg
field over time (equivalent of the reference's scripts/plot_concentration.py,
without its hardcoded grid dimensions — sizes come from each VTI header).

Usage: python scripts/plot_concentration.py [output_dir] [n_panels]
"""

import glob
import os
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtk_reader import read_vti  # noqa: E402


def snapshot_time(path):
    m = re.search(r"_t([0-9.]+)s\.", path)
    return float(m.group(1)) if m else 0.0


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output"
    n_panels = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    files = sorted(glob.glob(os.path.join(outdir, "corr_*.vti")) +
                   glob.glob(os.path.join(outdir, "state_*.vti")) +
                   glob.glob(os.path.join(outdir, "final_*.vti")),
                   key=snapshot_time)
    if not files:
        raise SystemExit(f"no VTI snapshots in {outdir}")
    sel = np.linspace(0, len(files) - 1, min(n_panels, len(files))).astype(int)
    files = [files[i] for i in sel]

    fig, axes = plt.subplots(1, len(files), figsize=(3.2 * len(files), 5),
                             sharey=True)
    if len(files) == 1:
        axes = [axes]

    for ax, path in zip(axes, files):
        meta, fields = read_vti(path)
        nx, ny = meta["nx"], meta["ny"]
        C = fields["concentration"].reshape(ny, nx)
        nt = fields["node_type"].reshape(ny, nx).astype(int)
        C_show = np.where((nt == 2) | (nt == 5), np.nan, C)  # hide wall/outside
        extent = [meta["x"].min() * 1e6, meta["x"].max() * 1e6,
                  meta["y"].min() * 1e6, meta["y"].max() * 1e6]
        im = ax.imshow(C_show, origin="lower", extent=extent, cmap="viridis",
                       aspect="equal", vmin=0.0)
        # solid outline
        ax.contour(np.linspace(extent[0], extent[1], nx),
                   np.linspace(extent[2], extent[3], ny),
                   (nt == 1).astype(float), levels=[0.5], colors="r",
                   linewidths=0.8)
        ax.set_title(f"t = {snapshot_time(path):.0f} s")
        ax.set_xlabel("x [um]")
    axes[0].set_ylabel("y [um]")
    fig.colorbar(im, ax=axes, shrink=0.8, label="C (dissolved Mg)")
    out = os.path.join(outdir, "concentration_panels.png")
    fig.savefig(out, dpi=130)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
