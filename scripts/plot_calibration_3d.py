"""Figure for the 3D two-anchor calibration study (docs/runs/calib_3d).

Plots the single-anchor baseline curve against the two-anchor
(corrosion_accel_l) fit, with the Reimers et al. 2023 experimental
anchors. Original styling (blue/orange CVD-safe pair, neutral-ink
anchors, recessive grid).

Usage: python scripts/plot_calibration_3d.py [out.png]
"""

import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BASE = "docs/runs/calib_3d"
ANCHORS = [(4.23, 22.86), (9.0, 50.0)]

SERIES = [
    ("lowD-a-9h", "single-anchor fit (no accel): 40.1 % at 9 h", "#3b6fb6"),
    ("twoanchor-c", "two-anchor fit (accel_l=1.279): 22.91 / 50.11 %",
     "#d9730d"),
]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else f"{BASE}/two_anchor.png"

    fig, ax = plt.subplots(figsize=(7.0, 4.4), dpi=160)
    for name, label, color in SERIES:
        path = f"{BASE}/{name}/diagnostics.csv"
        if not os.path.exists(path):
            print(f"skip {path} (missing)")
            continue
        rows = np.loadtxt(path, delimiter=",", skiprows=1)
        ax.plot(rows[:, 1], rows[:, 2], color=color, lw=2.0, label=label)

    ta, la = zip(*ANCHORS)
    ax.scatter(ta, la, marker="D", s=42, facecolor="#222222",
               edgecolor="white", linewidth=1.0, zorder=5,
               label="Reimers et al. 2023 anchors")
    for tx, ly in ANCHORS:
        ax.annotate(f"{ly:.0f} % @ {tx:g} h", (tx, ly),
                    textcoords="offset points", xytext=(8, -14),
                    fontsize=8.5, color="#444444")

    ax.set_xlabel("time [h]")
    ax.set_ylabel("pin volume loss [%]")
    ax.set_title("3D Mg-4Ag pin corrosion: two-anchor transport calibration "
                 "(166k-node grid)", fontsize=10.5)
    ax.set_xlim(0, 9.4)
    ax.set_ylim(0, None)
    ax.grid(True, which="major", lw=0.5, alpha=0.25)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    ax.legend(loc="upper left", fontsize=8.5, frameon=False)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
