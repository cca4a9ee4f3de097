"""Figure for the 2D two-anchor calibration (docs/runs/calib_2d).

Shows the reference's shipped 9 h workload parameters vs the
reference-native D rescale vs the accel polish, against the Reimers
anchors. Original styling (CVD-safe blue/orange/teal, neutral-ink
anchors, recessive grid).

Usage: python scripts/plot_calibration_2d.py [out.png]
"""

import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BASE = "docs/runs/calib_2d"
ANCHORS = [(4.23, 22.86), (9.0, 50.0)]

SERIES = [
    ("baseline-9h", "reference's shipped D: 39.95 / 78.54 %", "#3b6fb6"),
    ("twoanchor-a", "reference-native rescale (x0.583): 23.39 / 50.02 %",
     "#d9730d"),
    ("twoanchor-b", "+ accel polish: 23.01 / 50.22 %", "#2a8a7e"),
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

    ax.set_xlabel("time [h]")
    ax.set_ylabel("pin volume loss [%]")
    ax.set_title("2D r-z 9 h workload: the reference's parameters are "
                 "~1.7x over-scaled", fontsize=10.5)
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
