#!/usr/bin/env python3
"""Dissolved-Mg concentration transport figures.

Functional equivalent of the reference's scripts/plot_concentration.py
(multi-panel publication figure: 2D plume map, centerline evolution,
transverse profiles) plus a snapshot panel series — but grid-agnostic:
all dimensions, origins and spacings come from each VTI header instead of
the reference's hardcoded NX, NY = 67, 287.

Outputs (into the run's output directory):
  concentration_transport.png — (a) 2D plume at the final snapshot with the
      pin box, tube-wall lines and profile-station markers; (b) centerline
      C(y) for several snapshot times; (c) transverse C(x) at three axial
      stations downstream of the pin.
  concentration_panels.png — time series of 2D plume snapshots.

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
from matplotlib.patches import Rectangle

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from vtk_reader import read_vti  # noqa: E402

FLUID, SOLID_MG, WALL, INLET, OUTLET, OUTSIDE = 0, 1, 2, 3, 4, 5

plt.rcParams.update({
    "font.size": 9.5,
    "axes.titlesize": 10,
    "axes.titleweight": "semibold",
    "axes.titlelocation": "left",
    "legend.fontsize": 8,
    "axes.spines.top": False,
    "axes.spines.right": False,
    "lines.linewidth": 1.5,
})

# colorblind-safe station palette (Okabe-Ito), own choice of line styles
STATION_STYLE = [("#0072B2", "-."), ("#D55E00", (0, (5, 1.5))),
                 ("#009E73", (0, (1, 1)))]
PIN_FACE = "#d9c89e"      # pale brass fill for the undissolved pin footprint
MASK_GRAY = "0.92"        # non-fluid cells in the plume map


def snapshot_time(path):
    m = re.search(r"_t([0-9.]+)s\.", path)
    return float(m.group(1)) if m else 0.0


def collect(outdir):
    files = sorted(glob.glob(os.path.join(outdir, "corr_*.vti")) +
                   glob.glob(os.path.join(outdir, "state_*.vti")) +
                   glob.glob(os.path.join(outdir, "final_*.vti")),
                   key=snapshot_time)
    if not files:
        raise SystemExit(f"no VTI snapshots in {outdir}")
    return files


def load2d(path):
    """(x_um, y_um, C[ny,nx], nt[ny,nx]) for a 2D (nz==1) snapshot; 3D files
    return their z-mid axial slice through the wire axis."""
    meta, fields = read_vti(path)
    nx, ny, nz = meta["nx"], meta["ny"], meta["nz"]
    C = fields["concentration"].reshape(nz, ny, nx)
    nt = fields["node_type"].reshape(nz, ny, nx).astype(int)
    if nz == 1:
        C, nt = C[0], nt[0]
        x = (meta["origin"][0] + np.arange(nx) * meta["spacing"][0]) * 1e6
        y = (meta["origin"][1] + np.arange(ny) * meta["spacing"][1]) * 1e6
    else:
        # axial(z)-transverse(x) slice through the axis: y index of x=0
        jmid = int(np.argmin(np.abs(
            meta["origin"][1] + np.arange(ny) * meta["spacing"][1])))
        C, nt = C[:, jmid, :], nt[:, jmid, :]
        x = (meta["origin"][0] + np.arange(nx) * meta["spacing"][0]) * 1e6
        y = (meta["origin"][2] + np.arange(nz) * meta["spacing"][2]) * 1e6
    return x, y, C, nt


def pin_box(x, y, nt):
    solid = nt == SOLID_MG
    if not solid.any():
        return None
    xs = x[np.any(solid, axis=0)]
    ys = y[np.any(solid, axis=1)]
    hx = 0.5 * (x[1] - x[0])
    hy = 0.5 * (y[1] - y[0])
    return xs.min() - hx, xs.max() + hx, ys.min() - hy, ys.max() + hy


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output"
    n_panels = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    files = collect(outdir)

    # ---- snapshot selection: evenly spread + the final one ----
    times = np.array([snapshot_time(f) for f in files])
    n_cl = min(5, len(files))
    cl_idx = sorted(set(
        np.linspace(0, len(files) - 1, n_cl).astype(int).tolist()))
    final_path = files[-1]

    x, y, C_fin, nt = load2d(final_path)
    hx = 0.5 * (x[1] - x[0])
    fluid = nt == FLUID
    C_show = np.where(fluid, C_fin, np.nan)
    C_max = np.nanmax(C_show) if np.isfinite(C_show).any() else 1.0
    box = pin_box(x, y, nt)

    # transverse stations: downstream of the pin at 1, 2.5 and 5 pin-lengths
    if box is not None:
        x0, x1, y0, y1 = box
        L_pin = y1 - y0
        stations = [y1 + f * L_pin for f in (0.25, 1.0, 2.5)]
    else:
        stations = [np.percentile(y, p) for p in (55, 70, 85)]
    stations = [s for s in stations if s < y.max()]

    # Layout: the r-z domain is tall and narrow, so the plume map sits on
    # the LEFT spanning the full figure height, with the two line panels
    # stacked on the RIGHT; constrained_layout handles the spacing.
    fig = plt.figure(figsize=(9.5, 8.5), constrained_layout=True)
    gs = fig.add_gridspec(2, 2, width_ratios=[0.9, 1.25])
    ax2d = fig.add_subplot(gs[:, 0])
    axcl = fig.add_subplot(gs[0, 1])
    axpr = fig.add_subplot(gs[1, 1])

    # ---- a) plume map ----
    cmap = plt.cm.magma.copy()
    cmap.set_bad(MASK_GRAY)
    extent = [x.min() - hx, x.max() + hx,
              y.min() - 0.5 * (y[1] - y[0]), y.max() + 0.5 * (y[1] - y[0])]
    im = ax2d.imshow(C_show, origin="lower", extent=extent, cmap=cmap,
                     vmin=0.0, vmax=max(C_max, 1e-12), aspect="equal",
                     interpolation="nearest", rasterized=True)
    if box is not None:
        ax2d.add_patch(Rectangle((x0, y0), x1 - x0, y1 - y0,
                                 facecolor=PIN_FACE, edgecolor="#6b5a2e",
                                 linewidth=1.2, hatch="////", zorder=4,
                                 label="Mg pin"))
    wall_cols = np.where(np.any(nt == WALL, axis=0))[0]
    if wall_cols.size:
        for xw, lab in ((x[wall_cols[0]] - hx, "tube wall"),
                        (x[wall_cols[-1]] + hx, None)):
            ax2d.axvline(xw, color="k", lw=1.3, label=lab)
    # station tick marks at the map edge instead of full cross-lines
    for s, (col, ls) in zip(stations, STATION_STYLE):
        ax2d.plot([extent[0], extent[0] + 0.12 * (extent[1] - extent[0])],
                  [s, s], color=col, lw=2.5, solid_capstyle="butt", zorder=5)
        ax2d.annotate("", xy=(extent[1], s),
                      xytext=(extent[1] - 0.1 * (extent[1] - extent[0]), s),
                      arrowprops=dict(arrowstyle="-", color=col, lw=2.5))
    cb = fig.colorbar(im, ax=ax2d, location="bottom", shrink=0.9, pad=0.02)
    cb.set_label("dissolved Mg concentration $C$ (–)")
    ax2d.set_xlabel(r"$x$ [$\mu$m]")
    ax2d.set_ylabel(r"axial [$\mu$m]")
    ax2d.set_title(f"a)  plume, t = {snapshot_time(final_path):.0f} s")
    ax2d.legend(loc="lower right")

    # ---- b) centerline histories ----
    ic = int(np.argmin(np.abs(x)))
    t_colors = plt.cm.cividis_r(np.linspace(0.0, 0.8, len(cl_idx)))
    for color, i in zip(t_colors, cl_idx):
        xs_i, ys_i, C_i, nt_i = load2d(files[i])
        line = np.where(nt_i[:, ic] == FLUID, C_i[:, ic], np.nan)
        axcl.plot(ys_i, line, color=color,
                  label=f"{times[i] / 60.0:.1f} min")
    if box is not None:
        axcl.axvspan(y0, y1, facecolor=PIN_FACE, alpha=0.55, zorder=0,
                     label="pin extent")
    axcl.set_xlabel(r"axial [$\mu$m]")
    axcl.set_ylabel("$C$ on the axis (–)")
    axcl.set_title("b)  centerline history")
    axcl.legend(ncols=2, columnspacing=1.0)
    axcl.set_ylim(bottom=0)
    axcl.grid(alpha=0.15)

    # ---- c) transverse cuts ----
    for s, (col, ls) in zip(stations, STATION_STYLE):
        iy = int(np.argmin(np.abs(y - s)))
        prof = np.where(nt[iy, :] == FLUID, C_fin[iy, :], np.nan)
        axpr.plot(x, prof, color=col, ls=ls, lw=1.8,
                  label=rf"y = {y[iy]:.0f} $\mu$m")
    if box is not None:
        axpr.axvspan(x0, x1, facecolor=PIN_FACE, alpha=0.55, zorder=0,
                     label="pin extent")
    axpr.set_xlabel(r"$x$ [$\mu$m]")
    axpr.set_ylabel("$C$ across the tube (–)")
    axpr.set_title("c)  transverse cuts at the marked stations")
    axpr.legend()
    axpr.set_ylim(bottom=0)
    axpr.grid(alpha=0.15)

    out = os.path.join(outdir, "concentration_transport.png")
    fig.savefig(out, dpi=200)
    plt.close(fig)
    print(f"Wrote {out}")

    # ---- snapshot panel series (retained from round 1) ----
    sel = np.linspace(0, len(files) - 1,
                      min(n_panels, len(files))).astype(int)
    pfiles = [files[i] for i in sel]
    fig, axes = plt.subplots(1, len(pfiles), figsize=(3.2 * len(pfiles), 5),
                             sharey=True)
    axes = np.atleast_1d(axes)
    for ax, path in zip(axes, pfiles):
        xs_i, ys_i, C_i, nt_i = load2d(path)
        C_p = np.where((nt_i == WALL) | (nt_i == OUTSIDE), np.nan, C_i)
        ext = [xs_i.min(), xs_i.max(), ys_i.min(), ys_i.max()]
        im = ax.imshow(C_p, origin="lower", extent=ext, cmap="viridis",
                       aspect="equal", vmin=0.0)
        ax.contour(xs_i, ys_i, (nt_i == SOLID_MG).astype(float),
                   levels=[0.5], colors="r", linewidths=0.8)
        ax.set_title(f"t = {snapshot_time(path):.0f} s")
        ax.set_xlabel(r"x [$\mu$m]")
    axes[0].set_ylabel(r"axial [$\mu$m]")
    fig.colorbar(im, ax=list(axes), shrink=0.8, label="C (dissolved Mg)")
    out = os.path.join(outdir, "concentration_panels.png")
    fig.savefig(out, dpi=130)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
