"""Two-anchor ODE-response fit for volume-loss curves (shared helper).

Model: dV/dt = s * f(V) * 10^(sign * V / l), where f(V) is the intrinsic
rate response extracted from a measured diagnostics.csv curve (binned
dV/dt vs V, sqrt(1-V) area tail beyond the measured range), `s` is a
D-scale factor and `l` the decay/acceleration length of the
volume-loss-coupled micro-diffusivity factor:
  sign=+1 -> corrosion_accel_l (exposure amplification, 3D extension)
  sign=-1 -> corrosion_decay_l (Hermann et al. 2022 Eq. 42, reference-native)

If the measured curve was itself produced with known (s_run, l_run),
pass them so f(V) is recovered by dividing their factor out — this is
the refit iteration that converged the 3D calibration in three runs
(docs/runs/calib_3d/REPORT.md).

Usage:
  python scripts/anchor_fit.py <diagnostics.csv> [--sign=+1|-1]
      [--s-run=S --l-run=L] [--t1=15228 --V1=0.2286 --t2=32400 --V2=0.50]
Prints the fitted (s, l) and the predicted anchor losses.
"""

import sys

import numpy as np


def load_rate_response(csv_path, s_run=1.0, l_run=None, sign=1.0,
                       t_max=None, bins=36):
    rows = np.loadtxt(csv_path, delimiter=",", skiprows=1)
    t, loss = rows[:, 0], rows[:, 2] / 100.0
    V = np.maximum.accumulate(loss)
    tb = np.linspace(0.0, t_max if t_max else t[-1], bins + 1)
    Vb = np.interp(tb, t, V)
    fb = np.diff(Vb) / np.diff(tb)
    Vm = 0.5 * (Vb[1:] + Vb[:-1])
    if l_run:
        fb = fb / (s_run * 10.0 ** (sign * Vm / l_run))

    def f0(Vq):
        Vq = np.asarray(Vq)
        fi = np.interp(Vq, Vm, fb)
        tail = fb[-1] * np.sqrt(np.maximum(1 - Vq, 0.0) / (1 - Vm[-1]))
        return np.where(Vq <= Vm[-1], fi, tail)

    return f0


def fit_two_anchor(f0, t1, V1, t2, V2, sign=1.0):
    """Find (s, l) with dV/dt = s*f0(V)*10^(sign*V/l) through both anchors."""
    def tau(Vq, l):
        vs = np.linspace(1e-4, Vq, 4000)
        return np.trapezoid(1.0 / (f0(vs) * 10.0 ** (sign * vs / l)), vs)

    target = t2 / t1
    lo, hi = 0.05, 1000.0
    # tau(V2)/tau(V1) is monotone in 1/l: stronger acceleration (sign=+1)
    # shrinks the far-anchor time ratio; stronger decay (sign=-1) grows it
    for _ in range(80):
        mid = np.sqrt(lo * hi)
        ratio = tau(V2, mid) / tau(V1, mid)
        if (ratio > target) == (sign > 0):
            hi = mid
        else:
            lo = mid
    l = np.sqrt(lo * hi)
    s = tau(V1, l) / t1
    return s, l, tau


def predict(f0, s, l, sign, t_query, V_max=0.9):
    vs = np.linspace(1e-4, V_max, 8000)
    dts = 1.0 / (s * f0(vs) * 10.0 ** (sign * vs / l))
    ts = np.concatenate(
        [[0.0], np.cumsum(0.5 * (dts[1:] + dts[:-1]) * np.diff(vs))])
    return np.interp(t_query, ts, vs)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    csv_path = args[0]
    sign = float(opts.get("sign", 1.0))
    s_run = float(opts.get("s-run", 1.0))
    l_run = float(opts["l-run"]) if "l-run" in opts else None
    t1 = float(opts.get("t1", 15228.0))
    V1 = float(opts.get("V1", 0.2286))
    t2 = float(opts.get("t2", 32400.0))
    V2 = float(opts.get("V2", 0.50))

    f0 = load_rate_response(csv_path, s_run, l_run, sign, t_max=t2)
    s, l, _ = fit_two_anchor(f0, t1, V1, t2, V2, sign)
    print(f"fit: s={s:.4f}  l={l:.4f}  (sign={sign:+.0f})")
    for tq in (t1, t2):
        print(f"  predicted loss at {tq:.0f}s: "
              f"{predict(f0, s, l, sign, tq) * 100:.2f}%")


if __name__ == "__main__":
    main()
