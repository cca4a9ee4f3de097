"""Small host-side utilities (reference: src/utils.h Timer, :79-96)."""

from __future__ import annotations

import time


class Timer:
    """Wall-clock phase timer printing ``[Timer] label: X s`` on report().

    Mirrors the reference's Timer (src/utils.h:79-96); also usable as a
    context manager.
    """

    def __init__(self, label: str):
        self.label = label
        self.t0 = time.time()

    def report(self) -> float:
        dt = time.time() - self.t0
        print(f"  [Timer] {self.label}: {dt:.3f} s")
        return dt

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.report()
        return False
