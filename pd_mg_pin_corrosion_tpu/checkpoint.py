"""Checkpoint / resume — a capability the reference lacks entirely
(its only resilience is crash-safe PVD rewriting; SURVEY §5).

State pytree + simulation clock + counters go into a single .npz written
atomically (tmp + rename), so a killed run restarts from the last coupling
cycle instead of t=0.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from .fields import State


def save_checkpoint(path: str, state: State, t_corr: float, meta: dict) -> None:
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(State)}
    tmp = path + ".tmp"
    np.savez_compressed(tmp, t_corr=t_corr, meta=json.dumps(meta), **arrays)
    # numpy appends .npz to names without it
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)
    print(f"  Checkpoint written: {path} (t={t_corr:.1f} s)")


def load_checkpoint(path: str, template: State):
    """Returns (state, t_corr, meta). ``template`` supplies dtypes."""
    with np.load(path, allow_pickle=False) as z:
        kwargs = {}
        for f in dataclasses.fields(State):
            ref = getattr(template, f.name)
            kwargs[f.name] = jnp.asarray(z[f.name], ref.dtype)
        t_corr = float(z["t_corr"])
        meta = json.loads(str(z["meta"]))
    return State(**kwargs), t_corr, meta
