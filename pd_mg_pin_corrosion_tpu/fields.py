"""Simulation state as a JAX pytree.

Functional redesign of the reference's double-buffered SoA ``Fields``
(src/fields.h:7-59): purity makes the ``*_new`` buffers and swap machinery
unnecessary — each step returns a new State. ``node_type`` lives here (not
in the static Grid) because phase change mutates it on device
(src/pd_ard.cpp:193-212); the grid *topology* never changes, so this is the
only dynamic piece of what the reference calls "the grid".

Array layout: every per-node field is a dense array of the grid's spatial
shape ([Ny, Nx] in 2D, [Nz, Ny, Nx] in 3D); velocity carries a trailing
[dim] axis. Flattening in C order reproduces the reference's node index
n = k*(Nx*Ny) + j*Nx + i (src/grid.h:58-64).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .grid import FLUID, INLET, OUTLET, OUTSIDE, SOLID_MG, WALL, FICTITIOUS, Grid


@jax.tree_util.register_dataclass
@dataclass
class State:
    rho: jax.Array        # [*S]
    vel: jax.Array        # [*S, dim]
    pressure: jax.Array   # [*S]
    C: jax.Array          # [*S]
    node_type: jax.Array  # [*S] uint8 — mutated by phase change
    phase: jax.Array      # [*S] uint8 (0=solid, 1=liquid)
    D_map: jax.Array      # [*S] — visualization/bookkeeping only
    grain_id: jax.Array   # [*S] int32
    is_gb: jax.Array      # [*S] bool
    is_precip: jax.Array  # [*S] bool


def poiseuille_axial(cfg: Config, pos: np.ndarray) -> np.ndarray:
    """Analytic inlet profile (reference: src/main.cpp:25-38, boundary.cpp:41-52).

    2D planar: v = 1.5 * U_in * (1 - (r/R)^2); 3D circular: 2.0 * U_in * (...).
    """
    R2 = cfg.R_tube * cfg.R_tube
    px = pos[..., 0]
    if cfg.dim == 2:
        r_ratio2 = np.minimum(px * px / R2, 1.0)
        return 1.5 * cfg.U_in * (1.0 - r_ratio2)
    py = pos[..., 1]
    r_ratio2 = np.minimum((px * px + py * py) / R2, 1.0)
    return 2.0 * cfg.U_in * (1.0 - r_ratio2)


def initialize_state(
    grid: Grid,
    cfg: Config,
    grains=None,
    dtype=jnp.float32,
) -> State:
    """Per-node-type initial values (reference: src/main.cpp:9-127)."""
    nt = grid.node_type
    shape = grid.shape
    dim = grid.dim

    rho = np.zeros(shape)
    vel = np.zeros(shape + (dim,))
    C = np.zeros(shape)
    D_map = np.zeros(shape)
    phase = np.ones(shape, dtype=np.uint8)

    v_pois = poiseuille_axial(cfg, grid.pos)
    axial = dim - 1  # velocity component index of the axial direction

    if grains is not None:
        is_gb = grains.is_grain_boundary.astype(bool)
        is_precip = grains.is_precipitate.astype(bool)
        grain_id = grains.grain_id.astype(np.int32)
    else:
        is_gb = np.zeros(shape, dtype=bool)
        is_precip = np.zeros(shape, dtype=bool)
        grain_id = np.full(shape, -1, dtype=np.int32)

    fluid = nt == FLUID
    solid = nt == SOLID_MG
    wall = nt == WALL
    inlet = nt == INLET
    outlet = nt == OUTLET
    fict = nt == FICTITIOUS

    # FLUID: Poiseuille warm start for faster flow convergence (main.cpp:16-39)
    rho[fluid] = cfg.rho_f
    C[fluid] = cfg.C_liquid_init
    D_map[fluid] = cfg.D_liquid
    vel[..., axial][fluid] = v_pois[fluid]

    # SOLID_MG: fluid density for PD flow equations (main.cpp:43), C=1,
    # D_map from grain structure GB > precipitate > grain (main.cpp:48-55)
    rho[solid] = cfg.rho_f
    C[solid] = cfg.C_solid_init
    phase[solid] = 0
    D_solid = np.where(is_gb, cfg.D_gb, np.where(is_precip, cfg.D_precip, cfg.D_grain))
    D_map[solid] = D_solid[solid]

    # WALL (main.cpp:58-64)
    rho[wall] = cfg.rho_f

    # INLET: Poiseuille (main.cpp:66-90)
    rho[inlet] = cfg.rho_f
    C[inlet] = cfg.C_liquid_init
    D_map[inlet] = cfg.D_liquid
    vel[..., axial][inlet] = v_pois[inlet]

    # OUTLET (main.cpp:92-98)
    rho[outlet] = cfg.rho_f
    C[outlet] = cfg.C_liquid_init
    D_map[outlet] = cfg.D_liquid

    # OUTSIDE: rho=0 (main.cpp:100-106) — all-zero already

    # FICTITIOUS (main.cpp:108-114)
    rho[fict] = cfg.rho_f
    D_map[fict] = cfg.D_liquid

    pressure = np.zeros(shape)

    return State(
        rho=jnp.asarray(rho, dtype),
        vel=jnp.asarray(vel, dtype),
        pressure=jnp.asarray(pressure, dtype),
        C=jnp.asarray(C, dtype),
        node_type=jnp.asarray(nt),
        phase=jnp.asarray(phase),
        D_map=jnp.asarray(D_map, dtype),
        grain_id=jnp.asarray(grain_id),
        is_gb=jnp.asarray(is_gb),
        is_precip=jnp.asarray(is_precip),
    )
