"""Mesh-aware Pallas fast paths: shard_map wrappers with ICI halo exchange.

`pl.pallas_call` has no SPMD partitioning rule, so a sharded input would be
all-gathered per call (or fail to lower) — round-3's dispatch therefore
routed multi-device runs off the Pallas kernels entirely
(`pallas_kernels.pallas_applicable`), silently dropping a real multi-chip
run onto the slower XLA stencil paths end-to-end.

This module closes that gap the way the SPMD partitioner itself would:
each shard's block is EXACTLY the single-device kernel applied to its local
axial slab, plus `lax.ppermute` halo exchange of the mext(=m+1) boundary
layers over ICI — the PD horizon bounds the communication at a fixed-size
neighbor exchange per step (SURVEY §5 distributed-backend design). The
halo slabs are placed contiguously with the local interior inside the
kernels' alignment margins (`pallas_kernels._pad_aligned` /
`_flatten_3d` ``halo=``), so per-node arithmetic is bit-identical to the
single-device kernel.

Wrapped kernels:
* ``ns_step_sharded``      — 2D + 3D fused PD-NS bond kernel
* ``matvec_M_sharded``     — 2D + 3D fused GMRES stencil matvec
* ``finalize_op_sharded``  — per-shard weight-stack flattening (3D), the
  mesh twin of assemble's single-device ``flatten_W_3d`` precompute

Dispatch (`ns_step_auto` / `ops.ard_implicit.matvec_M`) picks these when
the kit carries a TPU mesh and the LOCAL slab passes the same geometry
gates as the single-device kernels; CPU meshes and odd geometries keep
the XLA stencil paths, which partition under SPMD automatically.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..fields import State
from ..grid import OUTSIDE
from .sharding import AXIS


# ---------------------------------------------------------------------------
# Local-geometry kit + halo exchange
# ---------------------------------------------------------------------------

def geom_kit(kit, local_shape):
    """A Kit whose STATIC metadata describes one shard's local slab.

    The Pallas kernel entry points consume only the kit's static geometry
    (shape/mext/offsets/dist/evec/vol/cfg); its array leaves are per-node
    masks the kernels never touch. Those leaves are replaced with empty
    host arrays so the geometry kit can be safely closed over inside a
    shard_map body (closing over the real kit would capture its sharded
    device arrays).
    """
    from ..kit import Kit

    meta = {f.name for f in dataclasses.fields(Kit)
            if f.name in Kit.__dataclass_fields__} & {
        "cfg", "dim", "shape", "mext", "offsets", "dist", "evec", "vol",
        "dtype", "inlet_rows", "outlet_rows", "mirror_group_offsets",
        "multi_device", "mesh"}
    kwargs = {}
    for f in dataclasses.fields(Kit):
        if f.name in meta:
            kwargs[f.name] = getattr(kit, f.name)
        else:
            kwargs[f.name] = np.zeros((0,), np.float32)
    kwargs["shape"] = tuple(local_shape)
    kwargs["multi_device"] = False
    kwargs["mesh"] = None
    return Kit(**kwargs)


def local_shape_of(kit):
    n = kit.mesh.shape[AXIS]
    return (kit.shape[0] // n,) + tuple(kit.shape[1:])


def halo_pair(a, m: int, n: int):
    """(lo, hi) = the m boundary layers of the axial-neighbor shards.

    lo = previous shard's last m leading-axis rows, hi = next shard's
    first m. End shards receive zeros (ppermute's no-source fill), which
    matches the single-device kernels' zero padding at the domain ends —
    the activity mask there is 0, so those bonds are masked identically.
    """
    lo = jax.lax.ppermute(a[-m:], AXIS, [(i, i + 1) for i in range(n - 1)])
    hi = jax.lax.ppermute(a[:m], AXIS, [(i + 1, i) for i in range(n - 1)])
    return lo, hi


def _state_pspecs(state: State) -> State:
    return jax.tree.map(lambda a: P(AXIS, *([None] * (a.ndim - 1))), state)


# ---------------------------------------------------------------------------
# Applicability gates
# ---------------------------------------------------------------------------

def _mesh_on_tpu(kit) -> bool:
    mesh = getattr(kit, "mesh", None)
    if mesh is None or not kit.multi_device:
        return False
    from ..pallas_kernels import FORCE_DISABLE
    if FORCE_DISABLE:
        return False
    if kit.shape[0] % mesh.shape[AXIS]:
        return False
    return all(d.platform == "tpu" for d in mesh.devices.flat)


def sharded_ns_applicable(kit) -> bool:
    if not _mesh_on_tpu(kit):
        return False
    from ..pallas_kernels import pallas_applicable, pallas_applicable_3d
    g = geom_kit(kit, local_shape_of(kit))
    return pallas_applicable(g) if kit.dim == 2 else pallas_applicable_3d(g)


def sharded_matvec_applicable(kit) -> bool:
    if not _mesh_on_tpu(kit):
        return False
    from ..pallas_kernels import matvec3d_applicable, matvec_applicable
    g = geom_kit(kit, local_shape_of(kit))
    return matvec_applicable(g) if kit.dim == 2 else matvec3d_applicable(g)


# ---------------------------------------------------------------------------
# PD-NS bond kernel over the mesh
# ---------------------------------------------------------------------------

def ns_step_sharded(state: State, kit, dt) -> State:
    """Per-shard fused NS kernel + mext-layer halo exchange over ICI."""
    from ..pallas_kernels import ns_step_pallas, ns_step_pallas_3d

    mesh = kit.mesh
    n = mesh.shape[AXIS]
    m = kit.mext
    geom = geom_kit(kit, local_shape_of(kit))
    specs = _state_pspecs(state)

    if kit.dim == 2:
        @partial(shard_map, mesh=mesh, in_specs=(specs, P()),
                 out_specs=specs, check_vma=False)
        def body2(st: State, dt_):
            act = (st.node_type != OUTSIDE).astype(jnp.float32)
            halo = {
                "rho": halo_pair(st.rho, m, n),
                "act": halo_pair(act, m, n),
                "vx": halo_pair(st.vel[..., 0], m, n),
                "vy": halo_pair(st.vel[..., 1], m, n),
            }
            return ns_step_pallas(st, geom, dt_, halo=halo)

        return body2(state, jnp.asarray(dt, jnp.float32))

    # 3D: the kernel's static act-convolutions (B2/B_d) must be the LOCAL
    # SLICE of the globally-precomputed kit.actconv3d — computing them
    # per shard would miss cross-shard bonds near the slab boundaries
    @partial(shard_map, mesh=mesh, in_specs=(specs, P(), P(None, AXIS)),
             out_specs=specs, check_vma=False)
    def body3(st: State, dt_, actconv):
        act = (st.node_type != OUTSIDE).astype(jnp.float32)
        halo = {
            "rho": halo_pair(st.rho, m, n),
            "act": halo_pair(act, m, n),
            "vx": halo_pair(st.vel[..., 0], m, n),
            "vy": halo_pair(st.vel[..., 1], m, n),
            "vz": halo_pair(st.vel[..., 2], m, n),
        }
        return ns_step_pallas_3d(st, geom, dt_, halo=halo, actconv=actconv)

    return body3(state, jnp.asarray(dt, jnp.float32), kit.actconv3d)


# ---------------------------------------------------------------------------
# Implicit-operator fast paths over the mesh
# ---------------------------------------------------------------------------

def _op_pspecs(op):
    """PartitionSpecs for an ImplicitOperator: slot-major stacks sharded on
    their axial axis (axis 1), per-node fields on axis 0. None fields are
    empty subtrees and need no spec."""
    def spec(path_a):
        name, a = path_a
        if name in ("W", "Wf", "Wf16"):
            return P(None, AXIS, *([None] * (a.ndim - 2)))
        return P(AXIS, *([None] * (a.ndim - 1)))

    return type(op)(**{
        f.name: (None if getattr(op, f.name) is None
                 else spec((f.name, getattr(op, f.name))))
        for f in dataclasses.fields(op)
    })


def finalize_op_sharded(op, kit):
    """3D: flatten the weight stack into the matvec kernel's lane layout
    PER SHARD (the mesh twin of assemble's flatten_W_3d precompute). The
    global result is [S_pad, n * nzb_local, Fr] sharded on its z axis —
    consumed only by matvec_M_sharded, which presents each shard's block
    to the single-device kernel core."""
    from ..pallas_kernels import flat3d_center, flatten_W_3d

    mesh = kit.mesh
    geom = geom_kit(kit, local_shape_of(kit))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS, None, None), P(AXIS, None, None),
                       P(AXIS, None, None)),
             out_specs=(P(None, AXIS, None), P(AXIS, None), P(AXIS, None)),
             check_vma=False)
    def body(W, diag, unknown):
        Wf = flatten_W_3d(W, geom)
        diag_f = flat3d_center(geom, diag.astype(jnp.float32))
        unk_f = flat3d_center(geom, unknown, False)
        return Wf, diag_f, unk_f

    Wf, diag_f, unk_f = body(op.W, op.diag, op.unknown)
    return dataclasses.replace(op, Wf=Wf, diag_f=diag_f, unk_f=unk_f,
                               Wf16=None)


def matvec_M_sharded(op, kit, x):
    """Per-shard fused stencil matvec + halo exchange of x. W/diag/unknown
    are center-row quantities (no halo); only x's mext boundary layers
    cross shard boundaries."""
    from ..pallas_kernels import matvec_M_pallas, matvec_M_pallas_3d

    mesh = kit.mesh
    n = mesh.shape[AXIS]
    m = kit.mext
    geom = geom_kit(kit, local_shape_of(kit))
    xspec = P(AXIS, *([None] * (x.ndim - 1)))

    @partial(shard_map, mesh=mesh, in_specs=(_op_pspecs(op), xspec),
             out_specs=xspec, check_vma=False)
    def body(op_l, x_l):
        halo = halo_pair(x_l, m, n)
        if kit.dim == 2:
            return matvec_M_pallas(op_l, geom, x_l, halo=halo)
        return matvec_M_pallas_3d(op_l, geom, x_l, halo=halo)

    return body(op, x)
