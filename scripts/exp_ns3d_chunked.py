"""Experiment: chunked-grid 3D NS bond kernel (round-4 VERDICT #3).

Three prior attacks on the 3D NS kernel (momentum-convection factoring,
window trim, _PRZ=4) all died on Mosaic VMEM liveness: the unrolled
178-slot body gives the scheduler freedom to keep many groups' rolled
windows live at once, and jax.lax.optimization_barrier is not implemented
in the Pallas TPU lowering (verified on jax 0.9.0), so scheduling hints
are unavailable.

This restructures instead of re-layouting: a second (minor) grid
dimension iterates over CHUNKS of stencil groups. Accumulators persist in
VMEM scratch across chunk steps (standard Pallas accumulation pattern);
the field windows are DMA'd once per z-block at chunk 0 and also persist
in scratch. Each grid program now compiles only ~1/NCHUNK of the slot
body, so the register allocator's live set is bounded BY CONSTRUCTION —
which also makes the previously-liveness-blocked momentum-convection
factoring and larger _BZ viable.

Usage: python scripts/exp_ns3d_chunked.py [dx] [--check]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)  # match cli.py

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pd_mg_pin_corrosion_tpu.fields import State
from pd_mg_pin_corrosion_tpu.grid import FLUID, OUTSIDE
from pd_mg_pin_corrosion_tpu.kit import Kit
from pd_mg_pin_corrosion_tpu.ops.ns import tait_pressure

_PRZ = 8


def _geom(kit: Kit, BZ: int):
    nz, ny, nx = kit.shape
    mx = kit.mext
    nxp = nx + 2 * mx
    F = ny * nxp
    Fr = -(-F // 128) * 128
    pcf = -(-(kit.mext * nxp + kit.mext) // 128) * 128
    cols = pcf + Fr + pcf
    nzb = -(-nz // BZ) * BZ
    rows = nzb + 2 * _PRZ
    return nz, ny, nx, mx, nxp, F, Fr, pcf, cols, nzb, rows


def _group_chunks(kit: Kit, nchunk: int):
    """Contiguous split of the (dj,di) groups into nchunk chunks, balanced
    by slot count (groups carry 1..2*mext+1 slots each)."""
    groups = {}
    for s, xi, e_ij, vol in kit.bond_iter():
        dk, dj, di = kit.offsets[s]
        groups.setdefault((dj, di), []).append((dk, float(xi), tuple(map(float, e_ij)), float(vol)))
    items = list(groups.items())
    total = sum(len(v) for _, v in items)
    per = total / nchunk
    chunks, cur, acc = [], [], 0.0
    for it in items:
        cur.append(it)
        acc += len(it[1])
        if acc >= per * (len(chunks) + 1) and len(chunks) < nchunk - 1:
            chunks.append(cur)
            cur = []
    chunks.append(cur)
    assert len(chunks) == nchunk and sum(len(c) for c in chunks) == len(items)
    return chunks


def _ns_kernel_chunked(kit: Kit, BZ: int, chunks, factored: bool,
                       nzb: int, Fr: int, pcf: int,
                       dt_ref, rho_ref, vx_ref, vy_ref, vz_ref, act_ref,
                       fl_ref,
                       rho_out, vx_out, vy_out, vz_out,
                       rho_s, vx_s, vy_s, vz_s, act_s, p_s, acc_ref, sems):
    cfg = kit.cfg
    nxp = kit.shape[2] + 2 * kit.mext
    nchunk = len(chunks)
    i = pl.program_id(0)
    c = pl.program_id(1)
    row0 = i * np.int32(BZ)
    win = BZ + 2 * _PRZ

    @pl.when(c == 0)
    def _prologue():
        copies = []
        for k, (hbm, scr) in enumerate(
                [(rho_ref, rho_s), (vx_ref, vx_s), (vy_ref, vy_s),
                 (vz_ref, vz_s), (act_ref, act_s)]):
            dma = pltpu.make_async_copy(hbm.at[pl.ds(row0, win), :], scr,
                                        sems.at[k])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        B = cfg.rho_f * cfg.c0 * cfg.c0 / cfg.gamma_eos
        ratio = jnp.clip(rho_s[...] / cfg.rho_f, 0.5, 2.0)
        p_s[...] = B * (jnp.power(ratio, cfg.gamma_eos) - 1.0)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def center(a):
        return a[_PRZ:_PRZ + BZ, pcf:pcf + Fr]

    jconv = factored == "jconv"

    for cc, chunk in enumerate(chunks):
        @pl.when(c == cc)
        def _chunk(chunk=chunk):
            w = {
                "rho": rho_s[...],
                "vx": vx_s[...],
                "vy": vy_s[...],
                "vz": vz_s[...],
                "act": act_s[...],
                "p": p_s[...],
            }
            rho_i = center(w["rho"])
            v_i = [center(w["vx"]), center(w["vy"]), center(w["vz"])]
            p_i = center(w["p"])
            if factored is True:
                m_i = [rho_i * v_i[d] for d in range(3)]

            zero = jnp.zeros((BZ, Fr), jnp.float32)
            if jconv:
                # j-side-only accumulations; center corrections applied
                # once at finalize (see _finalize)
                A_mass = zero
                A_diff = zero
                B2 = zero
                B = [zero, zero, zero]
                A_conv = [zero, zero, zero]
                A_pres = [zero, zero, zero]
                A_visc = [zero, zero, zero]
            else:
                mass_conv = zero
                mass_diff = zero
                mom_conv = [zero, zero, zero]
                mom_pres = [zero, zero, zero]
                mom_visc = [zero, zero, zero]

            for (dj, di), slots in chunk:
                f = dj * nxp + di
                lw = {
                    key: (pltpu.roll(a, np.int32((-f) % a.shape[1]), 1)
                          if f else a)
                    for key, a in w.items()
                }

                for dk, xi, e_ij, vol in slots:
                    def sh(key):
                        return lw[key][_PRZ + dk:_PRZ + dk + BZ,
                                       pcf:pcf + Fr]

                    act_j = sh("act")
                    rho_j = sh("rho")
                    v_j = [sh("vx"), sh("vy"), sh("vz")]
                    p_j = sh("p")

                    c1 = vol / xi
                    c2 = vol / (xi * xi)

                    if jconv:
                        et = [e_ij[d] * c1 for d in range(3)]
                        w2 = c2 * act_j
                        B2 += w2
                        u = [None] * 3
                        fdj = None
                        for d in range(3):
                            if e_ij[d] != 0.0:
                                u[d] = et[d] * act_j
                                B[d] += u[d]
                                t = (rho_j * v_j[d]) * et[d]
                                fdj = t if fdj is None else fdj + t
                        fdjw = fdj * act_j
                        A_mass += fdjw
                        A_diff += rho_j * w2
                        for d in range(3):
                            A_conv[d] += v_j[d] * fdjw
                            if u[d] is not None:
                                A_pres[d] += p_j * u[d]
                            A_visc[d] += v_j[d] * w2
                    elif factored:
                        # mom-convection factoring: conv_d =
                        # v_jd*(e.m_j) - v_id*(e.m_i), with c1 folded
                        # into the per-slot e scalars
                        et = [e_ij[d] * c1 for d in range(3)]
                        fdj = fdi = None
                        for d in range(3):
                            if e_ij[d] != 0.0:
                                tj = (rho_j * v_j[d]) * et[d]
                                ti = m_i[d] * et[d]
                                fdj = tj if fdj is None else fdj + tj
                                fdi = ti if fdi is None else fdi + ti
                        mass_conv += (fdj - fdi) * act_j
                        w2 = c2 * act_j
                        mass_diff += (rho_j - rho_i) * w2
                        dpw = (p_j - p_i) * act_j
                        for d in range(3):
                            mom_conv[d] += (v_j[d] * fdj
                                            - v_i[d] * fdi) * act_j
                            if e_ij[d] != 0.0:
                                mom_pres[d] += dpw * et[d]
                            mom_visc[d] += (v_j[d] - v_i[d]) * w2
                    else:
                        V_j = vol * act_j
                        inv_xi = 1.0 / xi
                        inv_xi2 = inv_xi * inv_xi
                        fd = None
                        for d in range(3):
                            if e_ij[d] != 0.0:
                                t = (rho_j * v_j[d]
                                     - rho_i * v_i[d]) * e_ij[d]
                                fd = t if fd is None else fd + t
                        mass_conv += fd * inv_xi * V_j
                        mass_diff += (rho_j - rho_i) * inv_xi2 * V_j
                        for d in range(3):
                            conv_d = None
                            for dp in range(3):
                                if e_ij[dp] != 0.0:
                                    t = (rho_j * v_j[d] * v_j[dp]
                                         - rho_i * v_i[d] * v_i[dp]) \
                                        * e_ij[dp]
                                    conv_d = t if conv_d is None else conv_d + t
                            mom_conv[d] += conv_d * inv_xi * V_j
                            if e_ij[d] != 0.0:
                                mom_pres[d] += (p_j - p_i) * e_ij[d] \
                                    * inv_xi * V_j
                            mom_visc[d] += (v_j[d] - v_i[d]) * inv_xi2 * V_j

            if jconv:
                accs = [A_mass, A_diff, B2] + B + A_conv + A_pres + A_visc
            else:
                accs = [mass_conv, mass_diff] + mom_conv + mom_pres + mom_visc
            for k, a in enumerate(accs):
                acc_ref[k] += a

    @pl.when(c == nchunk - 1)
    def _finalize():
        rho_i = center(rho_s[...])
        v_i = [center(vx_s[...]), center(vy_s[...]), center(vz_s[...])]

        dt = dt_ref[0, 0]
        a_inv_VH = kit.alpha / kit.V_H
        D_v = cfg.eta_density * cfg.c0 * cfg.delta
        dens_coeff = kit.beta_lap * D_v

        if jconv:
            p_i = center(p_s[...])
            m_i = [rho_i * v_i[d] for d in range(3)]
            B = [acc_ref[3 + d] for d in range(3)]
            B2 = acc_ref[2]
            F_i = m_i[0] * B[0] + m_i[1] * B[1] + m_i[2] * B[2]
            mass_conv = acc_ref[0] - F_i
            mass_diff = acc_ref[1] - rho_i * B2
            mom_conv = [acc_ref[6 + d] - v_i[d] * F_i for d in range(3)]
            mom_pres = [acc_ref[9 + d] - p_i * B[d] for d in range(3)]
            mom_visc = [acc_ref[12 + d] - v_i[d] * B2 for d in range(3)]
        else:
            mass_conv = acc_ref[0]
            mass_diff = acc_ref[1]
            mom_conv = [acc_ref[2 + d] for d in range(3)]
            mom_pres = [acc_ref[5 + d] for d in range(3)]
            mom_visc = [acc_ref[8 + d] for d in range(3)]

        rho_new = rho_i + dt * (-a_inv_VH * mass_conv
                                + dens_coeff * mass_diff)
        rho_new = jnp.clip(rho_new, 0.5 * cfg.rho_f, 2.0 * cfg.rho_f)

        inv_rho = 1.0 / rho_i
        v_new = [
            v_i[d] + dt * inv_rho * (
                -a_inv_VH * (mom_conv[d] + mom_pres[d])
                + cfg.mu_f * kit.beta_lap * mom_visc[d]
            )
            for d in range(3)
        ]

        fluid = fl_ref[...]
        rho_out[...] = jnp.where(fluid, rho_new, rho_i)
        vx_out[...] = jnp.where(fluid, v_new[0], v_i[0])
        vy_out[...] = jnp.where(fluid, v_new[1], v_i[1])
        vz_out[...] = jnp.where(fluid, v_new[2], v_i[2])


def _flatten_3d(a, kit: Kit, BZ, nzb, Fr, pcf, fill=0.0):
    nz, ny, nx = kit.shape
    mx = kit.mext
    a = jnp.pad(a, ((0, 0), (0, 0), (mx, mx)), constant_values=fill)
    a = a.reshape(nz, ny * (nx + 2 * mx))
    return jnp.pad(a, ((_PRZ, _PRZ + nzb - nz), (pcf, pcf + Fr - a.shape[1])),
                   constant_values=fill)


@functools.partial(jax.jit, static_argnames=("BZ", "NCHUNK", "factored"))
def ns_step_chunked(state: State, kit: Kit, dt, BZ=16, NCHUNK=6,
                    factored=True):
    nz, ny, nx, mx, nxp, F, Fr, pcf, cols, nzb, rows = _geom(kit, BZ)
    chunks = _group_chunks(kit, NCHUNK)

    pressure = tait_pressure(state.rho, kit)
    args = [
        _flatten_3d(state.rho, kit, BZ, nzb, Fr, pcf),
        _flatten_3d(state.vel[..., 0], kit, BZ, nzb, Fr, pcf),
        _flatten_3d(state.vel[..., 1], kit, BZ, nzb, Fr, pcf),
        _flatten_3d(state.vel[..., 2], kit, BZ, nzb, Fr, pcf),
        _flatten_3d((state.node_type != OUTSIDE).astype(jnp.float32),
                    kit, BZ, nzb, Fr, pcf),
    ]
    fl = jnp.pad(state.node_type == FLUID, ((0, 0), (0, 0), (mx, mx)),
                 constant_values=False).reshape(nz, F)
    fl = jnp.pad(fl, ((0, nzb - nz), (0, Fr - F)), constant_values=False)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)

    kernel = functools.partial(_ns_kernel_chunked, kit, BZ, chunks, factored,
                               nzb, Fr, pcf)
    out_shape = [jax.ShapeDtypeStruct((nzb, Fr), jnp.float32)] * 4

    win = BZ + 2 * _PRZ
    with jax.enable_x64(False):
        rho_new, vx, vy, vz = pl.pallas_call(
            kernel,
            grid=(nzb // BZ, NCHUNK),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * 5
            + [pl.BlockSpec((BZ, Fr), lambda i, c: (i, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((BZ, Fr), lambda i, c: (i, 0),
                                    memory_space=pltpu.VMEM)] * 4,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((win, cols), jnp.float32)] * 6
            + [pltpu.VMEM((15 if factored == "jconv" else 11, BZ, Fr),
                          jnp.float32)]
            + [pltpu.SemaphoreType.DMA((5,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(dt_arr, *args, fl)

    def unflatten(a):
        return a[:nz, :F].reshape(nz, ny, nxp)[:, :, mx:mx + nx]

    from dataclasses import replace
    vel_new = jnp.stack([unflatten(vx), unflatten(vy), unflatten(vz)],
                        axis=-1)
    return replace(state, rho=unflatten(rho_new), vel=vel_new,
                   pressure=pressure)


# ---------------------------------------------------------------------------
# "jstat" variant: act is STATIC (OUTSIDE never changes; dissolution flips
# SOLID->FLUID, both active) and masks are idempotent (act^2 == act), so
# (a) fields are pre-masked XLA-side (rho*act, v*act, Tait(rho)*act),
# (b) the pure-act convolutions B2 = sum_s c2_s act_j, B_d = sum_s et_d
#     act_j are precomputed ONCE per geometry and passed as inputs,
# (c) the kernel loses the act window (5 rolls/group instead of 6) and
#     every per-slot act multiplication, and
# (d) Tait + the fluid select move out of the kernel entirely.
# ---------------------------------------------------------------------------


def compute_actconv(kit: Kit, node_type) -> jax.Array:
    """[4, Nz, Ny, Nx] f32: (B2, Bx, By, Bz) pure-act stencil convolutions."""
    act = (node_type != OUTSIDE).astype(jnp.float32)
    mx = kit.mext
    ap = jnp.pad(act, ((mx, mx), (mx, mx), (mx, mx)))
    nz, ny, nx = kit.shape
    B2 = jnp.zeros((nz, ny, nx), jnp.float32)
    B = [B2, B2, B2]
    for s, xi, e_ij, vol in kit.bond_iter():
        dk, dj, di = kit.offsets[s]
        a_s = ap[mx + dk:mx + dk + nz, mx + dj:mx + dj + ny,
                 mx + di:mx + di + nx]
        c1 = vol / xi
        c2 = vol / (xi * xi)
        B2 = B2 + c2 * a_s
        for d in range(3):
            if e_ij[d] != 0.0:
                B[d] = B[d] + (e_ij[d] * c1) * a_s
    return jnp.stack([B2] + B)


def _ns_kernel_jstat(kit: Kit, BZ: int, chunks, nzb: int, Fr: int, pcf: int,
                     dt_ref, rho_ref, vx_ref, vy_ref, vz_ref, p_ref,
                     b2_ref, bx_ref, by_ref, bz_ref,
                     rho_out, vx_out, vy_out, vz_out,
                     rho_s, vx_s, vy_s, vz_s, p_s, acc_ref, sems):
    cfg = kit.cfg
    nxp = kit.shape[2] + 2 * kit.mext
    nchunk = len(chunks)
    i = pl.program_id(0)
    c = pl.program_id(1)
    row0 = i * np.int32(BZ)
    win = BZ + 2 * _PRZ

    @pl.when(c == 0)
    def _prologue():
        copies = []
        for k, (hbm, scr) in enumerate(
                [(rho_ref, rho_s), (vx_ref, vx_s), (vy_ref, vy_s),
                 (vz_ref, vz_s), (p_ref, p_s)]):
            dma = pltpu.make_async_copy(hbm.at[pl.ds(row0, win), :], scr,
                                        sems.at[k])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def center(a):
        return a[_PRZ:_PRZ + BZ, pcf:pcf + Fr]

    for cc, chunk in enumerate(chunks):
        @pl.when(c == cc)
        def _chunk(chunk=chunk):
            w = {
                "rho": rho_s[...],
                "vx": vx_s[...],
                "vy": vy_s[...],
                "vz": vz_s[...],
                "p": p_s[...],
            }
            zero = jnp.zeros((BZ, Fr), jnp.float32)
            A_mass = zero
            A_diff = zero
            A_conv = [zero, zero, zero]
            A_pres = [zero, zero, zero]
            A_visc = [zero, zero, zero]

            for (dj, di), slots in chunk:
                f = dj * nxp + di
                lw = {
                    key: (pltpu.roll(a, np.int32((-f) % a.shape[1]), 1)
                          if f else a)
                    for key, a in w.items()
                }

                for dk, xi, e_ij, vol in slots:
                    def sh(key):
                        return lw[key][_PRZ + dk:_PRZ + dk + BZ,
                                       pcf:pcf + Fr]

                    rho_j = sh("rho")
                    v_j = [sh("vx"), sh("vy"), sh("vz")]
                    p_j = sh("p")

                    c1 = vol / xi
                    c2 = vol / (xi * xi)
                    et = [e_ij[d] * c1 for d in range(3)]

                    fdj = None
                    for d in range(3):
                        if e_ij[d] != 0.0:
                            t = (rho_j * v_j[d]) * et[d]
                            fdj = t if fdj is None else fdj + t
                    A_mass += fdj
                    A_diff += rho_j * c2
                    for d in range(3):
                        A_conv[d] += v_j[d] * fdj
                        if e_ij[d] != 0.0:
                            A_pres[d] += p_j * et[d]
                        A_visc[d] += v_j[d] * c2

            accs = [A_mass, A_diff] + A_conv + A_pres + A_visc
            for k, a in enumerate(accs):
                acc_ref[k] += a

    @pl.when(c == nchunk - 1)
    def _finalize():
        rho_i = center(rho_s[...])
        v_i = [center(vx_s[...]), center(vy_s[...]), center(vz_s[...])]
        p_i = center(p_s[...])

        dt = dt_ref[0, 0]
        a_inv_VH = kit.alpha / kit.V_H
        D_v = cfg.eta_density * cfg.c0 * cfg.delta
        dens_coeff = kit.beta_lap * D_v

        B2 = b2_ref[...]
        B = [bx_ref[...], by_ref[...], bz_ref[...]]
        m_i = [rho_i * v_i[d] for d in range(3)]
        F_i = m_i[0] * B[0] + m_i[1] * B[1] + m_i[2] * B[2]
        mass_conv = acc_ref[0] - F_i
        mass_diff = acc_ref[1] - rho_i * B2
        mom_conv = [acc_ref[2 + d] - v_i[d] * F_i for d in range(3)]
        mom_pres = [acc_ref[5 + d] - p_i * B[d] for d in range(3)]
        mom_visc = [acc_ref[8 + d] - v_i[d] * B2 for d in range(3)]

        rho_new = rho_i + dt * (-a_inv_VH * mass_conv
                                + dens_coeff * mass_diff)
        rho_new = jnp.clip(rho_new, 0.5 * cfg.rho_f, 2.0 * cfg.rho_f)

        inv_rho = 1.0 / rho_i
        v_new = [
            v_i[d] + dt * inv_rho * (
                -a_inv_VH * (mom_conv[d] + mom_pres[d])
                + cfg.mu_f * kit.beta_lap * mom_visc[d]
            )
            for d in range(3)
        ]
        rho_out[...] = rho_new
        vx_out[...] = v_new[0]
        vy_out[...] = v_new[1]
        vz_out[...] = v_new[2]


@functools.partial(jax.jit, static_argnames=("BZ", "NCHUNK"))
def ns_step_jstat(state: State, kit: Kit, dt, actconv, BZ=8, NCHUNK=2):
    nz, ny, nx, mx, nxp, F, Fr, pcf, cols, nzb, rows = _geom(kit, BZ)
    chunks = _group_chunks(kit, NCHUNK)

    pressure = tait_pressure(state.rho, kit)
    act = (state.node_type != OUTSIDE).astype(jnp.float32)
    args = [
        _flatten_3d(state.rho * act, kit, BZ, nzb, Fr, pcf),
        _flatten_3d(state.vel[..., 0] * act, kit, BZ, nzb, Fr, pcf),
        _flatten_3d(state.vel[..., 1] * act, kit, BZ, nzb, Fr, pcf),
        _flatten_3d(state.vel[..., 2] * act, kit, BZ, nzb, Fr, pcf),
        _flatten_3d(pressure * act, kit, BZ, nzb, Fr, pcf),
    ]

    def centerize(a):
        a = jnp.pad(a, ((0, 0), (0, 0), (mx, mx)))
        a = a.reshape(nz, ny * nxp)
        return jnp.pad(a, ((0, nzb - nz), (0, Fr - ny * nxp)))

    bargs = [centerize(actconv[k]) for k in range(4)]
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)

    kernel = functools.partial(_ns_kernel_jstat, kit, BZ, chunks,
                               nzb, Fr, pcf)
    out_shape = [jax.ShapeDtypeStruct((nzb, Fr), jnp.float32)] * 4

    win = BZ + 2 * _PRZ
    blk = pl.BlockSpec((BZ, Fr), lambda i, c: (i, 0),
                       memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        rho_new, vx, vy, vz = pl.pallas_call(
            kernel,
            grid=(nzb // BZ, NCHUNK),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * 5
            + [blk] * 4,
            out_specs=[blk] * 4,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((win, cols), jnp.float32)] * 5
            + [pltpu.VMEM((11, BZ, Fr), jnp.float32)]
            + [pltpu.SemaphoreType.DMA((5,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(dt_arr, *args, *bargs)

    def unflatten(a):
        return a[:nz, :F].reshape(nz, ny, nxp)[:, :, mx:mx + nx]

    from dataclasses import replace
    fluid = state.node_type == FLUID
    vel_new = jnp.stack(
        [jnp.where(fluid, unflatten(v), state.vel[..., d])
         for d, v in enumerate([vx, vy, vz])], axis=-1)
    return replace(state, rho=jnp.where(fluid, unflatten(rho_new), state.rho),
                   vel=vel_new, pressure=pressure)


def sync(x):
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "dtype"):
            float(jnp.sum(a.astype(jnp.float32)))


def timeit(label, fn, *args, reps=3, inner=150):
    @jax.jit
    def run(s):
        def body(_, ss):
            return fn(ss)
        return jax.lax.fori_loop(0, inner, body, s)

    t0 = time.time()
    out = run(*args)
    sync(out)
    print(f"{label:40s} compile+1st {time.time() - t0:7.1f} s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = run(*args)
        sync(out)
        best = min(best, (time.time() - t0) / inner)
    print(f"{label:40s} {best * 1e3:8.3f} ms/step", flush=True)
    return best


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0e-6
    from pd_mg_pin_corrosion_tpu import pallas_kernels as pk
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt

    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = dx
    cfg.precision = "f32"
    cfg.compute_derived()

    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)
    print(f"grid {grid.shape} N={grid.N_total} S={grid.stencil.size}",
          flush=True)
    dt = compute_dt(state, kit)

    # correctness: compare one step against the production kernel
    ref = pk.ns_step_pallas_3d(state, kit, dt)
    base = timeit("production ns_step_pallas_3d",
                  lambda s: pk.ns_step_pallas_3d(s, kit, dt), state)
    variants = [(8, 4, True), (16, 4, True), (16, 8, True),
                (32, 8, True), (16, 4, False)]
    results = {}
    for bz, nch, fac in variants:
        label = f"chunked BZ={bz} NCHUNK={nch} fac={int(fac)}"
        try:
            out = ns_step_chunked(state, kit, dt, BZ=bz, NCHUNK=nch,
                                  factored=fac)
            dr = float(jnp.max(jnp.abs(out.rho - ref.rho))
                       / jnp.max(jnp.abs(ref.rho)))
            dv = float(jnp.max(jnp.abs(out.vel - ref.vel))
                       / jnp.max(jnp.abs(ref.vel)))
            print(f"{label:40s} max rel drho={dr:.2e} dvel={dv:.2e}",
                  flush=True)
            if dr > 1e-4 or dv > 1e-4:
                print(f"{label:40s} MISMATCH — skipping timing", flush=True)
                continue
            results[label] = timeit(
                label, lambda s, bz=bz, nch=nch, fac=fac: ns_step_chunked(
                    s, kit, dt, BZ=bz, NCHUNK=nch, factored=fac), state)
        except Exception as e:
            print(f"{label:40s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    print("\n=== summary (ms/step) ===")
    print(f"{'production':40s} {base * 1e3:8.3f}")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"{k:40s} {v * 1e3:8.3f}  ({base / v:4.2f}x)")


if __name__ == "__main__":
    main()
