"""Real-TPU lowering proof for the shard_map'd Pallas fast paths.

tests/test_shard_kernels.py pins the mesh plumbing (ppermute halos,
per-shard geometry, local weight flattening) on a virtual 8-device CPU mesh
— but there the kernels run through the Pallas INTERPRETER. This script
runs the same wrapped kernels (parallel/shard_kernels.py) on a Mesh over
the real TPU chip(s) with Mosaic lowering ON, and asserts bitwise equality
with the single-device kernels: with zero ppermute halos at the domain ends
and the halo slabs placed inside the kernels' alignment margins, each
shard's arithmetic is the single-device kernel's, so any difference at all
is a lowering bug.

Usage:  python scripts/validate_shard_tpu.py      (on the TPU host)

Exercised: ns_step_sharded (2D + 3D), matvec_M_sharded (2D + 3D incl.
finalize_op_sharded). Exit code 0 = all bitwise-equal.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# Sizes chosen so the PER-SHARD slab clears the kernels' ~100k-node
# performance gates (pallas_applicable*) on a 1-device mesh — the same
# gates a real multi-chip run must clear per shard.

def _cfg_2d():
    from pd_mg_pin_corrosion_tpu import Config
    cfg = Config()
    cfg.dx = 1.25e-6
    cfg.R_wire = 40e-6
    cfg.L_wire = 400e-6
    cfg.R_tube = 150e-6
    cfg.L_upstream = 100e-6
    cfg.L_downstream = 100e-6
    cfg.precision = "f32"
    return cfg.compute_derived()


def _cfg_3d():
    from pd_mg_pin_corrosion_tpu import Config
    cfg = Config.load("config/params_3d.cfg")
    cfg.dx = 8e-6
    cfg.output_dir = "/tmp/validate_shard"
    cfg.precision = "f32"
    return cfg.compute_derived()


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    # same persistent compile cache as cli.py — without it the big solve
    # graphs recompile from scratch (~minutes each) and poison wall timings
    cache_dir = os.environ.get("PD_TPU_CACHE",
                               os.path.expanduser("~/.pd_tpu_jit_cache"))
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        print("SKIP: no TPU devices visible")
        return 0

    from pd_mg_pin_corrosion_tpu import build_grid, build_kit, initialize_state
    from pd_mg_pin_corrosion_tpu import pallas_kernels as pk
    from pd_mg_pin_corrosion_tpu.grid import pad_grid_axial
    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai
    from pd_mg_pin_corrosion_tpu.ops.ns import compute_dt
    from pd_mg_pin_corrosion_tpu.parallel import shard_kernels as sk
    from pd_mg_pin_corrosion_tpu.parallel.sharding import (make_mesh,
                                                           shard_kit,
                                                           shard_state)

    n_mesh = len(tpus)
    failures = []

    def setup(cfg):
        grid = pad_grid_axial(build_grid(cfg), n_mesh)
        kit = build_kit(grid, cfg)
        state = initialize_state(grid, cfg, dtype=jnp.float32)
        mesh = make_mesh(n_mesh, devices=tpus)
        kit_sh = shard_kit(kit, mesh)
        state_sh = shard_state(state, mesh)
        print(f"  setup done: shape {kit.shape}", flush=True)
        return kit, state, kit_sh, state_sh

    def check(name, out, ref):
        out, ref = np.asarray(out), np.asarray(ref)
        if np.array_equal(out, ref):
            print(f"  {name}: bitwise-equal OK")
        else:
            bad = np.sum(out != ref)
            failures.append(name)
            print(f"  {name}: MISMATCH ({bad}/{ref.size} elements, "
                  f"max |d|={np.max(np.abs(out - ref)):.3e})")

    for dim, mkcfg in ((2, _cfg_2d), (3, _cfg_3d)):
        cfg = mkcfg()
        kit, state, kit_sh, state_sh = setup(cfg)
        assert sk.sharded_ns_applicable(kit_sh), f"{dim}D NS gate closed"
        assert sk.sharded_matvec_applicable(kit_sh), f"{dim}D matvec gate closed"
        print(f"{dim}D on a {n_mesh}-device TPU mesh "
              f"(shape {kit.shape}, Mosaic lowering ON):")

        dt = float(jax.jit(compute_dt)(state, kit))
        print(f"  dt computed ({dt:.3e}); compiling single-device NS kernel...",
              flush=True)
        ref = (pk.ns_step_pallas(state, kit, dt) if dim == 2
               else pk.ns_step_pallas_3d(state, kit, dt))
        np.asarray(ref.rho)  # fence the reference kernel
        print("  single-device NS done; compiling sharded NS kernel...",
              flush=True)
        out = sk.ns_step_sharded(state_sh, kit_sh, dt)
        check(f"ns_step_sharded_{dim}d.rho", out.rho, ref.rho)
        check(f"ns_step_sharded_{dim}d.vel", out.vel, ref.vel)

        print("  assembling implicit operator...", flush=True)
        op = jax.jit(ai.assemble)(state, kit, 0.1)
        x = (state.C + 0.3 * kit.v_pois.astype(jnp.float32))
        # single-device reference through the same Pallas kernels
        # (ai.matvec_M dispatches to them on one TPU device)
        ref_mv = ai.matvec_M(op, kit, x)
        op_sh = jax.jit(ai.assemble)(state_sh, kit_sh, 0.1)
        if dim == 3 and op_sh.Wf is None:
            op_sh = sk.finalize_op_sharded(op_sh, kit_sh)
        out_mv = sk.matvec_M_sharded(op_sh, kit_sh, x)
        check(f"matvec_M_sharded_{dim}d", out_mv, ref_mv)

    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("All shard_map'd Pallas kernels lowered and ran bitwise-equal "
          "on real TPU.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
