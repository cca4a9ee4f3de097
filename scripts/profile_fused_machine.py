"""Isolate the per-step cost of the two fused implicit loops at flagship
scale: implicit_inner_chunk (op closed over as a jit argument; the
host-driven-cycles production path) vs coupled_cycles_chunk (op carried
through the micro-op while/switch; the fused-cycles path), on IDENTICAL
work — 50 implicit steps, no flow, no dissolution, no phase change.

Motivation: run B (round 5) sustained ~95-105 ms/implicit step inside
coupled_cycles_chunk while the round-3 artifact sustained 74.6 ms inside
implicit_inner_chunk and BENCH_r04 measures 88.6 ms isolated. If the
micro-op machine pays a per-step tax (e.g. XLA copying the carried
operator across the switch), the flagship headline should use the
host-driven-cycles configuration instead.

Usage: python scripts/profile_fused_machine.py  (TPU host, alone)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from pd_mg_pin_corrosion_tpu import coupling as cp
    from pd_mg_pin_corrosion_tpu.config import Config
    from pd_mg_pin_corrosion_tpu.fields import initialize_state
    from pd_mg_pin_corrosion_tpu.grid import build_grid
    from pd_mg_pin_corrosion_tpu.kit import build_kit
    from pd_mg_pin_corrosion_tpu.ops import ard_implicit as ai

    cfg = Config.load("config/params_3d.cfg")
    cfg.precision = "f32"
    cfg.output_dir = "/tmp/profile_fused"
    cfg.compute_derived()

    grid = build_grid(cfg)
    kit = build_kit(grid, cfg)
    state = initialize_state(grid, cfg, dtype=kit.jdtype)

    op = jax.jit(lambda s: ai.assemble(s, kit))(state)
    float(jnp.sum(op.diag.astype(jnp.float32)))  # fence

    N = 50
    big = jnp.asarray(2**30, jnp.int32)
    T_inf = 1e18

    def fence(st):
        return float(jnp.sum(st.C.astype(jnp.float32)))

    # --- A: implicit_inner_chunk (host-driven-cycles path) ---
    # statics match the production call (max_steps=corrosion_steps_per_check
    # =200) so the flagship compile cache is reused; launch_cap=N bounds the
    # actual work (dynamic, same as production's deadline cap)
    def run_chunk():
        out = cp.implicit_inner_chunk(
            state, op, kit, 0.0, 0, T_inf, big, 1, 200,
            launch_cap=jnp.asarray(N, jnp.int32))
        fence(out[0])
        return int(out[2])

    k = run_chunk()  # compile + warm
    assert k == N, k
    best_a = min((lambda t0=time.perf_counter(): (run_chunk(),
                  time.perf_counter() - t0)[1])() for _ in range(3))
    ms_a = best_a / N * 1e3
    print(f"implicit_inner_chunk:  {ms_a:7.1f} ms/step ({N} steps)",
          flush=True)

    # --- B: coupled_cycles_chunk (micro-op machine), same 50 steps ---
    # statics match the production call (max_cycles=coupled_fused_cycles=8,
    # max_inner=200, flow_cap=flow_max_iters_resolve=2000) for cache reuse;
    # step_cap=N (dynamic) bounds the work, need_flow0=False and a huge
    # batch keep the flow/phase-change micro-ops from firing
    def run_machine():
        out = cp.coupled_cycles_chunk(
            state, kit, op, 0.0, 0, T_inf, big, 1,
            jnp.asarray(False),                      # need_flow0
            8, 200, 2000,                            # max_cycles/inner/flow_cap
            phase0=jnp.asarray(cp._PH_INNER, jnp.int32),
            step_cap=jnp.asarray(N, jnp.int32))
        fence(out["state"])
        return int(out["steps"])

    k = run_machine()
    assert k == N, k
    best_b = min((lambda t0=time.perf_counter(): (run_machine(),
                  time.perf_counter() - t0)[1])() for _ in range(3))
    ms_b = best_b / N * 1e3
    print(f"coupled_cycles_chunk:  {ms_b:7.1f} ms/step ({N} steps)",
          flush=True)

    print(json.dumps({
        "inner_chunk_ms_per_step": round(ms_a, 2),
        "micro_op_machine_ms_per_step": round(ms_b, 2),
        "machine_overhead_ms": round(ms_b - ms_a, 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
