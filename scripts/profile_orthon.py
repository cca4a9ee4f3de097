"""Micro-benchmark of Arnoldi orthogonalization variants at the flagship
3D shape ((157, 82, 82) f32 basis, m=25): sequential MGS2, CGS2 with f64
scalar accumulation, CGS2 with f32 accumulation, and the supporting
reductions — to pick the cheapest form that keeps the f64-scalar accuracy
contract of ops/gmres.py.

Usage: python scripts/profile_orthon.py [nz ny nx]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def sync(x):
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "dtype"):
            float(jnp.sum(a.astype(jnp.float32)))


def timeit(label, fn, *args, reps=10, rounds=3):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{label:46s} {best * 1e3:9.3f} ms", flush=True)
    return best


def main():
    shape = tuple(int(a) for a in sys.argv[1:4]) or (157, 82, 82)
    m = 25
    key = jax.random.PRNGKey(0)
    V = jax.random.normal(key, (m + 1,) + shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    taxes = tuple(range(1, V.ndim))
    print(f"shape={shape} m={m}", flush=True)

    @jax.jit
    def mgs2(w, V):
        def body(i, wh):
            w, h = wh
            coef = jnp.sum(V[i] * w, dtype=jnp.float64)
            w = w - coef.astype(w.dtype) * V[i]
            h = h.at[i].add(coef)
            return (w, h)
        w, h = jax.lax.fori_loop(0, m + 1, body,
                                 (w, jnp.zeros(m + 1, jnp.float64)))
        w, h = jax.lax.fori_loop(0, m + 1, body, (w, h))
        return w, h

    @jax.jit
    def cgs2_f64(w, V):
        h = jnp.zeros(m + 1, jnp.float64)
        for _ in range(2):
            coefs = jnp.sum(V * w, axis=taxes, dtype=jnp.float64)
            w = w - jnp.tensordot(coefs.astype(w.dtype), V, axes=([0], [0]))
            h = h + coefs
        return w, h

    @jax.jit
    def cgs2_f32(w, V):
        h = jnp.zeros(m + 1, jnp.float32)
        for _ in range(2):
            coefs = jnp.sum(V * w, axis=taxes, dtype=jnp.float32)
            w = w - jnp.tensordot(coefs, V, axes=([0], [0]))
            h = h + coefs
        return w, h

    @jax.jit
    def cgs2_2stage(w, V):
        # f32 partial reduction over the last two axes (big, fast), f64 only
        # across the leading-axis partials: error ~ nz*eps32 partials summed
        # exactly -> accuracy close to full-f64 accumulation at f32 speed
        h = jnp.zeros(m + 1, jnp.float64)
        for _ in range(2):
            part = jnp.sum(V * w, axis=taxes[1:], dtype=jnp.float32)
            coefs = jnp.sum(part.astype(jnp.float64), axis=1)
            w = w - jnp.tensordot(coefs.astype(w.dtype), V, axes=([0], [0]))
            h = h + coefs
        return w, h

    @jax.jit
    def cgs2_matmul(w, V):
        # flatten to (m+1, N) and drive both passes through the MXU:
        # dots = V2 @ w (tall matvec), recombine = coefs @ V2. precision
        # HIGHEST keeps full-f32 passes (default would round through bf16)
        V2 = V.reshape(m + 1, -1)
        wv = w.ravel()
        h = jnp.zeros(m + 1, jnp.float64)
        for _ in range(2):
            coefs = jax.lax.dot_general(
                V2, wv, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).astype(jnp.float64)
            wv = wv - jax.lax.dot_general(
                coefs.astype(jnp.float32), V2, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            h = h + coefs
        return wv.reshape(w.shape), h

    timeit("MGS2 sequential (52 dot+axpy)", mgs2, w, V, reps=5)
    timeit("CGS2 f64-accum (4 contractions)", cgs2_f64, w, V, reps=5)
    timeit("CGS2 f32-accum (4 contractions)", cgs2_f32, w, V, reps=5)
    timeit("CGS2 2-stage accum", cgs2_2stage, w, V, reps=5)
    timeit("CGS2 matmul (MXU, flat basis)", cgs2_matmul, w, V, reps=5)

    # accuracy: matmul-dots vs f64 reference
    c64 = jnp.sum((V * w).astype(jnp.float64), axis=taxes)
    cmm = jax.lax.dot_general(
        V.reshape(m + 1, -1), w.ravel(), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(jnp.float64)
    print(f"rel err vs f64: matmul {float(jnp.max(jnp.abs(cmm - c64) / (jnp.abs(c64) + 1e-30))):.3e}",
          flush=True)

    # --- permanently-flat basis: V stored (m+1, N); only w is reshaped
    V2 = jnp.asarray(V.reshape(m + 1, -1))

    @jax.jit
    def cgs2_flat(w, V2):
        wv = w.ravel()
        h = jnp.zeros(m + 1, jnp.float64)
        for _ in range(2):
            coefs = jax.lax.dot_general(
                V2, wv, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).astype(jnp.float64)
            wv = wv - jax.lax.dot_general(
                coefs.astype(jnp.float32), V2, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            h = h + coefs
        return wv.reshape(w.shape), h

    @jax.jit
    def cgs2_flat_sum(w, V2):
        wv = w.ravel()
        h = jnp.zeros(m + 1, jnp.float64)
        for _ in range(2):
            coefs = jnp.sum(V2 * wv, axis=1, dtype=jnp.float64)
            wv = wv - jnp.tensordot(coefs.astype(jnp.float32), V2,
                                    axes=([0], [0]))
            h = h + coefs
        return wv.reshape(w.shape), h

    timeit("CGS2 flat-basis matmul", cgs2_flat, w, V2, reps=5)
    timeit("CGS2 flat-basis sum/tensordot", cgs2_flat_sum, w, V2, reps=5)
    timeit("  flat dots (MXU matvec)", jax.jit(
        lambda w, V2: jax.lax.dot_general(
            V2, w.ravel(), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)), w, V2, reps=5)
    c = jnp.ones(m + 1, jnp.float32)
    timeit("  flat recombine (MXU)", jax.jit(
        lambda c, V2: jax.lax.dot_general(
            c, V2, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)), c, V2, reps=5)

    # accuracy cross-check of the 2-stage reduction vs full f64
    c64 = jnp.sum((V * w).astype(jnp.float64), axis=taxes)
    part = jnp.sum(V * w, axis=taxes[1:], dtype=jnp.float32)
    c2s = jnp.sum(part.astype(jnp.float64), axis=1)
    c32 = jnp.sum(V * w, axis=taxes, dtype=jnp.float32).astype(jnp.float64)
    print(f"rel err vs f64: 2-stage {float(jnp.max(jnp.abs(c2s - c64) / (jnp.abs(c64) + 1e-30))):.3e}  "
          f"f32 {float(jnp.max(jnp.abs(c32 - c64) / (jnp.abs(c64) + 1e-30))):.3e}",
          flush=True)

    # component pieces
    timeit("  dots f64", jax.jit(
        lambda w, V: jnp.sum(V * w, axis=taxes, dtype=jnp.float64)),
        w, V, reps=5)
    timeit("  dots f32", jax.jit(
        lambda w, V: jnp.sum(V * w, axis=taxes, dtype=jnp.float32)),
        w, V, reps=5)
    c = jnp.ones(m + 1, jnp.float32)
    timeit("  recombine (tensordot)", jax.jit(
        lambda c, V: jnp.tensordot(c, V, axes=([0], [0]))), c, V, reps=5)


if __name__ == "__main__":
    main()
