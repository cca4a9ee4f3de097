"""Restarted GMRES on device (right-preconditioned, Arnoldi + least squares).

Replaces jax.scipy.sparse.linalg.gmres for the implicit transport solve.
Two reasons to own it:

* jax.scipy's gmres wraps lax.custom_linear_solve, which eagerly builds the
  transposed operator — impossible for a Pallas matvec (no transpose rule).
* The reference logs GMRES iteration counts and residuals
  (pd_ard_implicit.cpp:416-417); this implementation returns them.

Algorithm: classic restarted GMRES(m) with modified Gram-Schmidt Arnoldi,
the small (m+1, m) least-squares solved densely per cycle, and restart
cycles driven by a lax.while_loop on the true residual ||b - Ax|| / ||b||.
Matches Eigen's GMRES semantics (restart m, maxiter total inner iterations,
relative tolerance) with Jacobi instead of ILU preconditioning.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def gmres(A, b, x0, *, tol: float, restart: int, maxiter: int,
          M=None):
    """Solve A x = b. Returns (x, info) with info = (residual, n_cycles).

    A: linear operator (function), M: right preconditioner (function).
    ``maxiter`` counts total inner iterations as in Eigen
    (pd_ard_implicit.cpp:399-401): cycles = ceil(maxiter / restart).
    """
    if M is None:
        M = lambda v: v

    # All vector operations preserve the operand's natural array shape (and
    # hence its sharding under SPMD) — the Krylov basis carries the field
    # shape on trailing axes; raveling/reshaping sharded fields scrambles
    # layouts and was observed to break convergence on device meshes.
    shape = b.shape
    m = restart
    n_cycles = max(1, -(-maxiter // restart))

    # f64 Gram-Schmidt scalars with f32 vectors: the Arnoldi dot products
    # and the small Hessenberg least-squares run in float64 (when x64 is
    # enabled) while Krylov vectors stay in the operand dtype. At stiff dt
    # the f32 accumulation error over ~1e6-element reductions is what holds
    # the attainable residual near 1e-4; f64 accumulation removes that floor
    # at negligible cost (scalar reductions are a tiny fraction of the
    # matvec traffic). Under x64-off this degrades gracefully to f32.
    sdt = jnp.float64 if jax.config.jax_enable_x64 else b.dtype

    def vdot(a, c):
        return jnp.sum(a * c, dtype=sdt)

    def norm(a):
        return jnp.sqrt(vdot(a, a))

    b_norm = norm(b)
    safe_b = jnp.maximum(b_norm, 1e-300)

    def arnoldi_cycle(x):
        r = b - A(x)
        beta = norm(r)  # sdt scalar
        inv_beta = jnp.where(beta > 1e-30, 1.0 / jnp.maximum(beta, 1e-300),
                             0.0).astype(b.dtype)

        V = jnp.zeros((m + 1,) + shape, b.dtype)
        V = V.at[0].set(r * inv_beta)
        H = jnp.zeros((m + 1, m), sdt)

        def step(j, carry):
            V, H = carry
            w = A(M(V[j]))

            # modified Gram-Schmidt against v_0..v_j (masked full loop) with
            # one re-orthogonalization pass — in f32 a single MGS sweep loses
            # orthogonality on stiff operators and the cycle update can
            # regress instead of converge. Dot products accumulate in sdt;
            # the vector AXPY stays in the operand dtype.
            def mgs(i, wh):
                w, h = wh
                coef = jnp.where(i <= j, vdot(V[i], w), 0.0)
                w = w - coef.astype(b.dtype) * V[i]
                h = h.at[i].add(coef)
                return (w, h)

            w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                        (w, jnp.zeros(m + 1, sdt)))
            w, hcol = jax.lax.fori_loop(0, m + 1, mgs, (w, hcol))
            h_last = norm(w)
            hcol = hcol.at[j + 1].set(h_last)
            inv_h = jnp.where(h_last > 1e-30,
                              1.0 / jnp.maximum(h_last, 1e-300),
                              0.0).astype(b.dtype)
            # happy breakdown: keep a zero vector, lstsq handles the rest
            V = V.at[j + 1].set(w * inv_h)
            H = H.at[:, j].set(hcol)
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, step, (V, H))

        # least squares in sdt: min || beta*e1 - H y ||
        e1 = jnp.zeros(m + 1, sdt).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1, rcond=None)
        dx = M(jnp.tensordot(y.astype(b.dtype), V[:m], axes=([0], [0])))
        return x + dx

    def cond(carry):
        x, k, res = carry
        return (k < n_cycles) & (res > tol)

    def body(carry):
        x, k, res = carry
        x_new = arnoldi_cycle(x)
        res_new = norm(b - A(x_new)) / safe_b
        # monotone restarts: never accept a cycle that increased the residual
        # (possible under finite-precision basis loss)
        better = res_new < res
        x = jax.tree.map(lambda a, c: jnp.where(better, a, c), x_new, x)
        res = jnp.minimum(res_new, res)
        return (x, k + 1, res)

    res0 = norm(b - A(x0)) / safe_b
    x, k, res = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(0, jnp.int32), res0))
    return x, (res, k)
