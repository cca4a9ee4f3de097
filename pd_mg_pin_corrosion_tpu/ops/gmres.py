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

    shape = b.shape
    n = b.size
    bf = b.ravel()
    m = restart
    n_cycles = max(1, -(-maxiter // restart))

    b_norm = jnp.linalg.norm(bf)
    safe_b = jnp.maximum(b_norm, 1e-300)

    def Aop(v):
        return A(v.reshape(shape)).ravel()

    def Mop(v):
        return M(v.reshape(shape)).ravel()

    def arnoldi_cycle(x):
        r = bf - Aop(x)
        beta = jnp.linalg.norm(r)
        safe_beta = jnp.maximum(beta, 1e-300)

        V = jnp.zeros((m + 1, n), bf.dtype)
        V = V.at[0].set(r / safe_beta)
        H = jnp.zeros((m + 1, m), bf.dtype)

        def step(j, carry):
            V, H = carry
            w = Aop(Mop(V[j]))

            # modified Gram-Schmidt against v_0..v_j (masked full loop)
            def mgs(i, wh):
                w, h = wh
                coef = jnp.where(i <= j, jnp.dot(V[i], w), 0.0)
                w = w - coef * V[i]
                h = h.at[i].set(coef)
                return (w, h)

            w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                        (w, jnp.zeros(m + 1, bf.dtype)))
            h_last = jnp.linalg.norm(w)
            hcol = hcol.at[j + 1].set(h_last)
            v_next = w / jnp.maximum(h_last, 1e-300)
            # happy breakdown: keep a zero vector, lstsq handles the rest
            v_next = jnp.where(h_last > 1e-300, v_next, 0.0)
            V = V.at[j + 1].set(v_next)
            H = H.at[:, j].set(hcol)
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, step, (V, H))

        # least squares: min || beta*e1 - H y ||
        e1 = jnp.zeros(m + 1, bf.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1, rcond=None)
        dx = Mop(V[:m].T @ y)
        return x + dx

    def cond(carry):
        x, k, res = carry
        return (k < n_cycles) & (res > tol)

    def body(carry):
        x, k, _ = carry
        x = arnoldi_cycle(x)
        res = jnp.linalg.norm(bf - Aop(x)) / safe_b
        return (x, k + 1, res)

    res0 = jnp.linalg.norm(bf - Aop(x0.ravel())) / safe_b
    x, k, res = jax.lax.while_loop(
        cond, body, (x0.ravel(), jnp.asarray(0, jnp.int32), res0))
    return x.reshape(shape), (res, k)
