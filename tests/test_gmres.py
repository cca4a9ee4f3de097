"""Unit tests for the on-device restarted GMRES (ops/gmres.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pd_mg_pin_corrosion_tpu.ops.gmres import gmres


def _random_system(n, seed=0, cond=10.0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    s = np.linspace(1.0, cond, n)
    A = Q @ np.diag(s) @ Q.T  # SPD, condition number = cond
    x_true = rng.normal(size=n)
    return A, x_true, A @ x_true


def test_gmres_solves_dense_system():
    A, x_true, b = _random_system(80)
    Amat = jnp.asarray(A)

    def Aop(v):
        return Amat @ v

    x, (res, k) = gmres(Aop, jnp.asarray(b), jnp.zeros(80),
                        tol=1e-10, restart=40, maxiter=400)
    assert float(res) < 1e-10
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-9)


def test_gmres_restart_cycles_and_precond():
    A, x_true, b = _random_system(120, cond=500.0)
    Amat = jnp.asarray(A)
    d = jnp.asarray(np.diag(A))

    def Aop(v):
        return Amat @ v

    def M(v):
        return v / d

    x_np, (res_np, k_np) = gmres(Aop, jnp.asarray(b), jnp.zeros(120),
                                 tol=1e-9, restart=20, maxiter=400)
    x_pc, (res_pc, k_pc) = gmres(Aop, jnp.asarray(b), jnp.zeros(120),
                                 tol=1e-9, restart=20, maxiter=400, M=M)
    assert float(res_pc) < 1e-9
    # forward error bounded by cond * residual: loose tolerance at cond=500
    np.testing.assert_allclose(np.asarray(x_pc), x_true, rtol=1e-4, atol=1e-6)
    # both converge within the cycle budget
    assert int(k_np) <= 20 and int(k_pc) <= 20


def test_gmres_respects_shape():
    """Operator over a 2D field (the production shape)."""
    n = 16
    A2 = jnp.eye(n * n) * 2.0

    def Aop(x):
        return (A2 @ x.ravel()).reshape(n, n)

    b = jnp.ones((n, n))
    x, (res, _) = gmres(Aop, b, jnp.zeros((n, n)), tol=1e-12, restart=10,
                        maxiter=50)
    assert x.shape == (n, n)
    np.testing.assert_allclose(np.asarray(x), 0.5, rtol=1e-10)


def test_gmres_early_convergence():
    """x0 = exact solution -> zero cycles."""
    A, x_true, b = _random_system(30)
    Amat = jnp.asarray(A)
    x, (res, k) = gmres(lambda v: Amat @ v, jnp.asarray(b),
                        jnp.asarray(x_true), tol=1e-8, restart=10, maxiter=100)
    assert int(k) == 0
    assert float(res) < 1e-8
