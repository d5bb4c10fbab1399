"""Trajectory parity: the jitted engine must reproduce, step for step, an
independent textbook numpy implementation of augmented CAVI (float64).
This is stronger than the single-step golden tests: any drift in update
order, caching, or jitter policy shows up within a few iterations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import agp_tpu as agp
from agp_tpu.config import jitter
from tests.testingtools import generate_f


def numpy_vgp_logistic_cavi(X, y, n_iters, jitt):
    """Dense PG-augmented CAVI, written independently in numpy."""
    N = X.shape[0]
    Xs = np.asarray(X)
    d2 = ((Xs[:, None] - Xs[None]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2) + jitt * np.eye(N)
    Kinv = np.linalg.inv(K)
    mu = np.zeros(N)
    Sigma = np.eye(N)
    for _ in range(n_iters):
        c = np.sqrt(mu**2 + np.diag(Sigma))
        theta = np.tanh(c / 2.0) / (2.0 * c)
        eta1 = y / 2.0
        eta2 = -(np.diag(theta / 2.0) + Kinv / 2.0)
        Sigma = np.linalg.inv(-2.0 * eta2)
        mu = Sigma @ eta1
    return mu, Sigma


def numpy_svgp_studentt_cavi(X, y, Z, nu, n_iters, jitt):
    """Sparse StudentT CAVI (non-stochastic => exact coordinate ascent)."""
    N, M = X.shape[0], Z.shape[0]
    Xs, Zs = np.asarray(X), np.asarray(Z)
    Kmm = np.exp(-0.5 * ((Zs[:, None] - Zs[None]) ** 2).sum(-1)) + jitt * np.eye(M)
    Kinv = np.linalg.inv(Kmm)
    Knm = np.exp(-0.5 * ((Xs[:, None] - Zs[None]) ** 2).sum(-1))
    kap = Knm @ Kinv
    Kt = np.maximum(1.0 + jitt - np.sum(kap * Knm, 1), 1e-12)
    mu = np.zeros(M)
    Sigma = np.eye(M)
    alpha = (nu + 1.0) / 2.0
    for _ in range(n_iters):
        mf = kap @ mu
        vf = Kt + np.sum((kap @ Sigma) * kap, 1)
        c = ((mf - y) ** 2 + vf + nu) / 2.0
        theta = alpha / c
        eta1 = kap.T @ (theta * y)
        eta2 = -((kap * (theta / 2.0)[:, None]).T @ kap + Kinv / 2.0)
        Sigma = np.linalg.inv(-2.0 * eta2)
        mu = Sigma @ eta1
    return mu, Sigma


def test_vgp_logistic_trajectory():
    kern = agp.SqExponentialKernel()
    X, f = generate_f(25, 2, kern)
    y = np.sign(np.asarray(f))
    jitt = jitter(X.dtype)
    mu_np, Sigma_np = numpy_vgp_logistic_cavi(X, y, 15, jitt)

    model = agp.VGP.create(X, y, kern, agp.LogisticLikelihood.create(),
                           agp.AnalyticVI(), optimiser=None)
    model, state = agp.train(model, iterations=15)
    np.testing.assert_allclose(np.asarray(state.mu[0]), mu_np, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(state.Sigma[0]), Sigma_np, rtol=1e-7, atol=1e-10
    )


def test_svgp_studentt_trajectory():
    kern = agp.SqExponentialKernel()
    X, f = generate_f(30, 2, kern)
    y = np.asarray(f) + 0.1 * np.random.RandomState(0).standard_t(4.0, 30)
    Z = X[:9]
    jitt = jitter(X.dtype)
    mu_np, Sigma_np = numpy_svgp_studentt_cavi(X, y, Z, 4.0, 12, jitt)

    model = agp.SVGP.create(kern, agp.StudentTLikelihood.create(4.0),
                            agp.AnalyticVI(), Z, optimiser=None)
    model, state = agp.train(model, X, y, iterations=12)
    np.testing.assert_allclose(np.asarray(state.mu[0]), mu_np, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(state.Sigma[0]), Sigma_np, rtol=1e-6, atol=1e-9
    )
