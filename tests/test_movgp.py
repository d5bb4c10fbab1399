"""Dense multi-output (MOVGP) first-class tests: an independent numpy
implementation of the LMC CAVI (mixing matrix A, per-task E-steps, mixed
gradient expectations, natural-gradient update, A gradient step) is checked
step-for-step against the engine, plus per-task prediction correctness.

Reference semantics: /root/reference/src/models/MOVGP.jl:22-120 and
single_and_multi_output_utils.jl:24-118.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import agp_tpu as agp
from agp_tpu.config import jitter
from tests.testingtools import generate_f


def _mo_setup(N=24, Q=2, T=2, seed=7):
    kern = agp.SqExponentialKernel()
    X, f1 = generate_f(N, 2, kern, key=jax.random.PRNGKey(seed))
    _, f2 = generate_f(N, 2, kern, key=jax.random.PRNGKey(seed + 1), X=X)
    ys = [np.asarray(f1) + 0.3, np.asarray(0.5 * f2 - 0.2)]
    return X, ys


def numpy_movgp_gaussian_cavi(X, ys, A0, sigma2, n_iters, jitt, a_lr=None):
    """Dense LMC CAVI with T Gaussian tasks and Q shared latents, written
    independently in numpy (Z = X as MOVGP does)."""
    Xs = np.asarray(X, np.float64)
    N = Xs.shape[0]
    Q = A0.shape[1]
    R = A0.shape[0]
    Y = np.stack([np.asarray(y, np.float64) for y in ys])  # [R, N]
    d2 = ((Xs[:, None] - Xs[None]) ** 2).sum(-1)
    Kmm = np.exp(-0.5 * d2) + jitt * np.eye(N)
    Kinv = np.linalg.inv(Kmm)
    Knm = np.exp(-0.5 * d2)  # gram(X, Z=X), no jitter
    kap = Knm @ Kinv
    Kt = np.maximum(1.0 + jitt - np.sum(kap * Knm, 1), 1e-12)

    A = A0.copy()
    mu = np.zeros((Q, N))
    Sigma = np.stack([np.eye(N)] * Q)
    theta = 1.0 / sigma2
    for _ in range(n_iters):
        # latent moments at the batch
        mu_q = mu @ kap.T  # [Q, N] (kap @ mu[q] per latent)
        var_q = np.stack(
            [Kt + np.sum((kap @ Sigma[q]) * kap, 1) for q in range(Q)]
        )
        # per-task E-step (Gaussian: theta const) + grad expectations
        gmu_r = Y / sigma2  # [R, N]
        gs_r = np.full((R, N), theta / 2.0)
        # mix onto latents
        mix = A @ mu_q  # [R, N]
        g1 = np.zeros((Q, N))
        g2 = np.zeros((Q, N))
        for q in range(Q):
            cross = mix - A[:, q:q + 1] * mu_q[q][None, :]  # [R, N]
            g1[q] = (A[:, q:q + 1] * (gmu_r - 2.0 * gs_r * cross)).sum(0)
            g2[q] = (A[:, q:q + 1] ** 2 * gs_r).sum(0)
        # natural-gradient global update (non-stochastic: jump to target)
        for q in range(Q):
            eta1 = kap.T @ g1[q]
            eta2 = -((kap * g2[q][:, None]).T @ kap + Kinv / 2.0)
            Sigma[q] = np.linalg.inv(-2.0 * eta2)
            mu[q] = Sigma[q] @ eta1
        # A gradient step (uses the PRE-update latent moments)
        if a_lr is not None:
            x1 = gmu_r @ mu_q.T  # [R, Q]
            for q in range(Q):
                cross = mix - A[:, q:q + 1] * mu_q[q][None, :]
                x1[:, q] -= 2.0 * ((gs_r * cross) @ mu_q[q])
            x2 = gs_r @ (mu_q**2 + var_q).T  # [R, Q]
            gA = x1 - 2.0 * A * x2
            A = A + a_lr * gA
            A = A / np.linalg.norm(A, axis=1, keepdims=True)
    return mu, Sigma, A


def test_movgp_gaussian_trajectory_fixed_A():
    """MOVGP (dense multi-output) must reproduce the independent numpy LMC
    CAVI step-for-step with the mixing matrix held fixed."""
    X, ys = _mo_setup()
    sigma2 = 0.05
    model = agp.MOVGP.create(
        X, [agp.GaussianLikelihood.create(sigma2, opt_noise=False)] * 2,
        agp.SqExponentialKernel(), agp.AnalyticVI(), n_latent=2,
        optimiser=None, Aoptimiser=None, key=jax.random.PRNGKey(3),
    )
    A0 = np.asarray(model.A, np.float64)
    jitt = jitter(X.dtype)
    mu_np, Sigma_np, _ = numpy_movgp_gaussian_cavi(X, ys, A0, sigma2, 10, jitt)

    model, state = agp.mo_train(model, X, ys, iterations=10)
    np.testing.assert_allclose(np.asarray(state.mu), mu_np, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(state.Sigma), Sigma_np, rtol=1e-6, atol=1e-9
    )


def test_movgp_trajectory_with_A_updates():
    """Same, with the A gradient step + unit-norm projection active (sgd so
    the numpy twin is exact)."""
    X, ys = _mo_setup(seed=11)
    sigma2 = 0.05
    lr = 0.05
    model = agp.MOVGP.create(
        X, [agp.GaussianLikelihood.create(sigma2, opt_noise=False)] * 2,
        agp.SqExponentialKernel(), agp.AnalyticVI(), n_latent=2,
        optimiser=None, Aoptimiser=optax.sgd(lr), key=jax.random.PRNGKey(5),
    )
    A0 = np.asarray(model.A, np.float64)
    jitt = jitter(X.dtype)
    mu_np, Sigma_np, A_np = numpy_movgp_gaussian_cavi(
        X, ys, A0, sigma2, 8, jitt, a_lr=lr
    )

    model, state = agp.mo_train(model, X, ys, iterations=8)
    np.testing.assert_allclose(np.asarray(model.A), A_np, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.mu), mu_np, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(state.Sigma), Sigma_np, rtol=1e-5, atol=1e-8
    )
    # rows stay unit-norm (the projection step)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(model.A), axis=1), np.ones(2), rtol=1e-12
    )


def test_movgp_per_task_predictions():
    """predict_y / proba_y correctness per task on a trained dense MO model
    with heterogeneous likelihoods (regression + classification)."""
    kern = agp.SqExponentialKernel()
    X, f1 = generate_f(60, 2, kern, key=jax.random.PRNGKey(31))
    _, f2 = generate_f(60, 2, kern, key=jax.random.PRNGKey(32), X=X)
    y_reg = np.asarray(f1)
    y_cls = np.sign(np.asarray(f1) + 0.3 * np.asarray(f2))  # correlated tasks

    model = agp.MOVGP.create(
        X,
        [agp.GaussianLikelihood.create(0.01, opt_noise=False),
         agp.LogisticLikelihood.create()],
        kern, agp.AnalyticVI(), n_latent=2, optimiser=None,
        key=jax.random.PRNGKey(6),
    )
    model, state = agp.mo_train(model, X, [y_reg, y_cls], iterations=60)

    pred = agp.mo_predict_y(model, state, X)
    assert len(pred) == 2
    rmse = float(jnp.sqrt(jnp.mean((pred[0] - jnp.asarray(y_reg)) ** 2)))
    assert rmse < 0.3
    acc = float(jnp.mean(pred[1] == jnp.asarray(y_cls)))
    assert acc > 0.85

    proba = agp.mo_proba_y(model, state, X)
    mu_t, var_t = proba[0]  # Gaussian task: predictive mean/variance
    assert bool(jnp.all(var_t > 0))
    np.testing.assert_allclose(np.asarray(mu_t), np.asarray(pred[0]))
    p_cls = proba[1]  # Logistic task: P(y=1)
    assert bool(jnp.all((p_cls >= 0) & (p_cls <= 1)))
    acc_p = float(jnp.mean((p_cls > 0.5) == (jnp.asarray(y_cls) > 0)))
    assert acc_p > 0.85


def test_movgp_predict_f_full_cov_consistent_with_diag():
    """mo_predict_f(diag=False) task covariance diagonals must equal the
    diag=True variances."""
    X, ys = _mo_setup(N=20)
    model = agp.MOVGP.create(
        X, [agp.GaussianLikelihood.create(0.05, opt_noise=False)] * 2,
        agp.SqExponentialKernel(), agp.AnalyticVI(), n_latent=2,
        optimiser=None, key=jax.random.PRNGKey(8),
    )
    model, state = agp.mo_train(model, X, ys, iterations=10)
    Xt = np.asarray(X)[:7]
    mu_d, var_d = agp.mo_predict_f(model, state, Xt, diag=True)
    mu_f, cov_f = agp.mo_predict_f(model, state, Xt, diag=False)
    np.testing.assert_allclose(np.asarray(mu_d), np.asarray(mu_f), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(var_d),
        np.asarray(jnp.diagonal(cov_f, axis1=-2, axis2=-1)),
        rtol=1e-6, atol=1e-10,
    )
