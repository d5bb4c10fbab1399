"""Likelihood-by-likelihood behavioral tests (the reference's
compatibility-matrix-as-test-driver pattern, test/testingtools.jl:54-221),
plus golden-value checks of the closed-form local updates.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import agp_tpu as agp
from tests.testingtools import generate_f

KEY = jax.random.PRNGKey(11)


def _fit_vgp(lik, y, X, iters=20):
    kern = agp.SqExponentialKernel()
    model = agp.VGP.create(X, y, kern, lik, agp.AnalyticVI(), optimiser=None)
    return agp.train(model, iterations=iters)


@pytest.fixture(scope="module")
def data():
    kern = agp.SqExponentialKernel()
    X, f = generate_f(24, 2, kern)
    return X, f


def test_studentt_vgp(data):
    X, f = data
    y = f + 0.05 * np.random.RandomState(0).standard_t(4.0, size=f.shape)
    model, state = _fit_vgp(agp.StudentTLikelihood.create(4.0), y, X)
    mu = agp.predict_f(model, state, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0
    m, v = agp.proba_y(model, state, X)
    assert jnp.all(v > 0)
    assert np.isfinite(float(agp.elbo(model, state)))


def test_laplace_vgp(data):
    X, f = data
    y = np.asarray(f) + 0.05 * np.random.RandomState(1).laplace(size=f.shape)
    model, state = _fit_vgp(agp.LaplaceLikelihood.create(1.0), y, X)
    mu = agp.predict_f(model, state, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0
    assert np.isfinite(float(agp.elbo(model, state)))


def test_bayesiansvm_vgp(data):
    X, f = data
    y = np.sign(np.asarray(f))
    model, state = _fit_vgp(agp.BayesianSVM.create(), y, X)
    pred = agp.predict_y(model, state, X)
    assert float(jnp.mean(pred != jnp.asarray(y))) < 0.35
    p = agp.proba_y(model, state, X)
    assert jnp.all((p >= 0) & (p <= 1))


def test_poisson_vgp(data):
    X, f = data
    rate = 10.0 * jax.nn.sigmoid(jnp.asarray(f))
    y = np.random.RandomState(2).poisson(np.asarray(rate))
    model, state = _fit_vgp(agp.PoissonLikelihood.create(10.0), y, X)
    pred = agp.predict_y(model, state, X)
    assert float(jnp.mean(jnp.abs(pred - rate))) < 20.0
    assert np.isfinite(float(agp.elbo(model, state)))


def test_negbinomial_vgp(data):
    X, f = data
    p = np.asarray(jax.nn.sigmoid(jnp.asarray(f)))
    y = np.random.RandomState(3).negative_binomial(10, 1 - p)
    model, state = _fit_vgp(agp.NegBinomialLikelihood.create(10.0), y, X)
    pred = agp.predict_y(model, state, X)
    assert np.all(np.isfinite(np.asarray(pred)))
    assert np.isfinite(float(agp.elbo(model, state)))


def test_heteroscedastic_vgp(data):
    X, f = data
    g = np.asarray(generate_f(24, 2, agp.SqExponentialKernel(), X=jnp.asarray(X))[1])
    noise_var = 1.0 / (5.0 * (1.0 / (1.0 + np.exp(-g))))
    y = np.asarray(f) + np.sqrt(noise_var) * np.random.RandomState(4).randn(*f.shape)
    lik = agp.HeteroscedasticLikelihood.create(5.0)
    model, state = _fit_vgp(lik, y, X, iters=15)
    assert model.n_latent == 2
    mu = agp.predict_f(model, state, X)
    assert mu.shape == (2, 24)
    m, v = agp.proba_y(model, state, X)
    assert jnp.all(v > 0)
    assert np.isfinite(float(agp.elbo(model, state)))


def test_logisticsoftmax_svgp(data):
    X, _ = data
    K = 3
    keys = [jax.random.PRNGKey(s) for s in range(K)]
    fs = [generate_f(24, 2, agp.SqExponentialKernel(), key=k, X=jnp.asarray(X))[1] for k in keys]
    y = np.argmax(np.stack([np.asarray(f) for f in fs]), axis=0)
    lik = agp.LogisticSoftMaxLikelihood.create(K)
    kern = agp.SqExponentialKernel()
    model = agp.SVGP.create(kern, lik, agp.AnalyticVI(), X[:8], optimiser=None)
    model, state = agp.train(model, X, y, iterations=20)
    pred_idx = agp.predict_y(model, state, X)
    err = float(jnp.mean(pred_idx != jnp.asarray(y)))
    assert err < 0.9  # reference oracle: multiclass err < 0.9
    probs = agp.proba_y(model, state, X)
    np.testing.assert_allclose(np.asarray(probs).sum(1), 1.0, atol=1e-5)
    assert np.isfinite(float(agp.elbo(model, state, X, jnp.asarray(model.likelihood.treat_labels(y)[0]))))


def test_local_updates_golden():
    """Closed-form local updates match hand-computed reference formulas."""
    mu = jnp.asarray([0.3, -1.2, 2.0])
    var = jnp.asarray([0.5, 0.1, 1.5])
    y = jnp.asarray([1.0, -1.0, 1.0])

    lik = agp.LogisticLikelihood.create()
    _, lv = lik.local_updates(y, mu[None], var[None], lik.init_local_vars(3, mu.dtype))
    c = np.sqrt(np.asarray(mu) ** 2 + np.asarray(var))
    np.testing.assert_allclose(lv["c"], c, rtol=1e-12)
    np.testing.assert_allclose(lv["theta"], np.tanh(c / 2) / (2 * c), rtol=1e-12)
    np.testing.assert_allclose(lik.grad_e_mu(y, lv)[0], np.asarray(y) / 2)

    st = agp.StudentTLikelihood.create(4.0, 1.0)
    _, lv = st.local_updates(y, mu[None], var[None], st.init_local_vars(3, mu.dtype))
    c_exp = ((np.asarray(mu) - np.asarray(y)) ** 2 + np.asarray(var) + 4.0) / 2
    np.testing.assert_allclose(lv["c"], c_exp, rtol=1e-12)
    np.testing.assert_allclose(lv["theta"], 2.5 / c_exp, rtol=1e-12)

    lap = agp.LaplaceLikelihood.create(2.0)
    _, lv = lap.local_updates(y, mu[None], var[None], lap.init_local_vars(3, mu.dtype))
    b = np.sqrt((np.asarray(mu) - np.asarray(y)) ** 2 + np.asarray(var))
    np.testing.assert_allclose(lv["b"], b, rtol=1e-12)
    np.testing.assert_allclose(lv["theta"], 0.5 / b, rtol=1e-12)


def test_incompatible_raises():
    kern = agp.SqExponentialKernel()
    with pytest.raises(ValueError):
        agp.SVGP.create(
            kern,
            agp.BayesianSVM.create(),
            agp.GibbsSampling(),
            np.zeros((5, 2)),
        )


def test_compatibility_matrix_is_enforced():
    """The likelihood x inference compatibility matrix as an executable spec
    (the reference's tests_likelihood Dict pattern, test/testingtools.jl):
    constructors must succeed exactly on the implemented() combinations."""
    liks = [
        agp.GaussianLikelihood.create(0.1),
        agp.StudentTLikelihood.create(3.0),
        agp.LaplaceLikelihood.create(),
        agp.LogisticLikelihood.create(),
        agp.BayesianSVM.create(),
        agp.PoissonLikelihood.create(5.0),
        agp.NegBinomialLikelihood.create(5.0),
        agp.HeteroscedasticLikelihood.create(2.0),
        agp.LogisticSoftMaxLikelihood.create(3),
        agp.SoftMaxLikelihood.create(3),
        agp.Matern32Likelihood.create(),
    ]
    infs = [
        agp.AnalyticVI(),
        agp.QuadratureVI(n_points=10),
        agp.MCIntegrationVI(n_mc=8),
        agp.GibbsSampling(),
        agp.HMCSampling(),
    ]
    Z = np.zeros((4, 2))
    X = np.random.RandomState(0).randn(8, 2)
    for lik in liks:
        for inf in infs:
            expected_ok = inf.name in type(lik).implemented()
            if inf.name in ("GibbsSampling", "HMCSampling"):
                make = lambda: agp.MCGP.create(X, np.zeros(8), agp.SqExponentialKernel(), lik, inf)
            else:
                make = lambda: agp.SVGP.create(agp.SqExponentialKernel(), lik, inf, Z)
            if expected_ok:
                try:
                    make()
                except ValueError as e:  # pragma: no cover
                    raise AssertionError(
                        f"{type(lik).__name__} x {inf.name} should be allowed: {e}"
                    )
                except Exception:
                    pass  # label validation may reject zeros; gate passed
            else:
                with pytest.raises(ValueError):
                    make()


def test_logisticsoftmax_local_updates_golden():
    """Hand-computed triple-augmentation E-step (logisticsoftmax.jl:55-79)."""
    K, B = 3, 2
    mu = jnp.asarray([[0.5, -1.0], [0.0, 2.0], [1.0, 0.3]])
    var = jnp.asarray([[0.2, 0.5], [1.0, 0.1], [0.3, 0.4]])
    y = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])  # one-hot [B, K]
    lik = agp.LogisticSoftMaxLikelihood.create(K)
    local = lik.init_local_vars(B, mu.dtype)
    _, lv = lik.local_updates(y, mu, var, local)

    from scipy.special import digamma as sdigamma

    c = np.sqrt(np.asarray(mu) ** 2 + np.asarray(var))
    alpha = np.asarray(local["alpha"])  # init = K
    beta = np.asarray(local["beta"])  # stays K
    expcosh = np.exp(-np.asarray(mu) / 2) / np.cosh(c / 2)
    for _ in range(2):
        gamma = np.exp(sdigamma(alpha))[None, :] * expcosh / (2 * beta[None, :])
        alpha = 1.0 + gamma.sum(0)
    theta = (np.asarray(y).T + gamma) * np.tanh(c / 2) / (2 * c)
    np.testing.assert_allclose(np.asarray(lv["c"]), c, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(lv["gamma"]), gamma, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(lv["alpha"]), alpha, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(lv["theta"]), theta, rtol=1e-8)


def test_heteroscedastic_local_updates_golden():
    """Hand-computed two-GP E-step (heteroscedastic.jl:50-96)."""
    lam = 2.0
    B = 3
    mu = jnp.asarray([[0.1, -0.5, 1.0], [0.3, 0.0, -0.8]])  # [2, B] (f, g)
    var = jnp.asarray([[0.2, 0.1, 0.5], [0.4, 1.0, 0.2]])
    y = jnp.asarray([0.0, -1.0, 1.5])
    lik = agp.HeteroscedasticLikelihood.create(lam)
    _, lv = lik.local_updates(y, mu, var, lik.init_local_vars(B, mu.dtype))

    muf, mug = np.asarray(mu)
    varf, varg = np.asarray(var)
    yv = np.asarray(y)
    phi = ((muf - yv) ** 2 + varf) / 2
    c = np.sqrt(mug**2 + varg)
    sigg = np.exp(-mug / 2) / np.cosh(c / 2) / 2
    gamma = lam * phi * sigg
    theta = (0.5 + gamma) * np.tanh(c / 2) / (2 * c)
    np.testing.assert_allclose(np.asarray(lv["phi"]), phi, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(lv["c"]), c, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(lv["sigg"]), sigg, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(lv["gamma"]), gamma, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(lv["theta"]), theta, rtol=1e-8)
    # lambda update: max(n / (2 phi.(1-sigg)), lam)
    expected_lam = max(3 / (2 * np.sum(phi * (1 - sigg))), lam)
    lik2, _ = lik.local_updates(y, mu, var, lv)
    np.testing.assert_allclose(float(lik2.lam), expected_lam, rtol=1e-8)


def test_poisson_local_updates_golden():
    lam = 4.0
    mu = jnp.asarray([0.2, -1.0, 1.5])
    var = jnp.asarray([0.3, 0.5, 0.1])
    y = jnp.asarray([2.0, 0.0, 5.0])
    lik = agp.PoissonLikelihood.create(lam)
    _, lv = lik.local_updates(y, mu[None], var[None], lik.init_local_vars(3, mu.dtype))
    c = np.sqrt(np.asarray(mu) ** 2 + np.asarray(var))
    gamma = lam * np.exp(-np.asarray(mu) / 2) / np.cosh(c / 2) / 2
    theta = (np.asarray(y) + gamma) * np.tanh(c / 2) / (2 * c)  # E[omega], PARITY #3
    np.testing.assert_allclose(np.asarray(lv["gamma"]), gamma, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(lv["theta"]), theta, rtol=1e-8)
