"""Tests for the non-analytic engines and advanced model families:
NumericalVI (quadrature/MC), Gibbs/HMC/SMC sampling, VStP, multi-output,
online streaming, generic augmented likelihood, AR prediction, checkpoint.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import agp_tpu as agp
from tests.testingtools import generate_f


@pytest.fixture(scope="module")
def reg_data():
    kern = agp.SqExponentialKernel()
    X, f = generate_f(30, 2, kern)
    y = f + 0.05 * jax.random.normal(jax.random.PRNGKey(9), f.shape, dtype=jnp.float64)
    return X, f, y


@pytest.fixture(scope="module")
def cls_data():
    kern = agp.SqExponentialKernel()
    X, f = generate_f(30, 2, kern)
    return X, f, np.sign(np.asarray(f))


def test_quadrature_vi_logistic(cls_data):
    X, f, y = cls_data
    model = agp.VGP.create(
        X, y, agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
        agp.QuadratureVI(n_points=30), optimiser=None,
    )
    model, state = agp.train(model, iterations=100)
    pred = agp.predict_y(model, state, X)
    assert float(jnp.mean(pred != jnp.asarray(y))) < 0.35
    assert np.isfinite(float(agp.elbo(model, state)))


def test_quadrature_vi_studentt(reg_data):
    X, f, y = reg_data
    model = agp.VGP.create(
        X, y, agp.SqExponentialKernel(), agp.StudentTLikelihood.create(4.0),
        agp.QuadratureVI(n_points=30), optimiser=None,
    )
    model, state = agp.train(model, iterations=100)
    mu = agp.predict_f(model, state, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0


def test_mc_vi_softmax(cls_data):
    X, f, _ = cls_data
    y = np.asarray(np.asarray(f) > 0, dtype=int)
    model = agp.VGP.create(
        X, y, agp.SqExponentialKernel(), agp.SoftMaxLikelihood.create(2),
        agp.MCIntegrationVI(n_mc=64), optimiser=None,
    )
    model, state = agp.train(model, iterations=50)
    pred = agp.predict_y(model, state, X)
    assert float(jnp.mean(pred != jnp.asarray(y))) < 0.4


def test_gibbs_matches_exact_gaussian(reg_data):
    """Gibbs with Gaussian likelihood has no aux variables: posterior mean of
    the chain must match the exact GP posterior."""
    X, f, y = reg_data
    lik = agp.GaussianLikelihood.create(0.05, opt_noise=False)
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(), lik,
                         agp.GibbsSampling(n_burnin=100))
    samples = agp.sample(mg, 300, key=jax.random.PRNGKey(3))
    mean_gibbs = np.asarray(samples.mean(0))[0]
    # exact posterior: K(K+s I)^-1 y with same jitter on K
    from agp_tpu.config import jitter

    K = agp.SqExponentialKernel().gram(X, X) + jitter(X.dtype) * jnp.eye(30)
    mean_exact = np.asarray(K @ jnp.linalg.solve(K + 0.05 * jnp.eye(30), y))
    assert np.corrcoef(mean_gibbs, mean_exact)[0, 1] > 0.99


def test_hmc_logistic(cls_data):
    X, f, y = cls_data
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
                         agp.HMCSampling(n_burnin=100, step_size=0.1, n_leapfrog=8))
    samples = agp.sample_hmc(mg, 150, key=jax.random.PRNGKey(4))
    assert samples.shape == (150, 1, 30)
    mean_hmc = np.asarray(samples.mean(0))[0]
    # sign of posterior mean should mostly agree with labels
    agree = np.mean(np.sign(mean_hmc) == np.asarray(y))
    assert agree > 0.7
    assert np.all(np.isfinite(mean_hmc))


def test_smc_logistic(cls_data):
    X, f, y = cls_data
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
                         agp.GibbsSampling())
    fs, log_z = agp.smc_sample(mg, n_particles=128, n_temps=10, key=jax.random.PRNGKey(5))
    assert fs.shape == (128, 1, 30)
    assert np.isfinite(float(log_z))
    mean_smc = np.asarray(fs.mean(0))[0]
    assert np.mean(np.sign(mean_smc) == np.asarray(y)) > 0.7


def test_vstp_studentt(reg_data):
    X, f, y = reg_data
    model = agp.VStP.create(
        X, y, agp.SqExponentialKernel(), agp.StudentTLikelihood.create(4.0),
        agp.AnalyticVI(), nu=5.0, optimiser=None,
    )
    model, state = agp.train(model, iterations=20)
    assert float(state.prior_state["chi"][0]) > 0
    mu = agp.predict_f(model, state, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0


def test_mo_hyperopt_lengthscale_recovery():
    """MO driver must autotune kernel hyperparameters (reference:
    autotuning.jl:48-84 covers multi-output models): a Gaussian-task MOSVGP
    initialized with a too-long lengthscale recovers a shorter one and the
    ELBO improves over the frozen-hyper control."""
    import optax

    kern = agp.SqExponentialKernel(lengthscale=jnp.asarray(0.4))
    X, f = generate_f(60, 1, kern, key=jax.random.PRNGKey(3))
    y = np.asarray(f + 0.05 * jax.random.normal(jax.random.PRNGKey(4), f.shape, dtype=f.dtype))

    def build(optimiser):
        return agp.MOSVGP.create(
            agp.SqExponentialKernel(lengthscale=jnp.asarray(3.0)),
            [agp.GaussianLikelihood.create(0.05), agp.GaussianLikelihood.create(0.05)],
            agp.AnalyticVI(),
            Z=X[:20],
            n_latent=2,
            optimiser=optimiser,
            atfrequency=1,
        )

    ys = (y, np.asarray(-0.5 * f))
    m_opt, s_opt = agp.mo_train(build(optax.adam(0.1)), X, ys, iterations=60)
    m_frz, s_frz = agp.mo_train(build(None), X, ys, iterations=60)
    ls = np.asarray(jnp.ravel(m_opt.kernel.lengthscale))
    assert np.all(ls < 2.0), ls  # moved from 3.0 toward the true 0.4
    e_opt = float(agp.mo_elbo(m_opt, s_opt, X, tuple(map(jnp.asarray, ys))))
    e_frz = float(agp.mo_elbo(m_frz, s_frz, X, tuple(map(jnp.asarray, ys))))
    assert e_opt > e_frz + 1.0


def test_mo_hyperopt_mixed_likelihoods_and_callback(reg_data):
    """Mixed-likelihood MO hyper step must be gradient *ascent* on the MO
    ELBO: from a CAVI-converged state, one small hyper step increases the
    ELBO.  Also exercises callback plumbing and that hyper steps move the
    kernel parameters.  (The augmented Laplace ELBO *trajectory* is not a
    useful oracle here: its augmentation KL legitimately grows as residuals
    shrink below the likelihood scale beta, in the single-output reference
    path too.)"""
    import optax
    from agp_tpu.training.autotuning import hyper_step, init_hyper_state

    X, f, y = reg_data
    y_cls = np.sign(np.asarray(f))
    model = agp.MOSVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(2.0)),
        [agp.LogisticLikelihood.create(), agp.LaplaceLikelihood.create()],
        agp.AnalyticVI(),
        Z=X[:10],
        n_latent=2,
        optimiser=None,
        atfrequency=2,
    )
    ys = (y_cls, np.asarray(y))
    ys_j = (jnp.asarray(y_cls), jnp.asarray(y))
    traj = []
    cb = lambda m, s, i: traj.append(i)
    model, state = agp.mo_train(model, X, ys, iterations=120, callback=cb)
    assert traj == list(range(1, 121))
    e0 = float(agp.mo_elbo(model, state, X, ys_j))
    model = model.replace(optimiser=optax.sgd(1e-4))
    state = state.replace(hyper_state=init_hyper_state(model))
    model, state = hyper_step(model, state, jnp.asarray(X), ys_j)
    e1 = float(agp.mo_elbo(model, state, X, ys_j))
    assert e1 > e0, (e0, e1)
    assert not np.allclose(
        np.asarray(model.kernel.lengthscale), 2.0
    ), "hyper steps must move the kernel parameters"


def test_vstp_chi_is_one_at_prior(reg_data):
    """chi = E_q[1/s] must equal 1 exactly when q(f) sits at the prior
    (mu = mu0, Sigma = K): quad = 0, tr(K^-1 Sigma) = N, so
    chi = (nu+N)/(nu+0+N) = 1 (IG posterior alpha/beta)."""
    from agp_tpu.models.vstp import local_prior_updates

    X, f, y = reg_data
    model = agp.VStP.create(
        X, y, agp.SqExponentialKernel(), agp.StudentTLikelihood.create(4.0),
        agp.AnalyticVI(), nu=5.0, optimiser=None,
    )
    state = agp.init_state(model)
    K = jnp.einsum("lmn,lkn->lmk", state.kmat["L_K"], state.kmat["L_K"])
    state = state.replace(mu=jnp.zeros_like(state.mu), Sigma=K)
    state = local_prior_updates(model, state, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(state.prior_state["chi"]), 1.0, atol=5e-3)


def test_mosvgp_mixed_likelihoods(reg_data):
    """Reference pattern: multi-output with mixed Logistic+Laplace tasks
    (test/models/MOSVGP.jl)."""
    X, f, y = reg_data
    y_cls = np.sign(np.asarray(f))
    model = agp.MOSVGP.create(
        agp.SqExponentialKernel(),
        [agp.LogisticLikelihood.create(), agp.LaplaceLikelihood.create()],
        agp.AnalyticVI(),
        Z=X[:10],
        n_latent=2,
        optimiser=None,
    )
    model, state = agp.mo_train(model, X, (y_cls, np.asarray(y)), iterations=20)
    mu_r, var_r = agp.mo_predict_f(model, state, X)
    assert mu_r.shape == (2, 30)
    assert bool(jnp.all(var_r > 0))
    e = agp.mo_elbo(model, state, X, tuple(
        l.treat_labels(t)[0] for l, t in zip(model.likelihoods, (y_cls, np.asarray(y)))
    ))
    assert np.isfinite(float(e))
    # rows stay unit-norm after A updates
    np.testing.assert_allclose(np.linalg.norm(np.asarray(model.A), axis=1), 1.0, atol=1e-8)


def test_online_svgp_stream(reg_data):
    X, f, y = reg_data
    model = agp.OnlineSVGP.create(
        agp.SqExponentialKernel(), agp.GaussianLikelihood.create(0.05, opt_noise=False),
        agp.AnalyticVI(), n_dim=2, capacity=32,
    )
    state = None
    for i in range(3):
        xb, yb = X[i * 10 : (i + 1) * 10], y[i * 10 : (i + 1) * 10]
        model, state = agp.online_train(model, xb, yb, state=state, iterations=5)
    n_active = int(model.z_mask[0].sum())
    assert 0 < n_active <= 32
    mu = agp.predict_f(model, state, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0
    # streaming ELBO with extraKL is finite
    e = agp.online_elbo(model, state, X[20:30], y[20:30])
    assert np.isfinite(float(e))


def test_online_train_stream_matches_per_batch(reg_data):
    """The scan-fused pre-buffered stream driver (one device program over
    all batches) must be bit-equivalent to threading state through
    per-batch online_train calls -- it is the same program, scanned."""
    X, f, y = reg_data

    def mk():
        return agp.OnlineSVGP.create(
            agp.SqExponentialKernel(),
            agp.GaussianLikelihood.create(0.05, opt_noise=False),
            agp.AnalyticVI(), n_dim=2, capacity=32, optimiser=None,
        )

    B, nb = 10, 3
    m1, s1 = mk(), None
    for i in range(nb):
        m1, s1 = agp.online_train(
            m1, X[i * B : (i + 1) * B], y[i * B : (i + 1) * B],
            state=s1, iterations=5,
        )
    m2, s2 = agp.online_train_stream(
        mk(), X[: nb * B].reshape(nb, B, X.shape[1]),
        y[: nb * B].reshape(nb, B), iterations=5,
    )
    np.testing.assert_array_equal(np.asarray(s1.mu), np.asarray(s2.mu))
    np.testing.assert_array_equal(np.asarray(s1.Sigma), np.asarray(s2.Sigma))
    np.testing.assert_array_equal(np.asarray(m1.z_mask), np.asarray(m2.z_mask))
    # hyperopt streams per-batch only
    with pytest.raises(ValueError):
        agp.online_train_stream(
            agp.OnlineSVGP.create(
                agp.SqExponentialKernel(), agp.GaussianLikelihood.create(0.05),
                agp.AnalyticVI(), n_dim=2, capacity=32,
            ),
            X[:30].reshape(3, 10, X.shape[1]), y[:30].reshape(3, 10),
        )


def test_generic_augmented_matches_laplace(reg_data):
    """Build Laplace via the augmodel factory: p(y|f) = 1/2 exp(-|y-f|)
    => C=1/2, g=0, alpha=y^2, beta=2y, gamma=1, phi=exp(-sqrt(r)).
    Its CAVI fixed point must match the built-in LaplaceLikelihood."""
    X, f, y = reg_data
    GenLap = agp.make_augmented_likelihood(
        "GenLaplace", "Regression",
        C=0.5,
        g=lambda y: jnp.zeros_like(y),
        alpha=lambda y: y**2,
        beta=lambda y: 2.0 * y,
        gamma=lambda y: jnp.ones_like(y),
        phi=lambda r: jnp.exp(-jnp.sqrt(jnp.maximum(r, 1e-12))),
    )
    m1 = agp.VGP.create(X, y, agp.SqExponentialKernel(), GenLap.create(),
                        agp.AnalyticVI(), optimiser=None)
    m1, s1 = agp.train(m1, iterations=30)
    m2 = agp.VGP.create(X, y, agp.SqExponentialKernel(), agp.LaplaceLikelihood.create(1.0),
                        agp.AnalyticVI(), optimiser=None)
    m2, s2 = agp.train(m2, iterations=30)
    np.testing.assert_allclose(np.asarray(s1.mu), np.asarray(s2.mu), atol=2e-2)


def test_ar_prediction():
    t = jnp.linspace(0, 8 * jnp.pi, 200, dtype=jnp.float64)
    series = jnp.sin(t)
    lag = 5
    Xl = jnp.stack([series[i : i + lag] for i in range(len(series) - lag)])
    yl = series[lag:]
    model = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.GaussianLikelihood.create(1e-3, opt_noise=False),
        agp.AnalyticVI(), Z=Xl[:20], optimiser=None,
    )
    model, state = agp.train(model, Xl, yl, iterations=15)
    preds = agp.predict_ar(model, state, series[-lag:], n_steps=20)
    future = jnp.sin(t[-1] + (t[1] - t[0]) * jnp.arange(1, 21))
    assert float(jnp.mean(jnp.abs(preds - future))) < 0.5
    traj = agp.sample_ar(model, state, series[-lag:], n_steps=10, n_samples=4)
    assert traj.shape == (4, 10)


def test_checkpoint_roundtrip(reg_data, tmp_path):
    X, f, y = reg_data
    lik = agp.GaussianLikelihood.create(0.05, opt_noise=False)
    model = agp.SVGP.create(agp.SqExponentialKernel(), lik, agp.AnalyticVI(), X[:8],
                            optimiser=None)
    model, state = agp.train(model, X, y, iterations=5)
    agp.checkpoint.save(str(tmp_path / "ckpt"), model, state)
    # safe default: weights grafted onto rebuilt templates, nothing unpickled
    mt = agp.SVGP.create(agp.SqExponentialKernel(), lik, agp.AnalyticVI(), X[:8],
                         optimiser=None)
    mt, st = agp.train(mt, X, y, iterations=1)
    model2, state2 = agp.checkpoint.load(str(tmp_path / "ckpt"), mt, st)
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(state2.mu))
    # templates are required without allow_pickle
    with pytest.raises(ValueError):
        agp.checkpoint.load(str(tmp_path / "ckpt"))
    # opt-in trusted mode still restores without templates
    model3, state3 = agp.checkpoint.load(str(tmp_path / "ckpt"), allow_pickle=True)
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(state3.mu))
    # resume training from the checkpoint
    model2, state2 = agp.train(model2, X, y, iterations=3, state=state2)
    mu1 = agp.predict_f(model2, state2, X)
    assert np.all(np.isfinite(np.asarray(mu1)))


def test_pg_sampler_moments():
    """Vectorized PG sampler matches the analytic mean E[PG(b,c)] =
    b tanh(c/2)/(2c) for scalar and vector b."""
    from agp_tpu.distributions.polyagamma import pg_mean, sample_pg

    key = jax.random.PRNGKey(0)
    for b, c in [(1.0, 0.5), (1.0, 3.0), (4.0, 1.5), (0.5, 2.0)]:
        bs = jnp.full((4000,), b)
        cs = jnp.full((4000,), c)
        draws = sample_pg(key, bs, cs)
        m_emp = float(draws.mean())
        m_true = float(pg_mean(b, c))
        assert abs(m_emp - m_true) / m_true < 0.05, (b, c, m_emp, m_true)


def test_gig_sampler_moments():
    from agp_tpu.distributions.gig import gig_mean, sample_gig

    key = jax.random.PRNGKey(1)
    a = jnp.full((4000,), 2.0)
    b = jnp.full((4000,), 3.0)
    draws = sample_gig(key, a, b, 0.5)
    m_true = float(gig_mean(2.0, 3.0, 0.5))
    assert abs(float(draws.mean()) - m_true) / m_true < 0.05


def test_cavi_gibbs_agreement_studentt(reg_data):
    """CAVI fixed point vs exact augmented Gibbs for the inverse-Gamma
    augmentation (self-consistency; PARITY_NOTES #3 rationale)."""
    X, f, y = reg_data
    lik = agp.StudentTLikelihood.create(4.0)
    vg = agp.VGP.create(X, y, agp.SqExponentialKernel(), lik, agp.AnalyticVI(),
                        optimiser=None)
    vg, vst = agp.train(vg, iterations=40)
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(), lik,
                         agp.GibbsSampling(n_burnin=200))
    s = agp.sample(mg, 400, key=jax.random.PRNGKey(11))
    mu_g = np.asarray(s.mean(0))[0]
    mu_v = np.asarray(vst.mu)[0]
    assert np.corrcoef(mu_g, mu_v)[0, 1] > 0.99
    assert float(np.max(np.abs(mu_g - mu_v))) < 0.3


def test_zoptimiser_moves_inducing_points():
    """Inducing-point optimization (reference: autotuning.jl:102-121): with
    a Zoptimiser the inducing locations move and the final ELBO beats the
    frozen-Z control trained identically."""
    import optax

    kern = agp.SqExponentialKernel(lengthscale=jnp.asarray(0.5))
    X, f = generate_f(80, 1, kern, key=jax.random.PRNGKey(5))
    y = np.asarray(f + 0.05 * jax.random.normal(jax.random.PRNGKey(6), f.shape, dtype=f.dtype))
    Z0 = np.linspace(float(X.min()), float(X.max()), 6)[:, None]  # deliberately coarse

    def build(Zopt):
        return agp.SVGP.create(
            agp.SqExponentialKernel(lengthscale=jnp.asarray(0.5)),
            agp.GaussianLikelihood.create(0.05**2),
            agp.AnalyticVI(),
            Z=Z0,
            optimiser=optax.adam(0.01),
            Zoptimiser=Zopt,
            atfrequency=1,
        )

    m_z, s_z = agp.train(build(optax.adam(0.05)), X, y, iterations=80)
    m_f, s_f = agp.train(build(None), X, y, iterations=80)
    moved = float(jnp.max(jnp.abs(m_z.Z - jnp.asarray(Z0)[None])))
    assert moved > 1e-3, "Z must move under a Zoptimiser"
    e_z = float(agp.elbo(m_z, s_z, X, jnp.asarray(y)))
    e_f = float(agp.elbo(m_f, s_f, X, jnp.asarray(y)))
    assert e_z > e_f, (e_z, e_f)


def test_alrsvi_svi_convergence(cls_data):
    """ALRSVI adaptive-rate SVI (reference: optimisers.jl:26-58) must train
    an SVGP classifier to the same quality as RobbinsMonro."""
    from agp_tpu.utils.opt import alrsvi

    X, f, y = cls_data
    model = agp.SVGP.create(
        agp.SqExponentialKernel(),
        agp.LogisticLikelihood.create(),
        agp.AnalyticSVI(16, optimiser=alrsvi()),
        Z=X[:10],
        optimiser=None,
    )
    model, state = agp.train(model, X, y, iterations=300, key=jax.random.PRNGKey(0))
    pred = agp.predict_y(model, state, X)
    err = float(jnp.mean(pred != jnp.asarray(y)))
    assert err < 0.3, err
    assert np.all(np.isfinite(np.asarray(state.mu)))


def test_nuts_conjugate_posterior(reg_data):
    """NUTS (iterative multinomial, generalized no-U-turn) on a Gaussian
    likelihood must reproduce the exact conjugate GP posterior:
    mean corr > 0.999 and posterior variances within 25%."""
    X, f, y = reg_data
    sigma2 = 0.05**2
    mg = agp.MCGP.create(X, np.asarray(y), agp.SqExponentialKernel(),
                         agp.GaussianLikelihood.create(sigma2),
                         agp.HMCSampling(n_burnin=300, step_size=0.1))
    assert mg.inference.algorithm == "nuts"
    s = agp.sample(mg, 600, key=jax.random.PRNGKey(7))
    mean_nuts = np.asarray(s.mean(0))[0]
    K = np.asarray(agp.SqExponentialKernel().gram(jnp.asarray(X), jnp.asarray(X)))
    N = K.shape[0]
    mean_exact = K @ np.linalg.solve(K + sigma2 * np.eye(N), np.asarray(y))
    assert np.corrcoef(mean_nuts, mean_exact)[0, 1] > 0.999
    var_nuts = np.asarray(s.var(0))[0]
    var_exact = np.diag(K - K @ np.linalg.solve(K + sigma2 * np.eye(N), K))
    ratio = np.median(var_nuts / var_exact)
    assert 0.75 < ratio < 1.33, ratio


def test_nuts_vs_gibbs_logistic(cls_data):
    """NUTS posterior mean must agree with the exact augmented Gibbs
    sampler on the logistic fixture (VERDICT round-1 'done' criterion)."""
    X, f, y = cls_data
    lik = agp.LogisticLikelihood.create()
    mg_n = agp.MCGP.create(X, y, agp.SqExponentialKernel(), lik,
                           agp.HMCSampling(n_burnin=300, step_size=0.1))
    s_n = agp.sample(mg_n, 600, key=jax.random.PRNGKey(3))
    mg_g = agp.MCGP.create(X, y, agp.SqExponentialKernel(), lik,
                           agp.GibbsSampling(n_burnin=300))
    s_g = agp.sample(mg_g, 600, key=jax.random.PRNGKey(4))
    mu_n = np.asarray(s_n.mean(0))[0]
    mu_g = np.asarray(s_g.mean(0))[0]
    assert np.corrcoef(mu_n, mu_g)[0, 1] > 0.95, np.corrcoef(mu_n, mu_g)[0, 1]


def test_matern32_aug_kl_golden():
    """Matern-3/2 expec_loglik - aug_kl must equal the brute-force
    E_q(v)[log N(y|f,v)] - KL(q(v)||p(v)) with q(v) = GIG(3/rho^2, c^2, 3/2)
    and p(v) = Gamma(2, 3/(2 rho^2)) (golden values from scipy quadrature,
    machine-precision derivation check).  This makes the reported ELBO a
    true bound -- the reference never implemented it (matern.jl:86-100)."""
    golden = {
        # (mu, var, y) -> E[logN] - KL at rho = 0.8 (scipy.integrate.quad)
        (0.3, 0.2, 1.1): -1.50478842,
        (0.0, 1.0, 0.0): -1.62673505,
        (2.0, 0.05, -1.0): -5.11038990,
        (1.0, 1e-6, 1.0): -0.61384700,
    }
    rho = 0.8
    lik = agp.Matern32Likelihood.create(rho)
    for (mu, var, y), want in golden.items():
        c = np.sqrt((mu - y) ** 2 + var)
        theta = 3.0 / (2.0 * np.sqrt(3.0) * c * rho + 2.0 * rho**2)
        local = {"c": jnp.asarray([c]), "theta": jnp.asarray([theta])}
        ell = float(lik._expec_loglik(jnp.asarray([y]), jnp.asarray([mu]), jnp.asarray([var]), local))
        akl = float(lik.aug_kl(local, jnp.asarray([y])))
        np.testing.assert_allclose(ell - akl, want, atol=1e-6)


def test_matern32_elbo_is_a_bound(reg_data):
    """The augmented ELBO must lower-bound the non-augmented variational
    objective E_q[log p(y|f)] - KL (quadrature) at the same posterior."""
    from agp_tpu.inference.analytic_vi import latent_moments, prior_mean_stack
    from agp_tpu.ops.kl import gaussian_kl
    from agp_tpu.ops.quadrature import gauss_hermite

    X, f, y = reg_data
    lik = agp.Matern32Likelihood.create(0.5)
    vg = agp.VGP.create(X, y, agp.SqExponentialKernel(), lik, agp.AnalyticVI(),
                        optimiser=None)
    vg, st = agp.train(vg, iterations=40)
    aug = float(agp.elbo(vg, st))
    xq, wq = gauss_hermite(80)
    mu_f, var_f, _ = latent_moments(vg, st, jnp.asarray(vg.train_x), st.kmat)
    nodes = mu_f[0][:, None] + jnp.sqrt(var_f[0])[:, None] * xq
    ell = float(jnp.sum(wq * vg.likelihood.log_prob(jnp.asarray(vg.train_y)[:, None], nodes)))
    mu0 = prior_mean_stack(vg, jnp.asarray(vg.train_x))
    kl = float(jnp.sum(jax.vmap(gaussian_kl)(st.mu, mu0, st.Sigma, st.kmat["L_K"])))
    true_obj = ell - kl
    assert aug <= true_obj + 1e-6, (aug, true_obj)
    assert aug > true_obj - 30.0  # and not absurdly loose


def test_cavi_gibbs_agreement_matern32(reg_data):
    """Matern-3/2 CAVI vs exact GIG(3/2)-augmented Gibbs: posterior means
    must agree (new capability -- the reference's matern Gibbs draw is
    inconsistent with its own E-step and its ELBO throws)."""
    X, f, y = reg_data
    lik = agp.Matern32Likelihood.create(0.5)
    vg = agp.VGP.create(X, y, agp.SqExponentialKernel(), lik, agp.AnalyticVI(),
                        optimiser=None)
    vg, vst = agp.train(vg, iterations=60)
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(), lik,
                         agp.GibbsSampling(n_burnin=300))
    s = agp.sample(mg, 500, key=jax.random.PRNGKey(13))
    mu_g = np.asarray(s.mean(0))[0]
    mu_v = np.asarray(vst.mu)[0]
    assert np.corrcoef(mu_g, mu_v)[0, 1] > 0.95
    assert float(np.max(np.abs(mu_g - mu_v))) < 0.5


def test_cavi_gibbs_agreement_poisson(reg_data):
    """Poisson: the corrected theta = E[omega] makes CAVI agree with the
    exact sampler (the reference's 2x convention would not)."""
    X, f, _ = reg_data
    y = np.random.RandomState(5).poisson(
        10.0 * np.asarray(jax.nn.sigmoid(jnp.asarray(f)))
    )
    lik = agp.PoissonLikelihood.create(10.0)
    vg = agp.VGP.create(X, y, agp.SqExponentialKernel(), lik, agp.AnalyticVI(),
                        optimiser=None)
    vg, vst = agp.train(vg, iterations=40)
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(),
                         agp.PoissonLikelihood.create(float(vg.likelihood.lam)),
                         agp.GibbsSampling(n_burnin=200))
    s = agp.sample(mg, 400, key=jax.random.PRNGKey(12))
    mu_g = np.asarray(s.mean(0))[0]
    mu_v = np.asarray(vst.mu)[0]
    assert np.corrcoef(mu_g, mu_v)[0, 1] > 0.95


def test_sample_dispatch_hmc(cls_data):
    X, f, y = cls_data
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
                         agp.HMCSampling(n_burnin=50, n_leapfrog=8))
    s = agp.sample(mg, 50, key=jax.random.PRNGKey(21))
    assert s.shape == (50, 1, 30)


def test_mcgp_sample_predictions(cls_data):
    from agp_tpu.models.mcgp import predict_f_samples, proba_y_mc

    X, f, y = cls_data
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
                         agp.GibbsSampling(n_burnin=50))
    s = agp.sample(mg, 100, key=jax.random.PRNGKey(22))
    fp = predict_f_samples(mg, s, X[:10])
    assert fp.shape == (100, 1, 10)
    p = proba_y_mc(mg, s, X[:10])
    assert p.shape == (10,)
    assert bool(jnp.all((p >= 0) & (p <= 1)))


def test_quadrature_svi_stochastic(cls_data):
    X, f, y = cls_data
    model = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
        agp.QuadratureSVI(16, n_points=20), Z=X[:8], optimiser=None,
    )
    model, state = agp.train(model, X, y, iterations=150)
    pred = agp.predict_y(model, state, X)
    assert float(jnp.mean(pred != jnp.asarray(y))) < 0.4


def test_mc_svi_stochastic(cls_data):
    from agp_tpu.inference.config import MCIntegrationSVI

    X, f, _ = cls_data
    y = np.asarray(np.asarray(f) > 0, dtype=int)
    model = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.SoftMaxLikelihood.create(2),
        MCIntegrationSVI(16, n_mc=32), Z=X[:8], optimiser=None,
    )
    model, state = agp.train(model, X, y, iterations=100)
    pred = agp.predict_y(model, state, X)
    assert float(jnp.mean(pred != jnp.asarray(y))) < 0.45


def test_heteroscedastic_gibbs(reg_data):
    """Gibbs path for the two-latent heteroscedastic likelihood (Poisson +
    PG(gamma + 1/2) draws per sweep)."""
    X, f, y = reg_data
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(),
                         agp.HeteroscedasticLikelihood.create(5.0),
                         agp.GibbsSampling(n_burnin=50))
    s = agp.sample(mg, 100, key=jax.random.PRNGKey(31))
    assert s.shape == (100, 2, 30)
    assert bool(jnp.all(jnp.isfinite(s)))
    mean_f = np.asarray(s.mean(0))[0]
    assert np.corrcoef(mean_f, np.asarray(f))[0, 1] > 0.8


def test_quadrature_vi_with_hyperopt(reg_data):
    """Hyperparameter autotuning through the numerical-VI objective."""
    import optax

    X, f, y = reg_data
    model = agp.VGP.create(
        X, y, agp.SqExponentialKernel(lengthscale=jnp.asarray(3.0)),
        agp.StudentTLikelihood.create(4.0), agp.QuadratureVI(n_points=20),
        optimiser=optax.adam(0.05),
    )
    model, state = agp.train(model, iterations=40)
    ls = float(model.kernel.lengthscale[0])
    assert ls != 3.0  # moved
    mu = agp.predict_f(model, state, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0


def test_svgd_logistic(cls_data):
    """SVGD particles agree with the Gibbs posterior mean."""
    X, f, y = cls_data
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
                         agp.GibbsSampling(n_burnin=200))
    fs = agp.svgd_sample(mg, n_particles=64, n_steps=300, key=jax.random.PRNGKey(41))
    assert fs.shape == (64, 1, 30)
    mean_svgd = np.asarray(fs.mean(0))[0]
    s = agp.sample(mg, 300, key=jax.random.PRNGKey(42))
    mean_gibbs = np.asarray(s.mean(0))[0]
    assert np.corrcoef(mean_svgd, mean_gibbs)[0, 1] > 0.95


def test_logisticsoftmax_mc_vi(cls_data):
    """MC-integration VI for logistic-softmax (the reference's alternative
    to the augmented path, logisticsoftmax.jl:152-214)."""
    X, f, _ = cls_data
    y = np.asarray(np.asarray(f) > 0, dtype=int)
    model = agp.VGP.create(
        X, y, agp.SqExponentialKernel(), agp.LogisticSoftMaxLikelihood.create(2),
        agp.MCIntegrationVI(n_mc=32), optimiser=None,
    )
    model, state = agp.train(model, iterations=60)
    pred = agp.predict_y(model, state, X)
    assert float(jnp.mean(pred != jnp.asarray(y))) < 0.45


def test_online_svgp_classification(cls_data):
    """Streaming classification: OnlineSVGP + Logistic."""
    X, f, y = cls_data
    model = agp.OnlineSVGP.create(
        agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
        agp.AnalyticVI(), n_dim=2, capacity=24, optimiser=None,
    )
    state = None
    for i in range(3):
        model, state = agp.online_train(
            model, X[i * 10 : (i + 1) * 10], y[i * 10 : (i + 1) * 10],
            state=state, iterations=8,
        )
    pred = agp.predict_y(model, state, X)
    assert float(jnp.mean(pred != jnp.asarray(y))) < 0.4


def test_gibbs_cg_solver_matches_exact_posterior():
    """The matmul-only whitened perturb-and-solve (CG) global resample is an
    exact sampler: with a Gaussian likelihood the Gibbs posterior has a
    closed form, and the CG chain must match it as tightly as the Cholesky
    chain does."""
    from agp_tpu.models.mcgp import MCGP, sample

    N = 80
    X = jnp.linspace(-3, 3, N, dtype=jnp.float64)[:, None]
    f_true = jnp.sin(1.5 * X[:, 0])
    y = np.asarray(
        f_true + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (N,), dtype=jnp.float64)
    )
    kern = agp.SqExponentialKernel(lengthscale=jnp.asarray(0.7))
    sig2 = 0.01
    K = kern.gram(X, X) + 1e-8 * jnp.eye(N)
    Sig = jnp.linalg.inv(jnp.linalg.inv(K) + jnp.eye(N) / sig2)
    mu_exact = Sig @ (jnp.asarray(y) / sig2)
    var_exact = jnp.diag(Sig)

    m = MCGP.create(
        X, y, kern, agp.GaussianLikelihood.create(sig2, opt_noise=False),
        agp.GibbsSampling(n_burnin=200, thinning=2, solver="cg"),
    )
    out = sample(m, 600, key=jax.random.PRNGKey(1))
    samples = out[0] if isinstance(out, tuple) else out
    post_mean = jnp.mean(samples, axis=0)[0]
    post_var = jnp.var(samples, axis=0)[0]
    assert float(jnp.corrcoef(post_mean, mu_exact)[0, 1]) > 0.999
    assert float(jnp.max(jnp.abs(post_mean - mu_exact))) < 0.05
    med_rel = float(jnp.median(jnp.abs(post_var - var_exact) / var_exact))
    assert med_rel < 0.2


def test_nuts_multiclass_softmax():
    """NUTS on the multi-latent (K=3 softmax) log-joint: finite chains and
    class separation (the whitened multi-latent path of inference/hmc.py,
    reference capability hmcsampling.jl for any MCGP model)."""
    from agp_tpu.models.mcgp import sample

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (40, 2), dtype=jnp.float64)
    y = np.asarray((X[:, 0] > 0).astype(int) + (X[:, 1] > 0).astype(int))
    m = agp.MCGP.create(
        X, y, agp.SqExponentialKernel(), agp.SoftMaxLikelihood.create(3),
        agp.HMCSampling(n_burnin=50),
    )
    s = sample(m, 100, key=jax.random.PRNGKey(1))
    assert s.shape == (100, 3, 40)
    assert bool(jnp.all(jnp.isfinite(s)))
    f_mean = jnp.mean(s, axis=0)
    acc = float(jnp.mean(jnp.argmax(f_mean, axis=0) == jnp.asarray(y)))
    assert acc > 0.7


@pytest.mark.parametrize("algname", ["unigrid", "webscale", "streamkmeans"])
def test_online_svgp_alternative_zalgs(reg_data, algname):
    """Streaming training with the non-OIPS online inducing algorithms
    (reference: InducingPoints.jl OnIPSA family used by OnlineSVGP)."""
    from agp_tpu.inducing import StreamKmeans, UniGridOnline, Webscale

    X, f, y = reg_data
    alg = {
        "unigrid": UniGridOnline(3),  # 3^2 = 9 grid points in 2D
        "webscale": Webscale(8),  # <= first-batch size (k centers seed from batch 1)
        "streamkmeans": StreamKmeans(capacity=24, radius2=0.25),
    }[algname]
    model = agp.OnlineSVGP.create(
        agp.SqExponentialKernel(),
        agp.GaussianLikelihood.create(0.05, opt_noise=False),
        agp.AnalyticVI(),
        Zalg=alg,
        n_dim=2,
        capacity=16,
    )
    state = None
    for i in range(3):
        xb, yb = X[i * 10 : (i + 1) * 10], y[i * 10 : (i + 1) * 10]
        model, state = agp.online_train(model, xb, yb, state=state, iterations=5)
    n_active = int(model.z_mask[0].sum())
    if algname == "unigrid":
        assert n_active == 9
    elif algname == "webscale":
        assert n_active == 8
        assert float(model.z_counts[0].max()) > 1.0  # centers absorbed points
    else:
        assert 0 < n_active <= 24
    mu = agp.predict_f(model, state, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0
    e = agp.online_elbo(model, state, X[20:30], y[20:30])
    assert np.isfinite(float(e))


def test_webscale_small_first_batch_reaches_k(reg_data):
    """A first batch smaller than k must not permanently cap the center
    count: later batches activate the remaining slots (farthest-first)."""
    from agp_tpu.inducing import Webscale

    X, f, y = reg_data
    model = agp.OnlineSVGP.create(
        agp.SqExponentialKernel(),
        agp.GaussianLikelihood.create(0.05, opt_noise=False),
        agp.AnalyticVI(),
        Zalg=Webscale(12),  # > first-batch size of 5
        n_dim=2,
        capacity=16,
    )
    state = None
    model, state = agp.online_train(model, X[:5], y[:5], state=state, iterations=3)
    assert int(model.z_mask[0].sum()) == 5
    model, state = agp.online_train(model, X[5:15], y[5:15], state=state, iterations=3)
    assert int(model.z_mask[0].sum()) == 12  # reached k, not capped at 5
    model, state = agp.online_train(model, X[15:30], y[15:30], state=state, iterations=3)
    assert int(model.z_mask[0].sum()) == 12  # stays at k
    mu = agp.predict_f(model, state, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0


def test_checkpoint_roundtrip_online_svgp(reg_data, tmp_path):
    """Safe (weights-only) checkpoint round-trip for OnlineSVGP: the masked
    fixed-capacity buffers (Z, z_mask, Za, counts) AND the streaming
    `previous` block must survive, and the stream must resume."""
    X, f, y = reg_data

    def stream(model, state, upto):
        for i in range(upto):
            xb, yb = X[i * 10:(i + 1) * 10], y[i * 10:(i + 1) * 10]
            model, state = agp.online_train(model, xb, yb, state=state, iterations=5)
        return model, state

    def build():
        return agp.OnlineSVGP.create(
            agp.SqExponentialKernel(),
            agp.GaussianLikelihood.create(0.05, opt_noise=False),
            agp.AnalyticVI(), n_dim=2, capacity=16,
        )

    model, state = stream(build(), None, 2)
    assert state.previous is not None  # streaming block live
    agp.checkpoint.save(str(tmp_path / "ck"), model, state)

    # rebuild templates by replaying the stream structure, then graft
    mt, st = stream(build(), None, 2)
    model2, state2 = agp.checkpoint.load(str(tmp_path / "ck"), mt, st)
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(state2.mu))
    np.testing.assert_array_equal(np.asarray(model.z_mask), np.asarray(model2.z_mask))
    np.testing.assert_allclose(np.asarray(model.Z), np.asarray(model2.Z))
    for k in state.previous:
        np.testing.assert_allclose(
            np.asarray(state.previous[k]), np.asarray(state2.previous[k])
        )
    # resume the stream from the restored state
    model2, state2 = agp.online_train(
        model2, X[20:30], y[20:30], state=state2, iterations=5
    )
    mu = agp.predict_f(model2, state2, X)
    assert float(jnp.mean(jnp.abs(mu - f))) < 1.0


def test_checkpoint_roundtrip_mosvgp(reg_data, tmp_path):
    """Safe checkpoint round-trip for MOSVGP (mixing matrix + per-task
    local vars + A optimizer state), resuming mo_train after restore."""
    X, f, y = reg_data
    ys = [np.asarray(f), np.asarray(y)]

    def build():
        return agp.MOSVGP.create(
            agp.SqExponentialKernel(),
            [agp.GaussianLikelihood.create(0.1, opt_noise=False)] * 2,
            agp.AnalyticVI(), X[:8], n_latent=2, optimiser=None,
            key=jax.random.PRNGKey(9),
        )

    model, state = agp.mo_train(build(), X, ys, iterations=6)
    agp.checkpoint.save(str(tmp_path / "ck"), model, state)

    mt, st = agp.mo_train(build(), X, ys, iterations=1)
    model2, state2 = agp.checkpoint.load(str(tmp_path / "ck"), mt, st)
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(state2.mu))
    np.testing.assert_allclose(np.asarray(model.A), np.asarray(model2.A))
    model2, state2 = agp.mo_train(model2, X, ys, iterations=3, state=state2)
    mu, _ = agp.mo_predict_f(model2, state2, X)
    assert bool(jnp.all(jnp.isfinite(mu)))


def test_checkpoint_shape_mismatch_rejected(reg_data, tmp_path):
    """The manifest catches template/checkpoint shape drift loudly."""
    X, f, y = reg_data
    lik = agp.GaussianLikelihood.create(0.05, opt_noise=False)

    def build(m):
        return agp.SVGP.create(agp.SqExponentialKernel(), lik, agp.AnalyticVI(),
                               X[:m], optimiser=None)

    model, state = agp.train(build(8), X, y, iterations=2)
    agp.checkpoint.save(str(tmp_path / "ck"), model, state)
    mt, st = agp.train(build(10), X, y, iterations=1)  # wrong M
    with pytest.raises(ValueError):
        agp.checkpoint.load(str(tmp_path / "ck"), mt, st)
