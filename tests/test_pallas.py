"""Interpret-mode correctness tests for the Pallas native tier
(ops/pallas_kernels.py) -- run on CPU; the TPU timing comparison lives in
RESULTS.md."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from agp_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope="module")
def setup():
    B, D, M = 300, 8, 64
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, D), dtype=jnp.float64)
    Z = jax.random.normal(jax.random.PRNGKey(1), (M, D), dtype=jnp.float64)
    y = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (B,), dtype=jnp.float64))
    ls, var, jitt = 1.3, 2.0, 1e-3
    K = var * jnp.exp(-0.5 * ((Z[:, None] - Z[None]) ** 2).sum(-1) / ls**2) + jitt * jnp.eye(M)
    Kinv = jnp.linalg.inv(K)
    Knm = var * jnp.exp(-0.5 * ((X[:, None] - Z[None]) ** 2).sum(-1) / ls**2)
    kappa = Knm @ Kinv
    return dict(X=X, Z=Z, y=y, ls=ls, var=var, jitt=jitt, Kinv=Kinv, Knm=Knm, kappa=kappa)


def test_fused_kappa(setup):
    s = setup
    Kt_ref = jnp.maximum(s["var"] + s["jitt"] - jnp.sum(s["kappa"] * s["Knm"], 1), 1e-12)
    with pltpu.force_tpu_interpret_mode():
        kappa, ktilde = pk.fused_kappa(
            s["X"], s["Z"], s["Kinv"], s["ls"], s["var"], s["jitt"], tile_b=128
        )
    np.testing.assert_allclose(np.asarray(kappa), np.asarray(s["kappa"]), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ktilde), np.asarray(Kt_ref), atol=5e-5)


def test_cavi_stats(setup):
    s = setup
    g = jax.random.normal(jax.random.PRNGKey(3), (300,), dtype=jnp.float64)
    th = jax.random.uniform(jax.random.PRNGKey(4), (300,), dtype=jnp.float64)
    with pltpu.force_tpu_interpret_mode():
        s1, S2 = pk.cavi_stats(s["kappa"], g, th, tile_b=128)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s["kappa"].T @ g), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(S2), np.asarray((s["kappa"] * th[:, None]).T @ s["kappa"]),
        rtol=2e-3, atol=1e-4,
    )


def test_fused_cavi_stats_padding_masked(setup):
    """Padded rows (B=300 -> 512 tiles) must not leak into the statistics
    (their gram values against Z are nonzero)."""
    s = setup
    M = 64
    mu = jax.random.normal(jax.random.PRNGKey(5), (M,), dtype=jnp.float64)
    A = jax.random.normal(jax.random.PRNGKey(6), (M, M), dtype=jnp.float64)
    Sigma = A @ A.T / M + jnp.eye(M)
    rho = 3.0
    kappa = s["kappa"]
    Kt = jnp.maximum(s["var"] + s["jitt"] - jnp.sum(kappa * s["Knm"], 1), 1e-12)
    mf = kappa @ mu
    vf = Kt + jnp.sum((kappa @ Sigma) * kappa, 1)
    c = jnp.sqrt(mf**2 + vf)
    th = jnp.tanh(c / 2) / (2 * c)
    s1_ref = kappa.T @ (rho * s["y"] / 2)
    S2_ref = (kappa * (rho * th / 2)[:, None]).T @ kappa
    with pltpu.force_tpu_interpret_mode():
        s1, S2, c_out, th_out = pk.fused_cavi_stats(
            s["X"], s["y"], s["Z"], s["Kinv"], mu, Sigma,
            s["ls"], s["var"], s["jitt"], rho, kind="rbf", lik="logistic", tile_b=128,
        )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(S2), np.asarray(S2_ref), rtol=5e-3, atol=1e-3)
    # the E-step local vars come back so state.local_vars stays in sync
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(th_out), np.asarray(th), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "lik_name",
    ["logistic", "gaussian", "studentt", "laplace", "bayesiansvm", "matern32"],
)
def test_fused_production_step_matches_xla(lik_name, monkeypatch):
    """END-TO-END: variational_update through the fused Pallas path
    (AGP_TPU_PALLAS=1 + interpret mode) must match the XLA path for every
    fused likelihood."""
    import agp_tpu as agp
    from agp_tpu.inference.analytic_vi import _pallas_fused_spec, variational_update
    from agp_tpu.training.train import init_state

    B, D = 300, 8
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, D), dtype=jnp.float64)
    f = jnp.sin(X[:, 0])
    liks = {
        "logistic": (agp.LogisticLikelihood.create(), np.where(np.asarray(f) > 0, 1.0, -1.0)),
        "gaussian": (agp.GaussianLikelihood.create(0.05, opt_noise=False), np.asarray(f)),
        "studentt": (agp.StudentTLikelihood.create(4.0), np.asarray(f)),
        "laplace": (agp.LaplaceLikelihood.create(), np.asarray(f)),
        "bayesiansvm": (agp.BayesianSVM.create(), np.where(np.asarray(f) > 0, 1.0, -1.0)),
        "matern32": (agp.Matern32Likelihood.create(0.7), np.asarray(f)),
    }
    lik, y = liks[lik_name]
    model = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(1.3)),
        lik,
        agp.AnalyticVI(),
        Z=X[:64],
        optimiser=None,
    )
    y2, lik2 = model.likelihood.treat_labels(y)
    model = model.replace(likelihood=lik2)
    y2 = jnp.asarray(y2, X.dtype)
    state0 = init_state(model, X, y2)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    spec = _pallas_fused_spec(model)
    assert spec is not None and spec[1] == lik_name
    monkeypatch.delenv("AGP_TPU_PALLAS", raising=False)

    m_x, s_x = variational_update(model, state0, X, y2)
    m_x, s_x = variational_update(m_x, s_x, X, y2)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        m_p, s_p = variational_update(model, state0, X, y2)
        m_p, s_p = variational_update(m_p, s_p, X, y2)

    np.testing.assert_allclose(np.asarray(s_p.mu), np.asarray(s_x.mu), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_p.Sigma), np.asarray(s_x.Sigma), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_p.local_vars["theta"]), np.asarray(s_x.local_vars["theta"]),
        rtol=1e-4, atol=1e-6,
    )
    _, _, _, _, c_key = spec
    if c_key is not None:
        np.testing.assert_allclose(
            np.asarray(s_p.local_vars[c_key]), np.asarray(s_x.local_vars[c_key]),
            rtol=1e-4, atol=1e-6,
        )
