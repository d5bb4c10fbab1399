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
    L = jnp.linalg.cholesky(K)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(M, dtype=K.dtype), lower=True)
    Knm = var * jnp.exp(-0.5 * ((X[:, None] - Z[None]) ** 2).sum(-1) / ls**2)
    kappa = Knm @ Kinv
    W = Knm @ Linv.T
    return dict(X=X, Z=Z, y=y, ls=ls, var=var, jitt=jitt, Kinv=Kinv, Knm=Knm,
                kappa=kappa, L=L, Linv=Linv, W=W)


def test_fused_kappa(setup):
    s = setup
    Kt_ref = jnp.maximum(s["var"] + s["jitt"] - jnp.sum(s["W"] ** 2, 1), 1e-12)
    with pltpu.force_tpu_interpret_mode():
        kappa, ktilde = pk.fused_kappa(
            s["X"], s["Z"], s["Linv"].T, s["ls"], s["var"], s["jitt"], tile_b=128
        )
    # kappa forms in-kernel as (Knm L^-T) L^-1 -- must match Knm K^-1
    np.testing.assert_allclose(np.asarray(kappa), np.asarray(s["kappa"]), atol=2e-4)
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
    Linv = s["Linv"]
    with pltpu.force_tpu_interpret_mode():
        s1, S2, c_out, th_out, mf_out, vf_out = pk.fused_cavi_stats(
            s["X"], s["y"], s["Z"], Linv.T, mu, Sigma,
            s["ls"], s["var"], s["jitt"], rho, kind="rbf", lik="logistic", tile_b=128,
        )
    np.testing.assert_allclose(np.asarray(mf_out), np.asarray(mf), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vf_out), np.asarray(vf), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(S2), np.asarray(S2_ref), rtol=5e-3, atol=1e-3)
    # the E-step local vars come back so state.local_vars stays in sync
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(th_out), np.asarray(th), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "lik_name",
    ["logistic", "gaussian", "studentt", "laplace", "bayesiansvm", "matern32",
     "negbinomial", "poisson"],
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
        "negbinomial": (
            agp.NegBinomialLikelihood.create(5.0),
            np.floor(3.0 * np.exp(np.asarray(f))),
        ),
        "poisson": (
            agp.PoissonLikelihood.create(2.0),
            np.floor(3.0 * np.exp(np.asarray(f))),
        ),
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
    # Run the step jitted inside interpret mode (as production always does):
    # eager per-op dispatch interleaved with the mosaic interpreter's async
    # callback threads can deadlock jax's dispatch lock on small hosts.
    vu = jax.jit(variational_update)
    with pltpu.force_tpu_interpret_mode():
        m_p, s_p = jax.block_until_ready(vu(model, state0, X, y2))
        m_p, s_p = jax.block_until_ready(vu(m_p, s_p, X, y2))

    # the fused kernel computes kappa with the 3-pass bf16 product (_dot3,
    # Mosaic exposes no Precision.HIGH); vs the f32/f64 XLA arm that leaves
    # ~2^-16-level relative differences, amplified through the step
    np.testing.assert_allclose(np.asarray(s_p.mu), np.asarray(s_x.mu), rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_p.Sigma), np.asarray(s_x.Sigma), rtol=1e-2, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_p.local_vars["theta"]), np.asarray(s_x.local_vars["theta"]),
        rtol=1e-3, atol=1e-5,
    )
    _, _, _, _, c_key = spec
    if c_key is not None:
        np.testing.assert_allclose(
            np.asarray(s_p.local_vars[c_key]), np.asarray(s_x.local_vars[c_key]),
            rtol=1e-3, atol=1e-5,
        )
    if lik_name == "poisson":
        # the fused path's epilogue must reproduce the eager E-step's gamma
        # and closed-form rate update
        np.testing.assert_allclose(
            np.asarray(s_p.local_vars["gamma"]), np.asarray(s_x.local_vars["gamma"]),
            rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            float(m_p.likelihood.lam), float(m_x.likelihood.lam), rtol=1e-4
        )


def test_batched_kappa_moments_and_stats():
    """Multi-latent fused kernels (latent axis as a grid dimension) against
    einsum references, including AD through the custom VJP."""
    L, B, D, M = 3, 300, 5, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    X = jax.random.normal(ks[0], (B, D))
    Z = jax.random.normal(ks[1], (L, M, D))
    ls = jnp.array([1.1, 0.9, 1.4])
    var = jnp.array([1.0, 2.0, 0.7])
    jitt = 1e-4

    def gram(x, z, l, v):
        r2 = ((x[:, None, :] / l - z[None] / l) ** 2).sum(-1)
        return v * jnp.exp(-0.5 * r2)

    K = jax.vmap(lambda z, l, v: gram(z, z, l, v) + jitt * jnp.eye(M))(Z, ls, var)
    Lc = jnp.linalg.cholesky(K)
    Linv = jax.vmap(
        lambda l: jax.scipy.linalg.solve_triangular(l, jnp.eye(M, dtype=l.dtype), lower=True)
    )(Lc)
    mu = jax.random.normal(ks[2], (L, M))
    A = jax.random.normal(ks[3], (L, M, M))
    Sigma = jnp.einsum("lmn,lkn->lmk", A, A) / M + jnp.eye(M)[None]

    Knm = jax.vmap(lambda z, l, v: gram(X, z, l, v))(Z, ls, var)
    w_r = jnp.einsum("lbm,lnm->lbn", Knm, Linv)  # Knm L^-T
    kap_r = jnp.einsum("lbm,lnm,lnp->lbp", Knm, Linv, Linv)  # Knm K^-1
    mf_r = jnp.einsum("lbm,lm->lb", kap_r, mu)
    kt_r = jnp.maximum(var[:, None] + jitt - jnp.sum(w_r**2, -1), 1e-12)
    vf_r = kt_r + jnp.einsum("lbm,lmn,lbn->lb", kap_r, Sigma, kap_r)

    with pltpu.force_tpu_interpret_mode():
        kap, mf, vf = pk.fused_kappa_moments_batched(
            X, Z, jnp.swapaxes(Linv, -1, -2), ls, var, mu, Sigma, jitt,
            kind="rbf", tile_b=128
        )
    # kappa via two _dot3 products (3-pass bf16): ~2^-16-level differences
    # vs the f32/f64 reference
    np.testing.assert_allclose(np.asarray(kap), np.asarray(kap_r), atol=2e-3)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mf_r), atol=2e-3)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vf_r), atol=3e-3)

    g = jax.random.normal(ks[4], (L, B))
    th = jax.random.uniform(ks[5], (L, B))
    with pltpu.force_tpu_interpret_mode():
        s1, S2 = pk.cavi_stats_batched(kap_r, g, th, tile_b=128)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(jnp.einsum("lbm,lb->lm", kap_r, g)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(S2),
        np.asarray(jnp.einsum("lbm,lb,lbn->lmn", kap_r, th, kap_r)),
        rtol=1e-3, atol=1e-4,
    )

    # hyperparameter gradients flow through the XLA-twin VJP
    def loss(lsx):
        _, mfx, vfx = pk.fused_kappa_moments_batched(
            X, Z, jnp.swapaxes(Linv, -1, -2), lsx, var, mu, Sigma, jitt,
            kind="rbf", tile_b=128
        )
        return jnp.sum(mfx**2) + jnp.sum(vfx)

    def loss_ref(lsx):
        knm = jax.vmap(lambda z, l, v: gram(X, z, l, v))(Z, lsx, var)
        wx = jnp.einsum("lbm,lnm->lbn", knm, Linv)
        kx = jnp.einsum("lbm,lmn->lbn", wx, Linv)
        mfx = jnp.einsum("lbm,lm->lb", kx, mu)
        ktx = jnp.maximum(var[:, None] + jitt - jnp.sum(wx**2, -1), 1e-12)
        vfx = ktx + jnp.einsum("lbm,lmn,lbn->lb", kx, Sigma, kx)
        return jnp.sum(mfx**2) + jnp.sum(vfx)

    with pltpu.force_tpu_interpret_mode():
        g_p = jax.block_until_ready(jax.jit(jax.grad(loss))(ls))
    # backward runs through the _dot3 twin: bf16x3-level agreement
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(jax.grad(loss_ref)(ls)), rtol=2e-2
    )


def test_batched_kappa_moments_ard():
    """[L, D] per-latent ARD lengthscales fold into the coordinates inside
    the batched kernel (round-3: the ARD bail-out in _pallas_kind_batched is
    lifted)."""
    L, B, D, M = 2, 200, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    X = jax.random.normal(ks[0], (B, D))
    Z = jax.random.normal(ks[1], (L, M, D))
    ls = jnp.exp(0.3 * jax.random.normal(ks[2], (L, D)))  # [L, D] ARD
    var = jnp.array([1.0, 1.7])
    jitt = 1e-4

    def gram(x, z, l, v):
        r2 = ((x[:, None, :] / l - z[None] / l) ** 2).sum(-1)
        return v * jnp.exp(-0.5 * r2)

    K = jax.vmap(lambda z, l, v: gram(z, z, l, v) + jitt * jnp.eye(M))(Z, ls, var)
    Lc = jnp.linalg.cholesky(K)
    Linv = jax.vmap(
        lambda l: jax.scipy.linalg.solve_triangular(l, jnp.eye(M, dtype=l.dtype), lower=True)
    )(Lc)
    LinvT = jnp.swapaxes(Linv, -1, -2)
    mu = jax.random.normal(ks[3], (L, M))
    A = jax.random.normal(ks[4], (L, M, M))
    Sigma = jnp.einsum("lmn,lkn->lmk", A, A) / M + jnp.eye(M)[None]

    Knm = jax.vmap(lambda z, l, v: gram(X, z, l, v))(Z, ls, var)
    w_r = jnp.einsum("lbm,lnm->lbn", Knm, Linv)
    kap_r = jnp.einsum("lbm,lnm,lnp->lbp", Knm, Linv, Linv)
    mf_r = jnp.einsum("lbm,lm->lb", kap_r, mu)
    kt_r = jnp.maximum(var[:, None] + jitt - jnp.sum(w_r**2, -1), 1e-12)
    vf_r = kt_r + jnp.einsum("lbm,lmn,lbn->lb", kap_r, Sigma, kap_r)

    with pltpu.force_tpu_interpret_mode():
        kap, mf, vf = pk.fused_kappa_moments_batched(
            X, Z, LinvT, ls, var, mu, Sigma, jitt, kind="rbf", tile_b=128
        )
    np.testing.assert_allclose(np.asarray(kap), np.asarray(kap_r), atol=2e-3)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mf_r), atol=2e-3)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vf_r), atol=3e-3)

    # hyper-gradients wrt the [L, D] ARD leaves flow through the twin VJP
    def loss(lsx):
        _, mfx, vfx = pk.fused_kappa_moments_batched(
            X, Z, LinvT, lsx, var, mu, Sigma, jitt, kind="rbf", tile_b=128
        )
        return jnp.sum(mfx**2) + jnp.sum(vfx)

    def loss_ref(lsx):
        knm = jax.vmap(lambda z, l, v: gram(X, z, l, v))(Z, lsx, var)
        wx = jnp.einsum("lbm,lnm->lbn", knm, Linv)
        kx = jnp.einsum("lbm,lmn->lbn", wx, Linv)
        mfx = jnp.einsum("lbm,lm->lb", kx, mu)
        ktx = jnp.maximum(var[:, None] + jitt - jnp.sum(wx**2, -1), 1e-12)
        vfx = ktx + jnp.einsum("lbm,lmn,lbn->lb", kx, Sigma, kx)
        return jnp.sum(mfx**2) + jnp.sum(vfx)

    with pltpu.force_tpu_interpret_mode():
        g_p = jax.block_until_ready(jax.jit(jax.grad(loss))(ls))
    # f32 3-pass twin vs f64 einsum reference; the sum-of-squares loss
    # amplifies split-precision differences on the SMALL gradient entries,
    # so compare at the gradient's scale (the pallas grad matches its own
    # twin exactly) -- the sharp ARD-gradient oracle is
    # test_fused_production_step_ard_matches_xla (same math both arms)
    g_r = np.asarray(jax.grad(loss_ref)(ls))
    assert np.max(np.abs(np.asarray(g_p) - g_r)) < 2e-2 * np.max(np.abs(g_r))


def test_multiclass_production_step_fused_matches_xla(monkeypatch):
    """END-TO-END multi-latent: a multiclass SVGP CAVI step through the
    batched fused path (AGP_TPU_PALLAS=1 + interpret mode) matches the XLA
    einsum path."""
    import agp_tpu as agp
    from agp_tpu.inference.analytic_vi import variational_update
    from agp_tpu.training.train import init_state

    B, D, M, K = 200, 4, 32, 3
    key = jax.random.PRNGKey(1)
    X = jax.random.normal(key, (B, D), dtype=jnp.float64)
    y = np.asarray(jnp.argmax(X[:, :K], axis=1))
    model = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(1.3)),
        agp.LogisticSoftMaxLikelihood.create(K),
        agp.AnalyticVI(),
        Z=X[:M],
        optimiser=None,
    )
    y2, lik2 = model.likelihood.treat_labels(y)
    model = model.replace(likelihood=lik2)
    y2 = jnp.asarray(y2, X.dtype)
    state0 = init_state(model, X, y2)

    m_x, s_x = variational_update(model, state0, X, y2)
    m_x, s_x = variational_update(m_x, s_x, X, y2)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    # jit inside interpret mode: see note in
    # test_fused_production_step_matches_xla (eager/callback deadlock).
    vu = jax.jit(variational_update)
    with pltpu.force_tpu_interpret_mode():
        m_p, s_p = jax.block_until_ready(vu(model, state0, X, y2))
        m_p, s_p = jax.block_until_ready(vu(m_p, s_p, X, y2))

    # the fused kernel computes kappa with the 3-pass bf16 product (_dot3,
    # Mosaic exposes no Precision.HIGH); vs the f32/f64 XLA arm that leaves
    # ~2^-16-level relative differences, amplified through the step
    np.testing.assert_allclose(np.asarray(s_p.mu), np.asarray(s_x.mu), rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_p.Sigma), np.asarray(s_x.Sigma), rtol=1e-2, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_p.local_vars["theta"]), np.asarray(s_x.local_vars["theta"]),
        rtol=1e-3, atol=1e-5,
    )


def test_numerical_vi_fused_moments_match_xla(monkeypatch):
    """Sparse QuadratureVI with the fused tier forced on must match the XLA
    path: the round-3 advisor finding was that latent_moments' third output
    became the whitened W under the Pallas gates while numerical_vi's d1/d2
    contractions assumed kappa.  Since round 4 the tier is basis-transparent
    (kernels return kappa), so this must agree."""
    import agp_tpu as agp
    from agp_tpu.inference.numerical_vi import variational_update as nvu
    from agp_tpu.training.train import init_state

    B, D, M = 200, 4, 32
    X = jax.random.normal(jax.random.PRNGKey(0), (B, D), dtype=jnp.float64)
    y = np.asarray(jnp.sign(jnp.sin(X[:, 0]) + 0.1))
    model = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(1.3)),
        agp.LogisticLikelihood.create(),
        agp.QuadratureVI(n_points=20),
        Z=X[:M],
        optimiser=None,
    )
    y2, lik2 = model.likelihood.treat_labels(y)
    model = model.replace(likelihood=lik2)
    y2 = jnp.asarray(y2, X.dtype)
    state0 = init_state(model, X, y2)

    m_x, s_x = nvu(model, state0, X, y2)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    vu = jax.jit(nvu)
    with pltpu.force_tpu_interpret_mode():
        m_p, s_p = jax.block_until_ready(vu(model, state0, X, y2))

    np.testing.assert_allclose(np.asarray(s_p.mu), np.asarray(s_x.mu), rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_p.Sigma), np.asarray(s_x.Sigma), rtol=1e-2, atol=1e-4
    )


def test_hyper_gradients_through_fused_kappa(monkeypatch):
    """The hyperparameter step differentiates the ELBO through
    latent_moments -> fused_kappa; `pallas_call` itself has no AD rule, so
    fused_kappa carries a custom VJP that recomputes through an XLA twin.
    Gradients with the Pallas path forced on must match the pure-XLA path
    (the forward primals agree to f32 accuracy, the backward rule is the
    same linearization)."""
    import agp_tpu as agp
    from agp_tpu.inference import analytic_vi
    from agp_tpu.inference.objective import objective
    from agp_tpu.training.train import init_state

    B, D, M = 200, 4, 32
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, D), dtype=jnp.float64)
    y = jnp.sign(jnp.sin(X[:, 0]) + 0.1)
    model = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(1.4)),
        agp.LogisticLikelihood.create(),
        agp.AnalyticVI(),
        Z=X[:M],
        optimiser=None,
    )
    y2, lik2 = model.likelihood.treat_labels(np.asarray(y))
    model = model.replace(likelihood=lik2)
    y2 = jnp.asarray(y2, X.dtype)
    state = init_state(model, X, y2)

    def neg_elbo(log_k):
        kernel = jax.tree_util.tree_map(jnp.exp, log_k)
        m2 = model.replace(kernel=kernel)
        kmat = analytic_vi.compute_kmat(m2, X)
        return -objective(m2, state, X, y2, kmat=kmat)

    log_k = jax.tree_util.tree_map(jnp.log, model.kernel)
    g_xla = jax.grad(neg_elbo)(log_k)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.block_until_ready(jax.jit(jax.grad(neg_elbo))(log_k))

    np.testing.assert_allclose(
        np.asarray(g_pallas.lengthscale), np.asarray(g_xla.lengthscale),
        rtol=3e-2,  # bf16x3 kappa in both arms' forward, f64 XLA backward
    )
    np.testing.assert_allclose(
        np.asarray(g_pallas.variance), np.asarray(g_xla.variance), rtol=3e-2
    )


def test_fused_production_step_ard_matches_xla(monkeypatch):
    """ARD (per-dim) lengthscales fold into the kernel inputs (x/ls, Z/ls
    with ls=1 in-kernel): the fused path must match XLA end-to-end and ARD
    hyper-gradients must flow through the scaling op + custom VJP."""
    import agp_tpu as agp
    from agp_tpu.inference import analytic_vi
    from agp_tpu.inference.analytic_vi import _pallas_fused_spec, variational_update
    from agp_tpu.inference.objective import objective
    from agp_tpu.training.train import init_state

    B, D = 300, 8
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, D), dtype=jnp.float64)
    y = np.where(np.asarray(jnp.sin(X[:, 0])) > 0, 1.0, -1.0)
    ard = jnp.array([1.3, 0.8, 1.1, 0.9, 1.0, 1.2, 0.7, 1.4], dtype=jnp.float64)
    model = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=ard),
        agp.LogisticLikelihood.create(),
        agp.AnalyticVI(),
        Z=X[:64],
        optimiser=None,
    )
    y2, lik2 = model.likelihood.treat_labels(y)
    model = model.replace(likelihood=lik2)
    y2 = jnp.asarray(y2, X.dtype)
    state0 = init_state(model, X, y2)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    assert _pallas_fused_spec(model) is not None  # ARD no longer excluded
    monkeypatch.delenv("AGP_TPU_PALLAS", raising=False)

    m_x, s_x = variational_update(model, state0, X, y2)
    m_x, s_x = variational_update(m_x, s_x, X, y2)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    vu = jax.jit(variational_update)
    with pltpu.force_tpu_interpret_mode():
        m_p, s_p = jax.block_until_ready(vu(model, state0, X, y2))
        m_p, s_p = jax.block_until_ready(vu(m_p, s_p, X, y2))
    # the fused kernel computes kappa with the 3-pass bf16 product (_dot3,
    # Mosaic exposes no Precision.HIGH); vs the f32/f64 XLA arm that leaves
    # ~2^-16-level relative differences, amplified through the step
    np.testing.assert_allclose(np.asarray(s_p.mu), np.asarray(s_x.mu), rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_p.Sigma), np.asarray(s_x.Sigma), rtol=1e-2, atol=1e-4
    )

    # per-dim hyper-gradients through the fused kappa path
    def neg_elbo(log_ls):
        m2 = model.replace(kernel=model.kernel.replace(lengthscale=jnp.exp(log_ls)))
        kmat = analytic_vi.compute_kmat(m2, X)
        return -objective(m2, s_x, X, y2, kmat=kmat)

    log_ls = jnp.log(model.kernel.lengthscale)
    monkeypatch.delenv("AGP_TPU_PALLAS", raising=False)
    g_xla = jax.grad(neg_elbo)(log_ls)
    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.block_until_ready(jax.jit(jax.grad(neg_elbo))(log_ls))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_xla), rtol=5e-3, atol=1e-6)


def test_auto_gate_full_batch_uses_m_alone(monkeypatch):
    """Full-batch sparse AnalyticVI has stochastic=False and batchsize=0
    (config.py) -- the auto gate must treat that as "gate on M alone", not
    as a tiny minibatch that disables the tier (round-4 advisor finding:
    `bs <= 32768` on batchsize 0 silently killed the fused tier for
    full-batch models in the measured win region)."""
    import agp_tpu as agp
    from agp_tpu.inference import analytic_vi

    monkeypatch.delenv("AGP_TPU_PALLAS", raising=False)
    monkeypatch.setattr(pk, "available", lambda: True)
    kern = agp.SqExponentialKernel()
    X = np.random.default_rng(0).normal(size=(64, 2))
    Z = X[:20]

    def mk(inference, M=520):
        Zbig = np.random.default_rng(1).normal(size=(M, 2))
        return agp.SVGP.create(
            kern, agp.LogisticLikelihood.create(), inference, Zbig,
            optimiser=None,
        )

    # full batch: tier ON (gates on M alone; round-5 transposed kernel
    # wins at every measured shape M >= 64)
    assert analytic_vi._pallas_kind(mk(agp.AnalyticVI())) == "rbf"
    assert analytic_vi._pallas_kind(mk(agp.AnalyticVI(), M=64)) == "rbf"
    # stochastic below the smallest measured win batch: OFF
    assert analytic_vi._pallas_kind(mk(agp.AnalyticSVI(2048))) is None
    # stochastic at/above it: ON
    assert analytic_vi._pallas_kind(mk(agp.AnalyticSVI(4096))) == "rbf"
    assert analytic_vi._pallas_kind(mk(agp.AnalyticSVI(65536))) == "rbf"
    # M below the measured region: OFF regardless
    assert analytic_vi._pallas_kind(mk(agp.AnalyticVI(), M=32)) is None

    # batched (multi-latent) tier: same sentinel handling at its own knee
    def mk_mc(inference, M=520):
        Zbig = np.random.default_rng(2).normal(size=(M, 2))
        return agp.SVGP.create(
            kern, agp.LogisticSoftMaxLikelihood.create(3), inference, Zbig,
            optimiser=None,
        )

    assert analytic_vi._pallas_kind_batched(mk_mc(agp.AnalyticVI())) == "rbf"
    assert analytic_vi._pallas_kind_batched(mk_mc(agp.AnalyticSVI(8192))) is None
    assert analytic_vi._pallas_kind_batched(mk_mc(agp.AnalyticSVI(16384))) == "rbf"


def test_fused_multiclass_step_matches_xla(monkeypatch):
    """The fully-fused multiclass megakernel (all K latents + the
    logistic-softmax triple-augmentation E-step in ONE kernel) must
    reproduce the XLA path's CAVI trajectory.  The in-kernel digamma is a
    recurrence+asymptotic-series approximation (~1e-9) vs
    jax.scipy.special.digamma, and the 3-pass bf16 dots differ from f64 at
    ~2^-16 -- loose tolerances per the other fused parity tests."""
    import agp_tpu as agp
    from agp_tpu.inference.analytic_vi import variational_update
    from agp_tpu.training.train import init_state

    monkeypatch.delenv("AGP_TPU_PALLAS", raising=False)
    key = jax.random.PRNGKey(0)
    B, D, M, K = 96, 3, 24, 3
    X = jax.random.normal(key, (B, D), jnp.float64)
    centers = jnp.eye(K, D, dtype=jnp.float64) * 1.5
    yv = np.asarray(jnp.argmin(
        jnp.sum((X[:, None] - centers[None]) ** 2, -1), axis=1
    ))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray([1.0, 1.4, 0.8])),
        agp.LogisticSoftMaxLikelihood.create(K),
        agp.AnalyticSVI(B), Z=X[:M], optimiser=None,
    )
    y2, tl = m.likelihood.treat_labels(yv)
    m = m.replace(likelihood=tl)
    y2 = jnp.asarray(y2, jnp.float64)
    s0 = init_state(m, X, y2)

    m_x, s_x = variational_update(m, s0, X, y2)
    m_x, s_x = variational_update(m_x, s_x, X, y2)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    vu = jax.jit(variational_update)
    with pltpu.force_tpu_interpret_mode():
        m_p, s_p = jax.block_until_ready(vu(m, s0, X, y2))
        m_p, s_p = jax.block_until_ready(vu(m_p, s_p, X, y2))
    np.testing.assert_allclose(np.asarray(s_p.mu), np.asarray(s_x.mu),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_p.Sigma), np.asarray(s_x.Sigma),
                               rtol=1e-2, atol=1e-4)
    for k in ("theta", "gamma", "alpha", "c"):
        np.testing.assert_allclose(
            np.asarray(s_p.local_vars[k]), np.asarray(s_x.local_vars[k]),
            rtol=1e-2, atol=1e-4, err_msg=k,
        )


def test_fused_heteroscedastic_step_matches_xla(monkeypatch):
    """The fully-fused heteroscedastic megakernel (both latents + the
    coupled E-step + the XLA-side lambda epilogue) must reproduce the XLA
    path's trajectory."""
    import agp_tpu as agp
    from agp_tpu.inference.analytic_vi import variational_update
    from agp_tpu.training.train import init_state

    monkeypatch.delenv("AGP_TPU_PALLAS", raising=False)
    key = jax.random.PRNGKey(0)
    B, D, M = 96, 3, 24
    # randn inputs: the uniform-square fixture gives cond(Kmm) ~ 4e5,
    # where the 3-pass bf16 kappa's 0.5% noise amplifies past the
    # tolerance through the step (same class as the other parity tests'
    # conditioning choices, not a formula discrepancy)
    X = jax.random.normal(key, (B, D), jnp.float64)
    f = jnp.sin(2 * X[:, 0])
    g = -1.0 + jnp.tanh(X[:, 1])
    noise = jnp.sqrt(1.0 / (6.0 * jax.nn.sigmoid(g)))
    yv = np.asarray(f + noise * jax.random.normal(jax.random.PRNGKey(1), f.shape, jnp.float64))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.HeteroscedasticLikelihood.create(lam=6.0),
        agp.AnalyticSVI(B), Z=X[:M], optimiser=None,
    )
    y2, tl = m.likelihood.treat_labels(yv)
    m = m.replace(likelihood=tl)
    y2 = jnp.asarray(y2, jnp.float64)
    s0 = init_state(m, X, y2)

    m_x, s_x = variational_update(m, s0, X, y2)
    m_x, s_x = variational_update(m_x, s_x, X, y2)

    monkeypatch.setenv("AGP_TPU_PALLAS", "1")
    vu = jax.jit(variational_update)
    with pltpu.force_tpu_interpret_mode():
        m_p, s_p = jax.block_until_ready(vu(m, s0, X, y2))
        m_p, s_p = jax.block_until_ready(vu(m_p, s_p, X, y2))
    np.testing.assert_allclose(np.asarray(s_p.mu), np.asarray(s_x.mu),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_p.Sigma), np.asarray(s_x.Sigma),
                               rtol=1e-2, atol=1e-4)
    # the lambda epilogue must track the XLA path's closed-form update
    np.testing.assert_allclose(float(m_p.likelihood.lam), float(m_x.likelihood.lam),
                               rtol=1e-3)
    for k in ("theta", "gamma", "phi", "sigg", "c"):
        np.testing.assert_allclose(
            np.asarray(s_p.local_vars[k]), np.asarray(s_x.local_vars[k]),
            rtol=1e-2, atol=1e-4, err_msg=k,
        )


def test_megakernel_auto_gates(monkeypatch):
    """The fully-fused multiclass/heteroscedastic specs must fire exactly
    in their measured regions (K*M <= 2560, M <= 256 resp. M <= 256;
    stochastic b >= 2048 or full batch) and stay out of the batched
    tier's M >= 512 region."""
    import agp_tpu as agp
    from agp_tpu.inference import analytic_vi as av

    monkeypatch.delenv("AGP_TPU_PALLAS", raising=False)
    monkeypatch.setattr(pk, "available", lambda: True)
    rng = np.random.default_rng(0)

    def mc(inference, M=64, K=10):
        Z = rng.normal(size=(max(M, 16), 2))[:M]
        return agp.SVGP.create(
            agp.SqExponentialKernel(), agp.LogisticSoftMaxLikelihood.create(K),
            inference, Z, optimiser=None,
        )

    assert av._pallas_fused_mc_spec(mc(agp.AnalyticSVI(2048))) == "rbf"
    assert av._pallas_fused_mc_spec(mc(agp.AnalyticSVI(1024))) is None
    assert av._pallas_fused_mc_spec(mc(agp.AnalyticVI())) == "rbf"  # full batch
    # VMEM bounds: K*M > 2560 or M > 256 -> batched tier territory
    assert av._pallas_fused_mc_spec(mc(agp.AnalyticSVI(2048), M=512, K=3)) is None
    assert av._pallas_fused_mc_spec(mc(agp.AnalyticSVI(2048), M=256, K=11)) is None

    def het(inference, M=64):
        Z = rng.normal(size=(max(M, 16), 2))[:M]
        return agp.SVGP.create(
            agp.SqExponentialKernel(), agp.HeteroscedasticLikelihood.create(),
            inference, Z, optimiser=None,
        )

    assert av._pallas_fused_het_spec(het(agp.AnalyticSVI(2048))) == "rbf"
    assert av._pallas_fused_het_spec(het(agp.AnalyticSVI(1024))) is None
    assert av._pallas_fused_het_spec(het(agp.AnalyticVI())) == "rbf"
    assert av._pallas_fused_het_spec(het(agp.AnalyticSVI(2048), M=512)) is None
