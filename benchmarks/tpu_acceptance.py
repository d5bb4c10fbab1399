"""On-hardware acceptance sweep: the suite's accuracy oracles, re-run on
the REAL TPU chip in f32.

The CPU test suite runs in x64 and cannot catch TPU-specific numerics --
e.g. the round-2 streaming bug where the TPU's default f32 matmul precision
(bf16 passes) compounded error in the online corrections until the chain
NaN'd, invisible on CPU.  This sweep drives every model family end-to-end
through the public API on the tunneled chip with loose behavioral
thresholds (reference test strategy, SURVEY.md section 4) and prints one
PASS/FAIL JSON line per check plus a summary.

Run: python benchmarks/tpu_acceptance.py          (~3-5 min warm cache)
"""
from __future__ import annotations

import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
import json
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import agp_tpu as agp
from agp_tpu.inference.analytic_vi import pallas_override

DTYPE = jnp.float32
RESULTS = []


def check(name):
    def deco(fn):
        def run():
            try:
                value, threshold, ok = fn()
                RESULTS.append(
                    {"check": name, "ok": bool(ok), "value": float(value),
                     "threshold": threshold}
                )
            except Exception as e:  # noqa: BLE001 - report, don't abort sweep
                traceback.print_exc()
                RESULTS.append({"check": name, "ok": False, "error": repr(e)})
            print(json.dumps(RESULTS[-1]), flush=True)

        run.check_name = name
        return run

    return deco


def _toy(n, d, key=0, ls=1.0):
    X = jax.random.uniform(jax.random.PRNGKey(key), (n, d), dtype=DTYPE) * 4 - 2
    f = jnp.sin(2 * X[:, 0]) + 0.5 * (X[:, 1] if d > 1 else 0.0)
    return X, f


@check("gp_exact_regression_rmse")
def gp_exact():
    X, f = _toy(400, 2)
    y = np.asarray(f + 0.05 * jax.random.normal(jax.random.PRNGKey(1), f.shape, DTYPE))
    m = agp.GP.create(X, y, agp.SqExponentialKernel(), noise=0.05, optimiser=None)
    m, s = agp.train(m, iterations=3)
    mu = agp.predict_f(m, s, X)
    rmse = float(jnp.sqrt(jnp.mean((mu - f) ** 2)))
    return rmse, "< 0.1", rmse < 0.1


@check("svgp_logistic_accuracy")
def svgp_logistic():
    X, f = _toy(20_000, 2, key=2)
    y = np.asarray(jnp.sign(f))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
        agp.AnalyticSVI(1024), Z=X[:64], optimiser=None,
    )
    m, s = agp.train(m, X, y, iterations=500)
    acc = float(jnp.mean((agp.predict_y(m, s, X[:4096]) > 0) == (jnp.asarray(y[:4096]) > 0)))
    return acc, "> 0.93", acc > 0.93


@check("svgp_hyperopt_lengthscale_moves")
def svgp_hyperopt():
    X, f = _toy(2000, 2, key=3)
    y = np.asarray(f + 0.05 * jax.random.normal(jax.random.PRNGKey(4), f.shape, DTYPE))
    import optax

    m = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(3.0, DTYPE)),
        agp.GaussianLikelihood.create(0.05, opt_noise=False),
        agp.AnalyticVI(), Z=X[:32], optimiser=optax.adam(0.05), atfrequency=5,
    )
    m, s = agp.train(m, X, y, iterations=120)
    ls = float(jnp.ravel(m.kernel.lengthscale)[0])
    moved = abs(ls - 3.0) > 0.3 and np.isfinite(ls)
    mu = agp.predict_f(m, s, X[:512])
    rmse = float(jnp.sqrt(jnp.mean((mu - f[:512]) ** 2)))
    return rmse, "< 0.25 and ls moved", rmse < 0.25 and moved


@check("multiclass_logistic_softmax_accuracy")
def multiclass():
    key = jax.random.PRNGKey(5)
    X = jax.random.normal(key, (8000, 2), DTYPE)
    centers = jnp.asarray([[1.5, 0.0], [-1.5, 1.0], [0.0, -1.5]], DTYPE)
    d2 = jnp.sum((X[:, None, :] - centers[None]) ** 2, -1)
    y = np.asarray(jnp.argmin(d2, axis=1))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.LogisticSoftMaxLikelihood.create(3),
        agp.AnalyticSVI(512), Z=X[:48], optimiser=None,
    )
    m, s = agp.train(m, X, y, iterations=400)
    pred = agp.predict_y(m, s, X[:2048])
    acc = float(jnp.mean(pred == jnp.asarray(y[:2048])))
    return acc, "> 0.85", acc > 0.85


@check("heteroscedastic_rmse")
def hetero():
    X, f = _toy(3000, 1, key=6)
    g = -1.5 + 1.2 * jnp.tanh(X[:, 0])
    noise = jnp.sqrt(1.0 / (8.0 * jax.nn.sigmoid(g)))
    y = np.asarray(f + noise * jax.random.normal(jax.random.PRNGKey(7), f.shape, DTYPE))
    m = agp.VGP.create(
        X[:512], y[:512], agp.SqExponentialKernel(),
        agp.HeteroscedasticLikelihood.create(lam=8.0),
        agp.AnalyticVI(), optimiser=None,
    )
    m, s = agp.train(m, iterations=60)
    mu = agp.predict_f(m, s, X[:512])
    rmse = float(jnp.sqrt(jnp.mean((mu[0] - f[:512]) ** 2)))
    return rmse, "< 0.4", rmse < 0.4 and np.isfinite(rmse)


@check("vstp_student_t_robust_rmse")
def vstp():
    X, f = _toy(400, 2, key=8)
    y = np.array(f + 0.05 * jax.random.normal(jax.random.PRNGKey(9), f.shape, DTYPE))
    y[::29] += 8.0  # outliers
    m = agp.VStP.create(
        X, y, agp.SqExponentialKernel(), agp.StudentTLikelihood.create(4.0),
        agp.AnalyticVI(), nu=5.0, optimiser=None,
    )
    m, s = agp.train(m, iterations=60)
    mu = agp.predict_f(m, s, X)
    rmse = float(jnp.sqrt(jnp.mean((mu - f) ** 2)))
    return rmse, "< 0.3", rmse < 0.3


@check("online_stream_finite_and_accurate")
def online():
    X, f = _toy(4096, 2, key=10)
    y = np.asarray(f + 0.05 * jax.random.normal(jax.random.PRNGKey(11), f.shape, DTYPE))
    m = agp.OnlineSVGP.create(
        agp.SqExponentialKernel(), agp.GaussianLikelihood.create(0.05, opt_noise=False),
        agp.AnalyticVI(), n_dim=2, capacity=128, optimiser=None,
    )
    s = None
    for i in range(16):
        m, s = agp.online_train(m, X[i * 256:(i + 1) * 256], y[i * 256:(i + 1) * 256],
                                state=s, iterations=20)
    mu = agp.predict_f(m, s, X[:512])
    rmse = float(jnp.sqrt(jnp.mean((mu - f[:512]) ** 2)))
    return rmse, "< 0.15", rmse < 0.15


@check("gibbs_vs_cavi_posterior_corr")
def gibbs_cavi():
    X, f = _toy(48, 2, key=12)
    y = np.asarray(jnp.sign(f))
    mv = agp.VGP.create(X, y, agp.SqExponentialKernel(),
                        agp.LogisticLikelihood.create(), agp.AnalyticVI(), optimiser=None)
    mv, sv = agp.train(mv, iterations=60)
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(),
                         agp.LogisticLikelihood.create(), agp.GibbsSampling(n_burnin=200))
    samples = agp.sample(mg, 600, key=jax.random.PRNGKey(13))
    gmean = jnp.mean(samples, axis=0)[0]
    corr = float(jnp.corrcoef(jnp.stack([sv.mu[0], gmean]))[0, 1])
    return corr, "> 0.95", corr > 0.95


@check("mo_mixed_likelihoods_finite")
def mo():
    X, f = _toy(512, 2, key=14)
    y1 = np.asarray(f)
    y2 = np.sign(np.asarray(f) - 0.2)
    m = agp.MOSVGP.create(
        agp.SqExponentialKernel(),
        [agp.GaussianLikelihood.create(0.1, opt_noise=False), agp.LogisticLikelihood.create()],
        agp.AnalyticVI(), X[:16], n_latent=2, optimiser=None,
    )
    m, s = agp.mo_train(m, X, [y1, y2], iterations=60)
    mu, var = agp.mo_predict_f(m, s, X[:256])
    rmse = float(jnp.sqrt(jnp.mean((mu[0] - f[:256]) ** 2)))
    ok = rmse < 0.35 and bool(jnp.isfinite(mu).all() and jnp.isfinite(var).all())
    return rmse, "< 0.35, all finite", ok


@check("quadrature_vi_logistic_accuracy")
def quad_vi():
    """NumericalVI path (GH quadrature + PSD-backtracking Sigma updates).
    Uses the reference's NumericalVI-level learning rate (Momentum(1e-3),
    numericalVI.jl:15); the QuadratureVI ctor default (1e-5) is faithful to
    the reference but far too slow for a convergence oracle."""
    import optax

    X, f = _toy(400, 2, key=18)
    y = np.asarray(jnp.sign(f))
    m = agp.VGP.create(X, y, agp.SqExponentialKernel(),
                       agp.LogisticLikelihood.create(),
                       agp.QuadratureVI(n_points=30, optimiser=optax.sgd(1e-3, momentum=0.9)),
                       optimiser=None)
    m, s = agp.train(m, iterations=300)
    acc = float(jnp.mean((agp.predict_y(m, s, X) > 0) == (jnp.asarray(y) > 0)))
    return acc, "> 0.9", acc > 0.9


@check("nuts_vs_exact_posterior_corr")
def nuts():
    """Whitened iterative NUTS against the closed-form conjugate posterior."""
    X, f = _toy(64, 2, key=19)
    y = np.asarray(f + 0.1 * jax.random.normal(jax.random.PRNGKey(20), f.shape, DTYPE))
    mg = agp.MCGP.create(X, y, agp.SqExponentialKernel(),
                         agp.GaussianLikelihood.create(0.01, opt_noise=False),
                         agp.HMCSampling(n_burnin=300))
    fs = agp.sample_nuts(mg, 700, key=jax.random.PRNGKey(21))
    post_mean = jnp.mean(fs, axis=0)[0]
    # exact conjugate posterior mean
    K = agp.SqExponentialKernel().gram(X, X)
    exact = K @ jnp.linalg.solve(K + 0.01 * jnp.eye(64), jnp.asarray(y))
    corr = float(jnp.corrcoef(jnp.stack([post_mean, exact]))[0, 1])
    return corr, "> 0.95", corr > 0.95


@check("fused_tier_m512_accuracy")
def fused_tier():
    """Exercises the auto-gated fused Pallas path (M >= 512) end-to-end,
    including the 3-pass in-kernel kappa product (_dot3)."""
    key = jax.random.PRNGKey(16)
    X = jax.random.normal(key, (60_000, 8), DTYPE)
    w = jax.random.normal(jax.random.PRNGKey(17), (8,), DTYPE)
    y = np.asarray(jnp.sign(X @ w))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(2.0, DTYPE)),
        agp.LogisticLikelihood.create(),
        agp.AnalyticSVI(8192, minibatch_sampling="slice"), Z=X[:512], optimiser=None,
    )
    with pallas_override("on"):
        m, s = agp.train(m, X, y, iterations=150)
        acc = float(jnp.mean((agp.predict_y(m, s, X[:8192]) > 0) == (jnp.asarray(y[:8192]) > 0)))
    return acc, "> 0.9", acc > 0.9


@check("proba_y_calibrated_finite")
def proba():
    X, f = _toy(2000, 2, key=15)
    y = np.asarray(jnp.sign(f))
    m = agp.SVGP.create(agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
                        agp.AnalyticVI(), Z=X[:32], optimiser=None)
    m, s = agp.train(m, X, y, iterations=100)
    p = agp.proba_y(m, s, X[:1024])
    inb = bool(jnp.all((p >= 0) & (p <= 1)))
    # probabilities should separate the classes
    auc_proxy = float(jnp.mean(p[jnp.asarray(y[:1024]) > 0]) - jnp.mean(p[jnp.asarray(y[:1024]) < 0]))
    return auc_proxy, "> 0.3, p in [0,1]", inb and auc_proxy > 0.3


# ---------------------------------------------------------------------------
# Round-3 extension: every fused likelihood at the M >= 512 tier gets its own
# on-hardware oracle (round 2 proved CPU interpret-mode parity cannot see TPU
# numerics), plus online-with-hyperopt interleaving, MO proba_y, and the
# batched (multi-latent) fused tier.
def _fused_reg_data(key, noise_fn):
    X, f = _toy(30_000, 2, key=key)
    y = np.asarray(noise_fn(f))
    return X, f, y


def _fused_svgp(lik, X, minibatch=8192):
    return agp.SVGP.create(
        agp.SqExponentialKernel(), lik,
        agp.AnalyticSVI(minibatch, minibatch_sampling="slice"),
        Z=X[:512], optimiser=None,
    )


def _fused_reg_check(lik, key, noise_fn, thresh):
    X, f, y = _fused_reg_data(key, noise_fn)
    m = _fused_svgp(lik, X)
    # force the tier: the round-4 auto gate needs per-step batch > 32768
    # (GATE_AB.json) and these oracles exist to prove KERNEL correctness
    # on hardware at every fused likelihood, not the gate policy
    with pallas_override("on"):
        m, s = agp.train(m, X, y, iterations=150)
        mu = agp.predict_f(m, s, X[:4096])
    rmse = float(jnp.sqrt(jnp.mean((mu - f[:4096]) ** 2)))
    return rmse, f"< {thresh}", rmse < thresh


@check("fused_tier_studentt_rmse")
def fused_studentt():
    def noise(f):
        e = 0.1 * jax.random.t(jax.random.PRNGKey(31), 4.0, f.shape, DTYPE)
        return f + e

    return _fused_reg_check(agp.StudentTLikelihood.create(4.0), 30, noise, 0.25)


@check("fused_tier_laplace_rmse")
def fused_laplace():
    def noise(f):
        e = jax.random.laplace(jax.random.PRNGKey(33), f.shape, DTYPE)
        return f + 0.1 * e

    return _fused_reg_check(agp.LaplaceLikelihood.create(0.1), 32, noise, 0.25)


@check("fused_tier_matern32lik_rmse")
def fused_matern32lik():
    def noise(f):
        return f + 0.1 * jax.random.normal(jax.random.PRNGKey(35), f.shape, DTYPE)

    return _fused_reg_check(agp.Matern32Likelihood.create(0.2), 34, noise, 0.3)


@check("fused_tier_svm_accuracy")
def fused_svm():
    X, f = _toy(30_000, 2, key=36)
    y = np.asarray(jnp.sign(f))
    m = _fused_svgp(agp.BayesianSVM.create(), X)
    m, s = agp.train(m, X, y, iterations=150)
    acc = float(jnp.mean((agp.predict_y(m, s, X[:4096]) > 0) == (jnp.asarray(y[:4096]) > 0)))
    return acc, "> 0.9", acc > 0.9


@check("fused_tier_poisson_rate_corr")
def fused_poisson():
    X, f = _toy(30_000, 2, key=38)
    rate = 20.0 * jax.nn.sigmoid(f)
    y = np.asarray(jax.random.poisson(jax.random.PRNGKey(39), rate)).astype(np.int64)
    m = _fused_svgp(agp.PoissonLikelihood.create(10.0), X)
    m, s = agp.train(m, X, y, iterations=150)
    pred = agp.predict_y(m, s, X[:4096])
    corr = float(jnp.corrcoef(jnp.stack([pred, rate[:4096]]))[0, 1])
    return corr, "> 0.8", corr > 0.8 and np.isfinite(corr)


@check("fused_tier_negbinomial_mean_corr")
def fused_negbinomial():
    X, f = _toy(30_000, 2, key=40)
    p = jax.nn.sigmoid(f - 1.0)
    r = 5.0
    mean = r * p / (1.0 - p)
    rs = np.random.RandomState(41)
    # NB(r, p) as Poisson(Gamma(r, p/(1-p)))
    lam = rs.gamma(r, np.asarray(p / (1.0 - p)))
    y = rs.poisson(lam).astype(np.int64)
    m = _fused_svgp(agp.NegBinomialLikelihood.create(r), X)
    m, s = agp.train(m, X, y, iterations=150)
    pred = agp.predict_y(m, s, X[:4096])
    corr = float(jnp.corrcoef(jnp.stack([pred, mean[:4096]]))[0, 1])
    return corr, "> 0.8", corr > 0.8 and np.isfinite(corr)


@check("fused_batched_multiclass_m512_accuracy")
def fused_batched_multiclass():
    """Batched (multi-latent) fused tier on chip: K=3 logistic-softmax at
    M=512 drives fused_kappa_moments_batched + cavi_stats_batched."""
    key = jax.random.PRNGKey(42)
    X = jax.random.normal(key, (30_000, 2), DTYPE)
    centers = jnp.asarray([[1.5, 0.0], [-1.5, 1.0], [0.0, -1.5]], DTYPE)
    d2 = jnp.sum((X[:, None, :] - centers[None]) ** 2, -1)
    y = np.asarray(jnp.argmin(d2, axis=1))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.LogisticSoftMaxLikelihood.create(3),
        agp.AnalyticSVI(8192, minibatch_sampling="slice"),
        Z=X[:512], optimiser=None,
    )
    with pallas_override("on"):
        m, s = agp.train(m, X, y, iterations=200)
        pred = agp.predict_y(m, s, X[:4096])
    acc = float(jnp.mean(pred == jnp.asarray(y[:4096])))
    return acc, "> 0.85", acc > 0.85


@check("fused_batched_heteroscedastic_m512_rmse")
def fused_batched_hetero():
    """Batched (L=2) fused tier on chip at the auto-gate shape (M=512,
    B=16384): heteroscedastic drives fused_kappa_moments_batched +
    cavi_stats_batched with two coupled latents -- interpret-mode parity
    did not transfer to chip numerics twice in rounds 2-3, so every
    batched-tier consumer gets its own hardware oracle
    (reference semantics: likelihood/heteroscedastic.jl:50-96)."""
    X, f = _toy(30_000, 1, key=47)
    g = -1.5 + 1.2 * jnp.tanh(X[:, 0])
    noise = jnp.sqrt(1.0 / (8.0 * jax.nn.sigmoid(g)))
    y = np.asarray(f + noise * jax.random.normal(jax.random.PRNGKey(48), f.shape, DTYPE))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.HeteroscedasticLikelihood.create(lam=8.0),
        agp.AnalyticSVI(16384, minibatch_sampling="slice"),
        Z=X[:512], optimiser=None,
    )
    with pallas_override("on"):
        m, s = agp.train(m, X, y, iterations=100)
        mu = agp.predict_f(m, s, X[:4096])
    rmse = float(jnp.sqrt(jnp.mean((mu[0] - f[:4096]) ** 2)))
    return rmse, "< 0.4", rmse < 0.4 and np.isfinite(rmse)


@check("fused_batched_mosvgp_m512_rmse")
def fused_batched_mosvgp():
    """Batched fused tier under the MO mixing path at the auto-gate shape
    (M=512, B=16384): Q=2 shared latents, mixed Gaussian+Logistic tasks
    (reference semantics: models/MOSVGP.jl:40-115)."""
    X, f = _toy(30_000, 2, key=49)
    y1 = np.asarray(f)
    y2 = np.sign(np.asarray(f) - 0.2)
    m = agp.MOSVGP.create(
        agp.SqExponentialKernel(),
        [agp.GaussianLikelihood.create(0.1, opt_noise=False),
         agp.LogisticLikelihood.create()],
        agp.AnalyticSVI(16384), X[:512], n_latent=2, optimiser=None,
    )
    with pallas_override("on"):
        m, s = agp.mo_train(m, X, [y1, y2], iterations=100)
        mu, var = agp.mo_predict_f(m, s, X[:2048])
    rmse = float(jnp.sqrt(jnp.mean((mu[0] - f[:2048]) ** 2)))
    ok = rmse < 0.35 and bool(jnp.isfinite(mu).all() and jnp.isfinite(var).all())
    return rmse, "< 0.35, all finite", ok


@check("fused_tier_ard_accuracy")
def fused_ard():
    """Fused tier with an ARD (per-dimension) lengthscale: exercises
    _fused_scaled_inputs' coordinate folding on hardware (the single-latent
    kernels always see an isotropic ls; hyper-gradients flow through the
    XLA scaling op)."""
    key = jax.random.PRNGKey(50)
    X = jax.random.normal(key, (30_000, 4), DTYPE) * jnp.asarray(
        [1.0, 2.0, 0.5, 3.0], DTYPE
    )
    w = jnp.asarray([1.0, -0.5, 2.0, 0.1], DTYPE)
    y = np.asarray(jnp.sign(X @ w))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(
            lengthscale=jnp.asarray([1.0, 2.0, 0.5, 3.0], DTYPE)
        ),
        agp.LogisticLikelihood.create(),
        agp.AnalyticSVI(8192, minibatch_sampling="slice"),
        Z=X[:512], optimiser=None,
    )
    with pallas_override("on"):
        m, s = agp.train(m, X, y, iterations=150)
        acc = float(jnp.mean(
            (agp.predict_y(m, s, X[:8192]) > 0) == (jnp.asarray(y[:8192]) > 0)
        ))
    return acc, "> 0.9", acc > 0.9


@check("fused_mc_megakernel_m64_accuracy")
def fused_mc_megakernel():
    """The fully-fused multiclass megakernel (all K latents + the
    logistic-softmax triple-augmentation E-step in ONE kernel, incl. the
    in-kernel digamma series) end-to-end on chip at its gate shape
    (K*M <= 2560, M <= 256)."""
    key = jax.random.PRNGKey(51)
    X = jax.random.normal(key, (30_000, 2), DTYPE)
    centers = jnp.asarray([[1.5, 0.0], [-1.5, 1.0], [0.0, -1.5]], DTYPE)
    d2 = jnp.sum((X[:, None, :] - centers[None]) ** 2, -1)
    y = np.asarray(jnp.argmin(d2, axis=1))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.LogisticSoftMaxLikelihood.create(3),
        agp.AnalyticSVI(2048, minibatch_sampling="slice"),
        Z=X[:64], optimiser=None,
    )
    with pallas_override("on"):
        m, s = agp.train(m, X, y, iterations=300)
        pred = agp.predict_y(m, s, X[:4096])
    acc = float(jnp.mean(pred == jnp.asarray(y[:4096])))
    return acc, "> 0.85", acc > 0.85


@check("fused_het_megakernel_m64_rmse")
def fused_het_megakernel():
    """The fully-fused heteroscedastic megakernel (both latents + the
    coupled E-step in one kernel; lambda MLE as an XLA epilogue)
    end-to-end on chip at its gate shape (M <= 256)."""
    X, f = _toy(30_000, 1, key=52)
    g = -1.5 + 1.2 * jnp.tanh(X[:, 0])
    noise = jnp.sqrt(1.0 / (8.0 * jax.nn.sigmoid(g)))
    y = np.asarray(f + noise * jax.random.normal(jax.random.PRNGKey(53), f.shape, DTYPE))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.HeteroscedasticLikelihood.create(lam=8.0),
        agp.AnalyticSVI(2048, minibatch_sampling="slice"),
        Z=X[:64], optimiser=None,
    )
    with pallas_override("on"):
        m, s = agp.train(m, X, y, iterations=200)
        mu = agp.predict_f(m, s, X[:4096])
    rmse = float(jnp.sqrt(jnp.mean((mu[0] - f[:4096]) ** 2)))
    return rmse, "< 0.4", rmse < 0.4 and np.isfinite(rmse)


@check("real_data_breast_cancer_accuracy")
def real_data():
    """REAL tabular data on the chip (VERDICT r4 Missing #2): the vendored
    Wisconsin breast-cancer dataset (569 x 30, examples/data/), same
    protocol as examples/real_data_classification.py -- standardized
    features, 80/20 split, SVGP+Logistic+AnalyticVI at M=64.  CPU x64
    reference: 0.991 held-out accuracy (reference walkthrough analog:
    docs/src/examples/gpclassification.md:7-44)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ))
    os.environ["AGP_EXAMPLES_CPU"] = "0"  # keep the ambient TPU backend
    from real_data_classification import load_breast_cancer, split

    X_tr, y_tr, X_te, y_te = split(*load_breast_cancer(dtype=np.float32))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(3.0, DTYPE)),
        agp.LogisticLikelihood.create(), agp.AnalyticVI(),
        Z=X_tr[:64], optimiser=None,
    )
    m, s = agp.train(m, X_tr, y_tr, iterations=30)
    acc = float(np.mean(np.asarray(agp.predict_y(m, s, X_te)) == y_te))
    return acc, "> 0.95", acc > 0.95


@check("pallas_lowering_smoke")
def lowering_smoke():
    """Compile + execute every pallas_call configuration once on the chip
    (L=3 multi-latent included -- the round-3 Mosaic BlockSpec crash class;
    interpret mode cannot catch lowering constraints)."""
    try:
        from benchmarks.lowering_smoke import run as smoke_run
    except ImportError:  # run as `python benchmarks/tpu_acceptance.py`
        from lowering_smoke import run as smoke_run

    ok, total, failures = smoke_run(verbose=False)
    for f in failures:
        print(f"  lowering failure: {f}")
    return ok, f"== {total} configs", ok == total


@check("online_hyperopt_interleaved_rmse")
def online_hyperopt():
    """Streaming + hyperparameter optimization interleaved (atfrequency=5):
    the round-2 audit's untested hardware path.

    Zalg note (round-4 diagnosis of the round-3 failure): the AD gradient
    is exact (matches finite differences to 6 digits), but OIPS acceptance
    depends on the kernel lengthscale -- at the default rho=0.8 with the
    deliberately-wrong ls=2.0 init, only ~10 inducing points activate, and
    conditional on an under-resolved Z the ELBO genuinely peaks at an even
    LARGER ls (the classic sparse-GP oversmoothing coupling; the
    reference's OIPS+hyperopt interleave has the same property).  With
    rho=0.95 the set stays resolved and hyperopt then helps: measured
    rmse 0.106 (hyperopt off) -> 0.019 (on), ls 2.0 -> 1.24 toward the
    truth.  See RESULTS.md round-4 notes and docs/userguide.md section 6."""
    import optax

    from agp_tpu.inducing.algorithms import OIPS

    X, f = _toy(4096, 2, key=44)
    y = np.asarray(f + 0.05 * jax.random.normal(jax.random.PRNGKey(45), f.shape, DTYPE))
    m = agp.OnlineSVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(2.0, DTYPE)),
        agp.GaussianLikelihood.create(0.05, opt_noise=False),
        agp.AnalyticVI(), n_dim=2, capacity=128,
        Zalg=OIPS(rho=0.95, capacity=128),
        optimiser=optax.adam(0.02), atfrequency=5,
    )
    s = None
    for i in range(8):
        m, s = agp.online_train(m, X[i * 512:(i + 1) * 512], y[i * 512:(i + 1) * 512],
                                state=s, iterations=25)
    ls = float(jnp.ravel(m.kernel.lengthscale)[0])
    mu = agp.predict_f(m, s, X[:512])
    rmse = float(jnp.sqrt(jnp.mean((mu - f[:512]) ** 2)))
    return rmse, "< 0.2, ls finite+moved", rmse < 0.2 and np.isfinite(ls) and abs(ls - 2.0) > 1e-3


@check("mo_proba_y_per_task")
def mo_proba():
    """MO predictive push-through per task: classification probabilities in
    [0,1] and class-separating; regression mean finite."""
    X, f = _toy(2048, 2, key=46)
    y1 = np.asarray(f)
    y2 = np.sign(np.asarray(f) - 0.2)
    m = agp.MOSVGP.create(
        agp.SqExponentialKernel(),
        [agp.GaussianLikelihood.create(0.1, opt_noise=False), agp.LogisticLikelihood.create()],
        agp.AnalyticVI(), X[:32], n_latent=2, optimiser=None,
    )
    m, s = agp.mo_train(m, X, [y1, y2], iterations=80)
    probas = agp.mo_proba_y(m, s, X[:1024])
    p2 = probas[1]
    inb = bool(jnp.all((p2 >= 0) & (p2 <= 1)))
    sep = float(jnp.mean(p2[jnp.asarray(y2[:1024]) > 0]) - jnp.mean(p2[jnp.asarray(y2[:1024]) < 0]))
    # Gaussian task: compute_proba returns (mean, var + sigma2)
    finite = bool(jnp.isfinite(probas[0][0]).all() and jnp.isfinite(probas[0][1]).all())
    return sep, "> 0.2, p in [0,1], reg finite", inb and finite and sep > 0.2


CHECKS = [gp_exact, svgp_logistic, svgp_hyperopt, multiclass, hetero, vstp,
          online, gibbs_cavi, mo, quad_vi, nuts, fused_tier, proba,
          fused_studentt, fused_laplace, fused_matern32lik, fused_svm,
          fused_poisson, fused_negbinomial, fused_batched_multiclass,
          fused_batched_hetero, fused_batched_mosvgp, fused_ard,
          fused_mc_megakernel, fused_het_megakernel, real_data,
          lowering_smoke, online_hyperopt, mo_proba]


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    names = sys.argv[1:]
    for c in CHECKS:
        if names and all(n not in c.check_name for n in names):
            continue
        c()
    n_ok = sum(r["ok"] for r in RESULTS)
    print(json.dumps({"summary": f"{n_ok}/{len(RESULTS)} checks pass",
                      "all_ok": n_ok == len(RESULTS)}))
    if not names:  # full sweep: persist the machine-readable artifact
        import os

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "TPU_ACCEPTANCE.json"), "w") as fh:
            json.dump({"backend": jax.default_backend(), "checks": RESULTS,
                       "all_ok": n_ok == len(RESULTS)}, fh, indent=1)
    return 0 if n_ok == len(RESULTS) else 1


if __name__ == "__main__":
    sys.exit(main())
