"""Count-data GPs: Poisson and negative-binomial likelihoods with
Polya-Gamma augmentation (mirrors the reference's gpevents example,
/root/reference/docs/examples/gpevents.jl)."""
import os

import jax

if os.environ.get("AGP_EXAMPLES_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np

import agp_tpu as agp

key = jax.random.PRNGKey(0)
X = jax.random.uniform(key, (600, 1)) * 6 - 3
f = jnp.sin(2 * X[:, 0])

# Poisson: rate lambda * sigmoid(f); lambda is learned by closed-form MLE
rate = 15.0 * jax.nn.sigmoid(f)
y_pois = np.asarray(jax.random.poisson(jax.random.PRNGKey(1), rate)).astype(np.int64)
m = agp.VGP.create(X, y_pois, agp.SqExponentialKernel(),
                   agp.PoissonLikelihood.create(5.0), agp.AnalyticVI(), optimiser=None)
m, s = agp.train(m, iterations=40)
pred = agp.predict_y(m, s, X)  # expected counts
corr = float(jnp.corrcoef(jnp.stack([pred, rate]))[0, 1])
print(f"Poisson: corr(predicted rate, true rate) = {corr:.3f}, "
      f"lambda -> {float(m.likelihood.lam):.2f}")

# Negative binomial: over-dispersed counts, r failures
p = jax.nn.sigmoid(f - 1.0)
rs = np.random.RandomState(2)
lam = rs.gamma(5.0, np.asarray(p / (1 - p)))
y_nb = rs.poisson(lam).astype(np.int64)
m2 = agp.VGP.create(X, y_nb, agp.SqExponentialKernel(),
                    agp.NegBinomialLikelihood.create(5.0), agp.AnalyticVI(), optimiser=None)
m2, s2 = agp.train(m2, iterations=40)
mean_nb = 5.0 * p / (1 - p)
corr2 = float(jnp.corrcoef(jnp.stack([agp.predict_y(m2, s2, X), mean_nb]))[0, 1])
print(f"NegBinomial: corr(predicted mean, true mean) = {corr2:.3f}")
