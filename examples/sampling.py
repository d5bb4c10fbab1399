"""Posterior sampling: augmented Gibbs (exact conditional conjugacy) and
NUTS on the same model, cross-checked against the variational posterior
(mirrors the reference's sampling example,
/root/reference/docs/examples/sampling.jl -- whose HMC path is bitrotted;
both samplers work here)."""
import os

import jax

if os.environ.get("AGP_EXAMPLES_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np

import agp_tpu as agp

key = jax.random.PRNGKey(0)
X = jax.random.uniform(key, (60, 2)) * 4 - 2
f = jnp.sin(2 * X[:, 0]) + 0.5 * X[:, 1]
y = np.asarray(jnp.sign(f))

# CAVI posterior as the comparison point
vgp = agp.VGP.create(X, y, agp.SqExponentialKernel(),
                     agp.LogisticLikelihood.create(), agp.AnalyticVI(), optimiser=None)
vgp, vstate = agp.train(vgp, iterations=60)

# exact augmented Gibbs: omega | f is Polya-Gamma, f | omega is Gaussian
mc = agp.MCGP.create(X, y, agp.SqExponentialKernel(),
                     agp.LogisticLikelihood.create(),
                     agp.GibbsSampling(n_burnin=200, thinning=2))
samples = agp.sample(mc, 500, key=jax.random.PRNGKey(1))  # [500, L, N]
gibbs_mean = jnp.mean(samples, axis=0)[0]
corr = float(jnp.corrcoef(jnp.stack([vstate.mu[0], gibbs_mean]))[0, 1])
print(f"Gibbs vs CAVI posterior-mean correlation: {corr:.4f}")

# NUTS on the whitened latents (multinomial, generalized no-U-turn)
mh = agp.MCGP.create(X, y, agp.SqExponentialKernel(),
                     agp.LogisticLikelihood.create(),
                     agp.HMCSampling(n_burnin=300))
fs = agp.sample_nuts(mh, 500, key=jax.random.PRNGKey(2))
nuts_mean = jnp.mean(fs, axis=0)[0]
corr2 = float(jnp.corrcoef(jnp.stack([gibbs_mean, nuts_mean]))[0, 1])
print(f"NUTS vs Gibbs posterior-mean correlation: {corr2:.4f}")
