"""GP regression three ways -- exact GP, VGP, sparse SVGP with kernel
hyperopt (mirrors the reference's gpregression example,
/root/reference/docs/examples/gpregression.jl)."""
import os

import jax

if os.environ.get("AGP_EXAMPLES_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
import optax

import agp_tpu as agp

key = jax.random.PRNGKey(0)
X = jnp.sort(jax.random.uniform(key, (400, 1)) * 10, axis=0)
f = jnp.sin(X[:, 0]) + 0.3 * jnp.cos(3 * X[:, 0])
y = np.asarray(f + 0.1 * jax.random.normal(jax.random.PRNGKey(1), f.shape))

# 1. exact GP (O(N^3), trains its noise in closed form)
gp = agp.GP.create(X, y, agp.SqExponentialKernel(), noise=0.5)
gp, gs = agp.train(gp, iterations=60)
print(f"exact GP     rmse {float(jnp.sqrt(jnp.mean((agp.predict_f(gp, gs, X) - f) ** 2))):.3f}"
      f"  learned noise {float(gp.likelihood.sigma2):.4f}")

# 2. full variational GP
vgp = agp.VGP.create(X, y, agp.SqExponentialKernel(),
                     agp.GaussianLikelihood.create(0.01, opt_noise=False),
                     agp.AnalyticVI(), optimiser=None)
vgp, vs = agp.train(vgp, iterations=20)
print(f"VGP          rmse {float(jnp.sqrt(jnp.mean((agp.predict_f(vgp, vs, X) - f) ** 2))):.3f}")

# 3. sparse SVGP with kernel hyperopt (lengthscale starts wrong on purpose)
svgp = agp.SVGP.create(
    agp.SqExponentialKernel(lengthscale=jnp.asarray(5.0)),
    agp.GaussianLikelihood.create(0.01, opt_noise=False),
    agp.AnalyticVI(), Z=X[::20], optimiser=optax.adam(0.05), atfrequency=2,
)
svgp, ss = agp.train(svgp, X, y, iterations=100)
mu, var = agp.predict_f(svgp, ss, X, cov=True)
print(f"SVGP (M={svgp.n_inducing}) rmse {float(jnp.sqrt(jnp.mean((mu - f) ** 2))):.3f}"
      f"  lengthscale 5.0 -> {float(jnp.ravel(svgp.kernel.lengthscale)[0]):.2f}"
      f"  mean pred var {float(jnp.mean(var)):.4f}")
