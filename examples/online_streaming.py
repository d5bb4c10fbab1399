"""Streaming / online sparse GP: data arrives in batches, the inducing set
grows online, state threads across calls (mirrors the reference's onlinegp
example, /root/reference/docs/examples/onlinegp.jl)."""
import os

import jax

if os.environ.get("AGP_EXAMPLES_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np

import agp_tpu as agp

key = jax.random.PRNGKey(0)
X = jax.random.uniform(key, (2048, 1)) * 10
f = jnp.sin(X[:, 0]) + 0.3 * jnp.cos(3 * X[:, 0])
y = np.asarray(f + 0.05 * jax.random.normal(jax.random.PRNGKey(1), f.shape))

model = agp.OnlineSVGP.create(
    agp.SqExponentialKernel(),
    agp.GaussianLikelihood.create(0.05, opt_noise=False),
    agp.AnalyticVI(),
    n_dim=1,
    capacity=96,          # fixed-capacity masked buffer (static XLA shapes)
    optimiser=None,
)

state = None
for i in range(8):  # 8 batches of 256 points stream in
    xb, yb = X[i * 256:(i + 1) * 256], y[i * 256:(i + 1) * 256]
    model, state = agp.online_train(model, xb, yb, state=state, iterations=20)
    mu = agp.predict_f(model, state, X[:512])
    rmse = float(jnp.sqrt(jnp.mean((mu - f[:512]) ** 2)))
    print(f"after batch {i + 1}: active inducing points = "
          f"{int(jnp.sum(model.z_mask))}/{model.capacity}, rmse = {rmse:.3f}")
