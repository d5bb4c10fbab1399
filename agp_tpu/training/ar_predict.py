"""Autoregressive prediction: roll a GP forward by feeding its own
predictions back as lagged inputs.

Equivalent of /root/reference/src/ar_predict.jl:5-68 (`predict_ar` /
`sample_ar`): the model was trained on lag-vector inputs
x_t = [y_{t-L}, ..., y_{t-1}]; the rollout is a `lax.scan` whose carry is
the current lag window -- one compiled program for the whole horizon.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def predict_ar(model, state, x_init, n_steps: int):
    """Deterministic rollout of the predictive mean.

    x_init: [lag] most recent observations (oldest first).
    Returns [n_steps] predicted values.
    """
    from .predictions import predict_f

    x_init = jnp.ravel(jnp.asarray(x_init))

    def step(window, _):
        mu = predict_f(model, state, window[None, :])
        mu = jnp.ravel(mu)[0]
        window = jnp.concatenate([window[1:], mu[None]])
        return window, mu

    _, preds = jax.lax.scan(step, x_init, None, length=n_steps)
    return preds


def sample_ar(model, state, x_init, n_steps: int, n_samples: int = 16, key=None):
    """Stochastic rollout: at each step draw f ~ N(mu*, var*) and feed the
    sample back (reference: ar_predict.jl:37-68).  Trajectories vmapped."""
    from .predictions import predict_f

    key = jax.random.PRNGKey(0) if key is None else key
    x_init = jnp.ravel(jnp.asarray(x_init))

    def one_traj(k):
        def step(carry, key_t):
            window = carry
            mu, var = predict_f(model, state, window[None, :], cov=True)
            mu = jnp.ravel(mu)[0]
            sd = jnp.sqrt(jnp.maximum(jnp.ravel(var)[0], 0.0))
            y = mu + sd * jax.random.normal(key_t, (), dtype=mu.dtype)
            window = jnp.concatenate([window[1:], y[None]])
            return window, y

        _, traj = jax.lax.scan(step, x_init, jax.random.split(k, n_steps))
        return traj

    return jax.vmap(one_traj)(jax.random.split(key, n_samples))
