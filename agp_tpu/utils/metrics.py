"""Evaluation metrics for trained models (not in the reference; standard GP
benchmarking utilities)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quadrature import gauss_hermite


def rmse(y_true, y_pred):
    return jnp.sqrt(jnp.mean((jnp.asarray(y_true) - jnp.asarray(y_pred)) ** 2))


def accuracy(y_true, y_pred):
    return jnp.mean(jnp.asarray(y_true) == jnp.asarray(y_pred))


def negative_log_predictive_density(model, state, X_test, y_test, n_points: int = 100):
    """Mean NLPD: -1/n sum log E_{f* ~ N(mu*, var*)}[p(y | f*)], the standard
    held-out GP metric, computed with Gauss-Hermite quadrature."""
    from ..training.predictions import predict_f

    y_test = jnp.asarray(y_test)
    mu, var = predict_f(model, state, X_test, cov=True)
    lik = model.likelihood
    y2, _ = lik.treat_labels(y_test)
    if model.n_latent > 1:
        raise NotImplementedError("NLPD for multi-latent models: use proba_y")
    x, w = gauss_hermite(n_points)
    x = jnp.asarray(x, mu.dtype)
    w = jnp.asarray(w, mu.dtype)
    nodes = mu[:, None] + jnp.sqrt(jnp.maximum(var, 0.0))[:, None] * x  # [n, q]
    lp = lik.log_prob(jnp.asarray(y2)[:, None], nodes)  # [n, q]
    log_pred = jax.nn.logsumexp(lp + jnp.log(w)[None, :], axis=1)
    return -jnp.mean(log_pred)


def coverage(y_true, mu, var, level: float = 0.95):
    """Empirical coverage of the central predictive interval."""
    from jax.scipy.stats import norm

    z = norm.ppf(0.5 + level / 2.0)
    sd = jnp.sqrt(jnp.maximum(jnp.asarray(var), 0.0))
    lo, hi = mu - z * sd, mu + z * sd
    y = jnp.asarray(y_true)
    return jnp.mean((y >= lo) & (y <= hi))
