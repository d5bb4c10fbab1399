"""Shared fixtures: synthetic data drawn from a known GP
(pattern from /root/reference/test/testingtools.jl:2-18)."""
import jax
import jax.numpy as jnp
import numpy as np

import agp_tpu as agp


def generate_f(N, d, kernel, key=None, X=None):
    key = jax.random.PRNGKey(0) if key is None else key
    k1, k2 = jax.random.split(key)
    if X is None:
        X = jax.random.uniform(k1, (N, d), dtype=jnp.float64)
    K = kernel.gram(X, X) + 1e-5 * jnp.eye(N)
    L = jnp.linalg.cholesky(K)
    f = L @ jax.random.normal(k2, (N,), dtype=jnp.float64)
    return X, f
