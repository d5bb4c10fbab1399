"""Vectorized Polya-Gamma sampling.

The reference uses the scalar Polson-Scott-Windle rejection sampler with
data-dependent loops (/root/reference/src/ComplementaryDistributions/
polyagamma.jl:136-166) -- unmappable to SIMD hardware.  TPU-native design:

* `sample_pg(key, b, c)` uses the convolution representation
      omega = 1/(2 pi^2) sum_k g_k / ((k - 1/2)^2 + c^2 / (4 pi^2)),
  g_k ~ Gamma(b, 1) iid, truncated at K terms (the reference itself uses the
  same truncated series for fractional b, polyagamma.jl:169-177, K = 200)
  **plus a closed-form mean correction for the truncated tail**, which the
  reference omits.  This is one [batch, K] Gamma draw + a reduction: fully
  vectorized, works for any (vector-valued) b >= 0, including the
  data-dependent b = y + gamma of the Poisson/NegBinomial/multiclass Gibbs
  paths.
* `sample_pg1(key, c)` = sample_pg with b = 1 (Logistic Gibbs path).

E[omega] = b/(2c) tanh(c/2); the tail correction keeps the truncation bias
of the series below ~1e-4 relative at K = 64.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI_SQ = 2.0 * jnp.pi**2


def sample_pg(key, b, c, n_terms: int = 64):
    """Draw omega ~ PG(b, c) elementwise.  b, c: same-shape arrays."""
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    shape = jnp.broadcast_shapes(b.shape, c.shape)
    b = jnp.broadcast_to(b, shape)
    c = jnp.broadcast_to(c, shape)
    dtype = jnp.result_type(b.dtype, c.dtype, jnp.float32)

    k = jnp.arange(1, n_terms + 1, dtype=dtype)  # [K]
    denom_base = (k - 0.5) ** 2  # [K]
    w = (c / (2.0 * jnp.pi)) ** 2  # [...]
    # Gamma(b) draws for every (element, k)
    g = jax.random.gamma(key, jnp.maximum(b, 1e-12)[..., None], shape=shape + (n_terms,), dtype=dtype)
    series = jnp.sum(g / (denom_base + w[..., None]), axis=-1) / TWO_PI_SQ
    # tail mean: E = b/(2 pi^2) * sum_{k>K} 1/((k-1/2)^2 + w)
    sqrt_w = jnp.sqrt(jnp.maximum(w, 1e-12))
    tail_sum = (jnp.pi / 2.0 - jnp.arctan((n_terms + 0.5) / sqrt_w)) / sqrt_w
    tail_sum = jnp.where(w < 1e-10, 1.0 / (n_terms + 0.5), tail_sum)
    tail = b * tail_sum / TWO_PI_SQ
    omega = series + tail
    return jnp.where(b <= 0.0, jnp.zeros_like(omega), omega)


def sample_pg1(key, c, n_terms: int = 64):
    """omega ~ PG(1, c) elementwise."""
    return sample_pg(key, jnp.ones_like(c), c, n_terms=n_terms)


def pg_mean(b, c):
    """E[PG(b, c)] = b tanh(c/2) / (2c), with the c -> 0 limit b/4."""
    c = jnp.asarray(c)
    small = jnp.abs(c) < 1e-6
    safe_c = jnp.where(small, 1.0, c)
    val = b * jnp.tanh(safe_c / 2.0) / (2.0 * safe_c)
    return jnp.where(small, b / 4.0, val)
