"""Generalized-inverse-Gaussian sampling, vectorized.

The reference implements three scalar rejection regimes (Hormann,
ratio-of-uniforms, shifted RoU; /root/reference/src/
ComplementaryDistributions/generalizedinversegaussian.jl:58-164).  The
augmentation paths only ever draw GIG with |p| = 1/2 (Laplace Gibbs,
likelihood/laplace.jl:95-100), which has an exact rejection-free route via
the inverse-Gaussian distribution:

  GIG(a, b, -1/2) == InverseGaussian(mu = sqrt(b/a), lambda = b)
  X ~ GIG(a, b, 1/2)  <=>  1/X ~ GIG(b, a, -1/2)

The inverse-Gaussian draw uses the Michael-Schucany-Haas transform -- two
uniforms + one normal per lane, zero rejection loops: ideal for the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_inverse_gaussian(key, mu, lam):
    """Michael-Schucany-Haas: exact, rejection-free."""
    k1, k2 = jax.random.split(key)
    nu = jax.random.normal(k1, jnp.shape(mu), dtype=jnp.result_type(mu))
    y = nu**2
    x = mu + mu**2 * y / (2.0 * lam) - mu / (2.0 * lam) * jnp.sqrt(
        4.0 * mu * lam * y + (mu * y) ** 2
    )
    u = jax.random.uniform(k2, jnp.shape(mu), dtype=jnp.result_type(mu))
    return jnp.where(u <= mu / (mu + x), x, mu**2 / jnp.maximum(x, 1e-30))


def sample_gig(key, a, b, p: float):
    """Draw GIG(a, b, p) elementwise for p = +-1/2 (exact)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(jnp.maximum(b, 1e-12), shape)
    if p == -0.5:
        return sample_inverse_gaussian(key, jnp.sqrt(b / a), b)
    if p == 0.5:
        # 1/X ~ GIG(b, a, -1/2) = InverseGaussian(sqrt(a/b), a)
        inv = sample_inverse_gaussian(key, jnp.sqrt(a / b), a)
        return 1.0 / inv
    raise NotImplementedError("only |p| = 1/2 is required by the augmentations")


def gig_mean(a, b, p: float):
    """E[X] for GIG(a, b, p), half-integer p via closed-form Bessel ratios."""
    from ..ops.special import log_besselk_half

    sab = jnp.sqrt(a * b)
    if p == 0.5:
        ratio = jnp.exp(log_besselk_half(1, sab) - log_besselk_half(0, sab))
    elif p == -0.5:
        ratio = jnp.exp(log_besselk_half(0, sab) - log_besselk_half(0, sab))
        ratio = ratio * (1.0)  # K_{1/2}/K_{-1/2} = 1
    else:
        raise NotImplementedError
    return jnp.sqrt(b / a) * ratio
