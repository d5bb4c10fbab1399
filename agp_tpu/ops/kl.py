"""KL-divergence zoo for the augmented ELBOs.

Functional JAX re-derivations of the reference's closed-form KL terms
(/root/reference/src/functions/KLdivergences.jl).  All of them are either a
couple of Cholesky-backed reductions ([M,M] work, vmapped over the latent
axis) or elementwise sums over the data axis (shardable, `psum`-reducible).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import chol_logdet, chol_solve, invquad, symmetrize
from .special import digamma, gammaln, log_besselk_half, logcosh, xlogx


def gaussian_kl(mu, mu0, Sigma, L_K):
    """KL(q(u) || p(u)) between N(mu, Sigma) and N(mu0, K), K given by its
    lower Cholesky factor (reference: functions/KLdivergences.jl:11-18).

    = 1/2 (logdet K - logdet Sigma + tr(K^-1 Sigma) + (mu-mu0)^T K^-1 (mu-mu0) - M)
    """
    M = mu.shape[-1]
    L_S = jnp.linalg.cholesky(symmetrize(Sigma))
    logdet_S = chol_logdet(L_S)
    logdet_K = chol_logdet(L_K)
    trace = jnp.trace(chol_solve(L_K, Sigma))
    quad = invquad(L_K, mu - mu0)
    return 0.5 * (logdet_K - logdet_S + trace + quad - M)


def gamma_kl(alpha, beta, alpha_p, beta_p):
    """KL(Ga(alpha, beta) || Ga(alpha_p, beta_p)), summed
    (reference: functions/KLdivergences.jl:60-69).  Also serves the
    inverse-Gamma case, whose KL has the same form."""
    return jnp.sum(
        (alpha - alpha_p) * digamma(alpha)
        - gammaln(alpha)
        + gammaln(alpha_p)
        + alpha_p * (jnp.log(beta) - jnp.log(beta_p))
        + alpha * (beta_p - beta) / beta
    )


inverse_gamma_kl = gamma_kl


def poisson_kl(lam, lam0):
    """KL(Po(lam) || Po(lam0)) with scalar rate lam0, summed
    (reference: functions/KLdivergences.jl:75-77)."""
    lam = jnp.ravel(lam)
    n = lam.shape[0]
    return lam0 * n - (1.0 + jnp.log(lam0)) * jnp.sum(lam) + jnp.sum(xlogx(lam))


def poisson_kl_expected(lam, lam0, psi):
    """KL(Po(lam) || Po(lam0)) where lam0 is itself random with
    E[lam0] = lam0 and E[log lam0] = psi
    (reference: functions/KLdivergences.jl:84-88)."""
    return jnp.sum(lam0) - jnp.sum(lam) + jnp.sum(xlogx(lam)) - jnp.sum(lam * psi)


def polya_gamma_kl(b, c, theta):
    """KL(PG(b, c) || PG(b, 0)) with theta = E[omega], summed
    (reference: functions/KLdivergences.jl:94-96)."""
    return jnp.sum(b * logcosh(c / 2.0)) - jnp.sum(c**2 * theta) / 2.0


def gig_entropy(a, b, p: float):
    """Entropy of GIG(a, b, p) summed over elements, omitting the d/dp K_p
    term exactly as the reference does
    (reference: functions/KLdivergences.jl:101-113).

    Only half-integer |p| is supported (all augmentation paths use p = 1/2).
    """
    n_half = int(round(abs(p) - 0.5))
    sqrt_ab = jnp.sqrt(a * b)
    lk_p = log_besselk_half(n_half, sqrt_ab)
    # K_{p+1} and K_{p-1} for p = n_half + 1/2: orders n_half+3/2 and n_half-1/2
    k_plus = jnp.exp(log_besselk_half(n_half + 1, sqrt_ab) - lk_p)
    k_minus = jnp.exp(log_besselk_half(abs(n_half - 1) if n_half >= 1 else 0, sqrt_ab) - lk_p)
    term1 = (jnp.sum(jnp.log(a)) - jnp.sum(jnp.log(b))) / 2.0
    term2 = jnp.sum(jnp.log(2.0) + lk_p)
    term3 = jnp.sum(sqrt_ab * (k_plus + k_minus)) / 2.0
    return term1 + term2 + term3


def gamma_entropy_improper(alpha, beta):
    """-E_q[log q(n)] + E_q[log 1_{[0,inf)}] for q = Ga(alpha, beta): the
    "KL" against the improper flat prior used by logistic-softmax
    (reference: likelihood/logisticsoftmax.jl:144-150).

    The reference computes ``sum(log, first(beta))`` (a single element); the
    mathematically consistent term is sum(log(beta)); we use the latter.
    """
    return (
        -jnp.sum(alpha)
        + jnp.sum(jnp.log(beta))
        - jnp.sum(gammaln(alpha))
        - jnp.sum((1.0 - alpha) * digamma(alpha))
    )
