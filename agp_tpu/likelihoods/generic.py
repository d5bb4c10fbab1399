"""Generic augmented-likelihood factory (the reference's `@augmodel`).

The reference generates a whole likelihood type from the septuple
(C, g, alpha, beta, gamma, phi, grad-phi) describing densities of the form

    p(y | f) = C * exp(g(y) f) * phi(alpha(y) - beta(y) f + gamma(y) f^2)

-- the "automated augmented conjugate inference" interface
(/root/reference/src/likelihood/generic_likelihood.jl:93-322; Galy-Fajou et
al., AISTATS'20).  Closed-form CAVI updates for ANY such likelihood:

    c^2   = alpha(y) - beta(y) mu + gamma(y) (mu^2 + var)
    theta = -phi'(c^2) / phi(c^2)
    grad_e_mu    = g(y) + theta * beta(y)       (wrt the natural pairing)
    grad_e_sigma = theta * gamma(y)
    E[log p]     = n log C + g.mu - (theta.alpha - theta.(beta mu)
                                     + theta.(gamma (mu^2+var)))
    AugKL        = -c^2.theta - sum log phi(c^2)

In Python the "macro" is a plain class factory: pass callables, get a
Likelihood subclass; phi-derivatives default to `jax.grad` (the reference
needed Zygote for the same fallback).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.quadrature import expectation
from .base import SingleLatentLikelihood
from .classification import _treat_binary


def make_augmented_likelihood(
    name: str,
    ltype: str,
    C: Callable[[], float] | float,
    g: Callable,
    alpha: Callable,
    beta: Callable,
    gamma: Callable,
    phi: Callable,
    dphi: Optional[Callable] = None,
):
    """Build a Likelihood class from the (C, g, alpha, beta, gamma, phi,
    dphi) septuple.  `ltype` is one of "Regression", "Classification",
    "Event" (reference: check_likelihoodtype)."""
    if ltype not in ("Regression", "Classification", "Event"):
        raise ValueError("ltype must be Regression, Classification or Event")
    C_val = C if callable(C) else (lambda: C)
    if dphi is None:
        _dphi_scalar = jax.grad(lambda r: phi(r))
        dphi = lambda r: jax.vmap(_dphi_scalar)(jnp.ravel(r)).reshape(jnp.shape(r))

    class GenericAugmented(SingleLatentLikelihood):
        @classmethod
        def create(cls):
            return cls()

        @classmethod
        def implemented(cls):
            # Gibbs draws the auxiliary from its Laplace transform
            # (distributions/lap_transf.py, Gaver-Stehfest inversion) --
            # needs float64 enabled
            return frozenset({"AnalyticVI", "QuadratureVI", "GibbsSampling"})

        def treat_labels(self, y):
            if ltype == "Classification":
                return _treat_binary(y), self
            return jnp.asarray(y), self

        def init_local_vars(self, batchsize, dtype=jnp.float32):
            return {
                "c2": jnp.ones((batchsize,), dtype=dtype),
                "theta": jnp.ones((batchsize,), dtype=dtype),
            }

        def _local_updates(self, y, mu, var, local):
            c2 = alpha(y) - beta(y) * mu + gamma(y) * (mu**2 + var)
            theta = -dphi(c2) / phi(c2)
            return self, {**local, "c2": c2, "theta": theta}

        def _grad_e_mu(self, y, local):
            return g(y) + local["theta"] * beta(y)

        def _grad_e_sigma(self, y, local):
            return local["theta"] * gamma(y)

        def _expec_loglik(self, y, mu, var, local):
            theta = local["theta"]
            n = y.shape[0]
            tot = n * jnp.log(C_val())
            tot += jnp.sum(g(y) * mu)
            tot -= jnp.sum(
                theta * alpha(y)
                - theta * (beta(y) * mu)
                + theta * (gamma(y) * (mu**2 + var))
            )
            return tot

        def aug_kl(self, local, y):
            c2, theta = local["c2"], local["theta"]
            return -jnp.sum(c2 * theta) - jnp.sum(jnp.log(phi(c2)))

        def log_prob(self, y, f):
            return (
                jnp.log(C_val())
                + g(y) * f
                + jnp.log(phi(alpha(y) - beta(y) * f + gamma(y) * f**2))
            )

        def compute_proba(self, mu, var):
            if ltype == "Regression":
                return mu, jnp.maximum(var, 0.0)
            return expectation(
                lambda x: jnp.exp(self.log_prob(jnp.ones_like(x), x)), mu, var
            )

        def predict_y(self, mu):
            if ltype == "Classification":
                return jnp.sign(mu)
            return mu

        def _sample_local(self, key, y, f, local):
            # omega | f is the prior (with Laplace transform phi) tilted by
            # s0 = alpha(y) - beta(y) f + gamma(y) f^2 (reference:
            # generic_likelihood.jl sample_local! / p_omega)
            from ..distributions.lap_transf import LaplaceTransformDistribution

            s0 = alpha(y) - beta(y) * f + gamma(y) * f**2
            dist = LaplaceTransformDistribution(phi)
            omega = dist.sample(key, s0)
            return {**local, "c2": s0, "theta": omega}

    GenericAugmented.__name__ = f"{name}Likelihood"
    GenericAugmented.__qualname__ = GenericAugmented.__name__
    return GenericAugmented
