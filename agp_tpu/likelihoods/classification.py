"""Binary-classification likelihoods: Logistic (Polya-Gamma) and Bayesian SVM.

Re-derivations of /root/reference/src/likelihood/logistic.jl and
bayesiansvm.jl.  Labels are +-1 (treat_labels maps {0,1} -> {-1,+1},
reference: likelihood/classification.jl:29-39).

Parity notes (documented deviations):
* Logistic `expec_loglik` uses the mathematically-correct quadratic term
  -theta * mu^2 / 2; the reference computes `dot(theta, mu)` (logistic.jl:82)
  which drops the square.  CAVI updates are unaffected (they only use
  grad_e_mu / grad_e_sigma); only the reported ELBO and hyperparameter
  gradients differ.
* Bayesian-SVM `expec_loglik` uses -theta*(1-y mu)^2/2 where the reference
  has +theta*(1-y mu)^2 (bayesiansvm.jl:78-80); again update equations match
  the reference exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kl import polya_gamma_kl
from ..ops.quadrature import expectation
from ..ops.special import log_besselk_half, sqrt_expec_square
from .base import SingleLatentLikelihood

LOG2 = 0.6931471805599453


def _treat_binary(y):
    y = np.asarray(y)
    uniq = np.unique(y)
    if set(uniq.tolist()) <= {-1, 1}:
        out = y.astype(np.float64)
    elif set(uniq.tolist()) <= {0, 1}:
        out = (2.0 * y - 1.0).astype(np.float64)
    else:
        raise ValueError("binary labels must be in {-1, 1} or {0, 1}")
    return jnp.asarray(out)


class LogisticLikelihood(SingleLatentLikelihood):
    """Bernoulli likelihood with logistic link, augmented by
    omega ~ PG(1, 0):  p(y|f, omega) = exp(yf/2 - (yf)^2 omega / 2)/2
    (reference: likelihood/logistic.jl:1-19).

    Local updates (logistic.jl:39-51):
      c     = sqrt(E[f^2])
      theta = E[omega] = tanh(c/2) / (2c)
    Natural-gradient inputs: grad_e_mu = y/2, grad_e_sigma = theta/2.
    """

    @classmethod
    def create(cls):
        return cls()

    @classmethod
    def implemented(cls):
        return frozenset({"AnalyticVI", "QuadratureVI", "GibbsSampling", "HMCSampling"})

    def treat_labels(self, y):
        return _treat_binary(y), self

    def init_local_vars(self, batchsize, dtype=jnp.float32):
        return {
            "c": jnp.ones((batchsize,), dtype=dtype),
            "theta": jnp.full((batchsize,), 0.25, dtype=dtype),
        }

    def _local_updates(self, y, mu, var, local):
        c = sqrt_expec_square(mu, var)
        theta = jnp.tanh(c / 2.0) / (2.0 * c)
        return self, {**local, "c": c, "theta": theta}

    def _grad_e_mu(self, y, local):
        return y / 2.0

    def _grad_e_sigma(self, y, local):
        return local["theta"] / 2.0

    def _expec_loglik(self, y, mu, var, local):
        n = y.shape[0]
        theta = local["theta"]
        return -n * LOG2 / 2.0 + 0.5 * (
            jnp.sum(mu * y) - jnp.sum(theta * var) - jnp.sum(theta * mu**2)
        )

    def aug_kl(self, local, y):
        return polya_gamma_kl(jnp.ones_like(local["c"]), local["c"], local["theta"])

    def _sample_local(self, key, y, f, local):
        from ..distributions.polyagamma import sample_pg1

        omega = sample_pg1(key, jnp.abs(f))
        return {**local, "theta": omega}

    def compute_proba(self, mu, var):
        return expectation(jax.nn.sigmoid, mu, var)

    def predict_y(self, mu):
        return jnp.sign(mu)

    def log_prob(self, y, f):
        return -jnp.logaddexp(0.0, -y * f)  # log sigma(y f)

    def grad_log_prob(self, y, f):
        return y * jax.nn.sigmoid(-y * f)

    def hess_log_prob(self, y, f):
        s = jax.nn.sigmoid(y * f)
        return -s * (1.0 - s)


class BayesianSVM(SingleLatentLikelihood):
    """Bayesian SVM: p(y|f) proportional to exp(-2 max(1 - yf, 0)), augmented
    with an improper omega ~ 1_[0, inf) prior; q(omega) = GIG
    (reference: likelihood/bayesiansvm.jl).

    Local updates (bayesiansvm.jl:40-56):
      c     = (1 - y mu)^2 + var
      theta = 1/sqrt(c)
    grad_e_mu = y (theta + 1), grad_e_sigma = theta/2.
    """

    @classmethod
    def create(cls):
        return cls()

    @classmethod
    def implemented(cls):
        return frozenset({"AnalyticVI"})

    def treat_labels(self, y):
        return _treat_binary(y), self

    def init_local_vars(self, batchsize, dtype=jnp.float32):
        return {
            "c": jnp.ones((batchsize,), dtype=dtype),
            "theta": jnp.ones((batchsize,), dtype=dtype),
        }

    def _local_updates(self, y, mu, var, local):
        c = (1.0 - y * mu) ** 2 + var
        theta = 1.0 / jnp.sqrt(c)
        return self, {**local, "c": c, "theta": theta}

    def _grad_e_mu(self, y, local):
        return y * (local["theta"] + 1.0)

    def _grad_e_sigma(self, y, local):
        return local["theta"] / 2.0

    def _expec_loglik(self, y, mu, var, local):
        n = y.shape[0]
        theta = local["theta"]
        tot = -n * LOG2 / 2.0 + jnp.sum(mu * y)
        tot -= 0.5 * jnp.sum(theta * var) + 0.5 * jnp.sum(theta * (1.0 - y * mu) ** 2)
        return tot

    def aug_kl(self, local, y):
        # GIG entropy with p = 1/2, a -> 0 limit form used by the reference
        # (bayesiansvm.jl:86-89); wrapped in stop_gradient like the
        # reference's @ignore_derivatives.
        c = local["c"]
        sc = jnp.sqrt(c)
        val = (
            jnp.sum(jnp.log(c)) / 2.0
            + jnp.sum(LOG2 + log_besselk_half(0, sc))
            - jnp.sum(sc) / 2.0
        )
        return jax.lax.stop_gradient(val)

    def compute_proba(self, mu, var):
        def svmlik(f):
            pos = jnp.exp(-2.0 * jnp.maximum(1.0 - f, 0.0))
            neg = jnp.exp(-2.0 * jnp.maximum(1.0 + f, 0.0))
            return pos / (pos + neg)

        return expectation(svmlik, mu, var)

    def predict_y(self, mu):
        return jnp.sign(mu)

    def log_prob(self, y, f):
        # pseudo-likelihood, normalized over y in {-1, +1}
        pos = -2.0 * jnp.maximum(1.0 - y * f, 0.0)
        neg = -2.0 * jnp.maximum(1.0 + y * f, 0.0)
        return pos - jnp.logaddexp(pos, neg)
