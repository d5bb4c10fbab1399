"""Blocked Gibbs sampling with augmented variables.

TPU-native equivalent of /root/reference/src/inference/gibbssampling.jl +
training/sampling.jl: the whole chain runs inside one `lax.scan` -- no
host round-trips between steps -- with vectorized Polya-Gamma / GIG /
Poisson draws replacing the reference's scalar rejection samplers.

One step (reference gibbssampling.jl:50-60):
  omega ~ p(omega | f)                    (likelihood sample_local)
  Sigma  = (2 Diag(grad_e_sigma) + K^-1)^-1
  f | omega ~ N(Sigma (grad_e_mu + K^-1 mu0), Sigma)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..means import batch_call
from ..ops import linalg


def gibbs_step(model, kmat, mu0, key, f, local_vars):
    """One blocked Gibbs sweep. f: [L, N] current latent sample."""
    k_local, k_glob = jax.random.split(key)
    lik = model.likelihood
    local_vars = lik.sample_local(k_local, model.train_y, f, local_vars)
    gmu = lik.grad_e_mu(model.train_y, local_vars)  # [L, N]
    gs = lik.grad_e_sigma(model.train_y, local_vars)  # [L, N]
    K_inv = kmat["K_inv"]

    def one(gmu_l, gs_l, Kinv_l, mu0_l, key_l):
        A = 2.0 * jnp.diag(gs_l) + Kinv_l
        L_A = jnp.linalg.cholesky(linalg.symmetrize(A))
        rhs = gmu_l + Kinv_l @ mu0_l
        m = linalg.chol_solve(L_A, rhs)
        eps = jax.random.normal(key_l, m.shape, dtype=m.dtype)
        # f = m + L_A^-T eps  has covariance A^-1
        delta = jax.scipy.linalg.solve_triangular(L_A.T, eps, lower=False)
        return m + delta

    keys = jax.random.split(k_glob, f.shape[0])
    f_new = jax.vmap(one)(gmu, gs, K_inv, mu0, keys)
    return f_new, local_vars


def run_chain(model, kmat, key, n_samples: int, n_burnin: int, thinning: int, local_vars, f0=None):
    """Scan the chain; returns samples [n_kept, L, N] and final state."""
    L_lat, N = model.n_latent, model.train_x.shape[0]
    dtype = model.train_x.dtype
    mu0 = batch_call(model.mean, model.train_x, model.n_latent)
    f = jnp.zeros((L_lat, N), dtype=dtype) if f0 is None else f0
    total = n_burnin + n_samples * thinning

    def body(carry, key_t):
        f, local_vars = carry
        f, local_vars = gibbs_step(model, kmat, mu0, key_t, f, local_vars)
        return (f, local_vars), f

    keys = jax.random.split(key, total)
    (f, local_vars), all_f = jax.lax.scan(body, (f, local_vars), keys)
    kept = all_f[n_burnin + thinning - 1 :: thinning]
    return kept, f, local_vars
