"""Sequential Monte Carlo sampler (likelihood-tempering) for GP latents.

A capability named in the build's north star (BASELINE.json: "SMC
fallbacks for non-conjugate likelihoods") that the reference does not have.
Design:

* particles live in the whitened space v (f = mu0 + L_K v), prior N(0, I);
* likelihood tempering p_t(v) = N(v) * p(y|f(v))^{beta_t} with a fixed
  geometric temperature ladder (static shapes; adaptive ladders need
  dynamic shapes XLA can't trace);
* systematic resampling via cumulative weights + searchsorted -- a pure
  gather, shardable across the particle axis with an all-gather of the
  [P] weight vector being the only collective;
* rejuvenation: a few MALA steps per temperature.

Particles are the leading axis -> shard across devices for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .hmc import make_log_joint


def systematic_resample(key, log_w, n):
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), dtype=w.dtype)
    pts = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    return jnp.searchsorted(cum, pts)


def smc_sample(
    model,
    n_particles: int = 256,
    n_temps: int = 20,
    n_mala: int = 5,
    mala_step: float = 0.05,
    key=None,
    particle_sharding=None,
):
    """Returns posterior latent samples f [P, L, N] and the log marginal
    likelihood estimate (a byproduct the VI paths can't give).

    particle_sharding: optional jax.sharding.Sharding pinning the leading
    particle axis to a mesh axis (e.g. NamedSharding(mesh, P("data"))) --
    the likelihood evaluations and MALA rejuvenation then run
    particle-parallel across devices; the only collectives are the [P]
    weight logsumexp and the resampling gather."""
    from ..config import jitter
    from ..kernels import batch_gram
    from ..means import batch_call
    from ..ops import linalg

    key = jax.random.PRNGKey(0) if key is None else key
    K = batch_gram(model.kernel, model.train_x)
    L_K = jax.vmap(lambda k: linalg.safe_cholesky(k, jitter(K.dtype)))(K)
    mu0 = batch_call(model.mean, model.train_x, model.n_latent)
    L_lat, N = mu0.shape

    def log_lik(v):
        f = mu0 + jnp.einsum("lmn,ln->lm", L_K, v)
        lik = model.likelihood
        y = model.train_y
        if lik.n_latent == 1:
            return jnp.sum(lik.log_prob(y, f[0]))
        return jnp.sum(lik.log_prob(y.T, f))

    log_lik_grad = jax.value_and_grad(log_lik)
    betas = jnp.linspace(0.0, 1.0, n_temps + 1)[1:]

    k0, key = jax.random.split(key)
    v = jax.random.normal(k0, (n_particles, L_lat, N), dtype=mu0.dtype)
    if particle_sharding is not None:
        v = jax.lax.with_sharding_constraint(v, particle_sharding)

    def temp_step(carry, inputs):
        v, log_z = carry
        beta, prev_beta, key_t = inputs
        kr, km = jax.random.split(key_t)
        ll = jax.vmap(log_lik)(v)  # [P]
        log_w = (beta - prev_beta) * ll
        log_z = log_z + jax.nn.logsumexp(log_w) - jnp.log(n_particles * 1.0)
        idx = systematic_resample(kr, log_w, n_particles)
        v = v[idx]

        # MALA rejuvenation at temperature beta
        def tempered(vp):
            llv, g = log_lik_grad(vp)
            lp = -0.5 * jnp.sum(vp**2) + beta * llv
            grad = -vp + beta * g
            return lp, grad

        def mala(carry, key_m):
            v, lp, grad = carry
            k1, k2 = jax.random.split(key_m)
            eps = mala_step
            noise = jax.random.normal(k1, v.shape, dtype=v.dtype)
            prop = v + 0.5 * eps**2 * grad + eps * noise
            lp_p, grad_p = jax.vmap(tempered)(prop)
            fwd = -jnp.sum((prop - v - 0.5 * eps**2 * grad) ** 2, axis=(1, 2)) / (
                2 * eps**2
            )
            bwd = -jnp.sum((v - prop - 0.5 * eps**2 * grad_p) ** 2, axis=(1, 2)) / (
                2 * eps**2
            )
            log_a = lp_p - lp + bwd - fwd
            u = jnp.log(jax.random.uniform(k2, (n_particles,), dtype=v.dtype))
            acc = (u < log_a)[:, None, None]
            v = jnp.where(acc, prop, v)
            lp = jnp.where(acc[:, 0, 0], lp_p, lp)
            grad = jnp.where(acc, grad_p, grad)
            return (v, lp, grad), None

        lp0, grad0 = jax.vmap(tempered)(v)
        (v, _, _), _ = jax.lax.scan(
            mala, (v, lp0, grad0), jax.random.split(km, n_mala)
        )
        return (v, log_z), None

    keys = jax.random.split(key, n_temps)
    prev = jnp.concatenate([jnp.zeros((1,)), betas[:-1]])
    (v, log_z), _ = jax.lax.scan(
        temp_step, (v, jnp.zeros([], mu0.dtype)), (betas, prev, keys)
    )
    f = mu0[None] + jnp.einsum("lmn,pln->plm", L_K, v)
    return f, log_z
