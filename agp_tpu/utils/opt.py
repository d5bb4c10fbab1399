"""Optimizer helpers shared across the framework.

The reference threads Optimisers.jl rule/state pairs through its functional
`state` NamedTuple (/root/reference/src/training/states.jl) and updates
positive parameters in log space: x <- exp(log x + Delta)
(/root/reference/src/hyperparameter/autotuning_utils.jl:47-83).  Here the
same semantics are expressed with optax GradientTransformations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def ascent_update(opt: optax.GradientTransformation, opt_state, params, grads):
    """Apply an *ascent* step (the reference maximizes the ELBO): returns
    (new_opt_state, updates_to_add)."""
    neg = jax.tree_util.tree_map(lambda g: -g, grads)
    updates, new_state = opt.update(neg, opt_state, params)
    return new_state, updates


def positive_ascent(opt, opt_state, value, grad_wrt_value):
    """Ascent step on a positivity-constrained parameter, taken in log space:
    value <- exp(log value + Delta) where Delta is the optimizer-scaled
    gradient wrt log(value) (chain rule: g_log = value * g)."""
    g_log = jax.tree_util.tree_map(lambda v, g: v * g, value, grad_wrt_value)
    new_state, updates = ascent_update(opt, opt_state, value, g_log)
    new_value = jax.tree_util.tree_map(
        lambda v, u: jnp.exp(jnp.log(v) + u), value, updates
    )
    return new_state, new_value


def robbins_monro(kappa: float = 0.51, tau: float = 1.0) -> optax.GradientTransformation:
    """RobbinsMonro schedule: Delta * (tau + n)^-kappa
    (reference: /root/reference/src/inference/optimisers.jl:1-19).

    Expressed as an optax transformation (for *descent* convention: pair it
    with :func:`ascent_update` like every other rule here).
    """

    def init_fn(params):
        return jnp.zeros([], jnp.int32)

    def update_fn(updates, state, params=None):
        # optax descent convention: returned updates are *added* to params,
        # so scale the (already descent-directed) gradients.
        scale = (tau + state.astype(jnp.float32)) ** (-kappa)
        return (
            jax.tree_util.tree_map(lambda u: -u * scale, updates),
            state + 1,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def alrsvi(n_warmup: int = 10, rho0: float = 0.1) -> optax.GradientTransformation:
    """Adaptive Learning Rate for SVI (Ranganath et al.; reference:
    /root/reference/src/inference/optimisers.jl:26-58 -- re-derived, the
    reference's version references fields that don't exist).

    Tracks running mean gradient g_bar and mean squared-norm h_bar; the rate
    is rho = |g_bar|^2 / h_bar, with window tau <- tau (1 - rho) + 1.
    """

    def init_fn(params):
        g = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {
            "i": jnp.zeros([], jnp.int32),
            "g": g,
            "h": jnp.zeros([]),
            "tau": jnp.asarray(float(n_warmup)),
        }

    def _sqnorm(tree):
        return sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(tree))

    def update_fn(updates, state, params=None):
        i = state["i"] + 1
        warm = i <= n_warmup
        w = jnp.where(warm, 1.0 / i.astype(jnp.float32), 1.0 / state["tau"])
        g = jax.tree_util.tree_map(
            lambda m, u: (1.0 - w) * m + w * u, state["g"], updates
        )
        h = (1.0 - w) * state["h"] + w * _sqnorm(updates)
        rho = jnp.where(warm, rho0, _sqnorm(g) / jnp.maximum(h, 1e-30))
        tau = jnp.where(warm, state["tau"], state["tau"] * (1.0 - rho) + 1.0)
        scaled = jax.tree_util.tree_map(lambda u: -rho * u, updates)
        return scaled, {"i": i, "g": g, "h": h, "tau": tau}

    return optax.GradientTransformation(init_fn, update_fn)
