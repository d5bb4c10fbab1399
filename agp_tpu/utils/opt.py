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
