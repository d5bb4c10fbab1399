"""Hyperparameter autotuning: jit-compiled ELBO gradients.

Equivalent of /root/reference/src/hyperparameter/autotuning.jl, with
`jax.grad` replacing Zygote: one reverse-mode sweep through the whole ELBO
(kernel matrices, Cholesky, natural-parameter KL) per update.  Positive
kernel parameters are updated in log space -- the reference's
`x .= exp.(log.(x) .+ Delta)` rule (autotuning_utils.jl:47-83); prior-mean
parameters and inducing locations are updated unconstrained.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..inference import analytic_vi
from ..kernels import from_unconstrained, to_unconstrained
from ..inference.objective import objective
from ..training.state import TrainState
from ..utils.opt import ascent_update


def _kmat(model, x):
    if getattr(model, "is_online", False):
        from ..models.online_svgp import masked_kmat

        return masked_kmat(model)
    return analytic_vi.compute_kmat(model, x)


def hyper_step(model, state: TrainState, x, y):
    """One gradient-ascent step on (kernel params, prior-mean params
    [, inducing points Z]) wrt the ELBO; recomputes the cached kernel
    matrices afterwards (reference: autotuning.jl:86-140)."""
    opt_z = model.is_sparse and getattr(model, "Zoptimiser", None) is not None

    log_kernel = to_unconstrained(model.kernel)

    if opt_z:

        def neg_elbo(log_k, mean, Z):
            m2 = _rebuild(model, log_k, mean, Z)
            kmat = _kmat(m2, x)
            return -objective(m2, state, x, y, kmat=kmat)

        g_k, g_m, g_z = jax.grad(neg_elbo, argnums=(0, 1, 2))(
            log_kernel, model.mean, model.Z
        )
    else:

        def neg_elbo(log_k, mean):
            m2 = _rebuild(model, log_k, mean, None)
            kmat = _kmat(m2, x)
            return -objective(m2, state, x, y, kmat=kmat)

        g_k, g_m = jax.grad(neg_elbo, argnums=(0, 1))(log_kernel, model.mean)
        g_z = None

    hyper = dict(state.hyper_state)
    # descent on -ELBO == ascent on ELBO; optax handles the sign
    k_updates, hyper["kernel"] = model.optimiser.update(
        g_k, hyper["kernel"], log_kernel
    )
    new_log_k = jax.tree_util.tree_map(lambda p, u: p + u, log_kernel, k_updates)
    new_kernel = from_unconstrained(new_log_k)

    m_updates, hyper["mean"] = model.optimiser.update(g_m, hyper["mean"], model.mean)
    new_mean = jax.tree_util.tree_map(lambda p, u: p + u, model.mean, m_updates)

    model = model.replace(kernel=new_kernel, mean=new_mean)
    if opt_z:
        z_updates, hyper["Z"] = model.Zoptimiser.update(g_z, hyper["Z"], model.Z)
        model = model.replace(Z=model.Z + z_updates)

    # refresh cached kernel matrices (the reference sets the
    # HyperParametersUpdated flag; we just recompute, reference
    # training/training.jl:167-208)
    kmat = _kmat(model, x)
    return model, state.replace(hyper_state=hyper, kmat=kmat)


def _rebuild(model, log_kernel, mean, Z):
    kernel = from_unconstrained(log_kernel)
    m2 = model.replace(kernel=kernel, mean=mean)
    if Z is not None:
        m2 = m2.replace(Z=Z)
    return m2


def init_hyper_state(model):
    """Optimizer states for the hyperparameter groups
    (reference: training/states.jl init_hyperopt_state)."""
    if model.optimiser is None:
        return None
    hyper = {
        "kernel": model.optimiser.init(to_unconstrained(model.kernel)),
        "mean": model.optimiser.init(model.mean),
    }
    if getattr(model, "Zoptimiser", None) is not None and model.is_sparse:
        hyper["Z"] = model.Zoptimiser.init(model.Z)
    return hyper
