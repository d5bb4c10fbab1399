"""HMC / NUTS sampling of the latent GP values.

The reference's HMC is bitrotted (AdvancedHMC import commented out,
/root/reference/src/AugmentedGaussianProcesses.jl:36;
inference/hmcsampling.jl references unimported symbols) but its spec is
explicit: multinomial NUTS with the generalized no-U-turn criterion
(hmcsampling.jl:68-106).  This is a native implementation:

* log-joint log p(y | f) + log N(f | mu0, K) with a whitened
  parameterization f = mu0 + L_K v (unit-Gaussian prior on v) -- the
  standard trick that makes HMC on GP latents well-conditioned;
* fixed-length leapfrog HMC (`hmc_chain`) and bounded-depth ITERATIVE
  multinomial NUTS (`nuts_chain`): tree doubling without recursion, a
  fixed [max_depth]-slot merge stack, multinomial (Boltzmann) proposal
  sampling within subtrees + biased-progressive sampling across doublings,
  and the generalized momentum-sum no-U-turn criterion
  dot(rho, p_first) < 0 or dot(rho, p_last) < 0 checked on every complete
  balanced subtree.  Everything is `lax.while_loop`/masked-merge code:
  chain-parallel under vmap, shardable across devices;
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


# ---------------------------------------------------------------- NUTS
def _tree_summary_zeros(shape, dtype):
    """One merge-stack slot: subtree summary."""
    z = jnp.zeros(shape, dtype)
    return {
        "rho": z,  # sum of momenta over the subtree
        "p_first": z,
        "p_last": z,
        "logw": jnp.asarray(-jnp.inf, dtype),  # logsumexp of leaf weights
        "prop_v": z,  # multinomial proposal within the subtree
        "prop_logp": jnp.asarray(0.0, dtype),
        "prop_grad": z,
        "turning": jnp.asarray(False),
        "diverging": jnp.asarray(False),
    }


def _is_turning(rho, p_first, p_last):
    """Generalized no-U-turn criterion on the momentum sum."""
    return jnp.logical_or(
        jnp.sum(rho * p_first) < 0.0, jnp.sum(rho * p_last) < 0.0
    )


def _merge_trees(key, older, newer):
    """Combine two time-adjacent subtree summaries (older first in the
    integration direction).  Multinomial proposal: pick the newer subtree's
    candidate with probability w_new / (w_old + w_new)."""
    logw = jnp.logaddexp(older["logw"], newer["logw"])
    take_new = jnp.log(jax.random.uniform(key)) < newer["logw"] - logw
    rho = older["rho"] + newer["rho"]
    return {
        "rho": rho,
        "p_first": older["p_first"],
        "p_last": newer["p_last"],
        "logw": logw,
        "prop_v": jnp.where(take_new, newer["prop_v"], older["prop_v"]),
        "prop_logp": jnp.where(take_new, newer["prop_logp"], older["prop_logp"]),
        "prop_grad": jnp.where(take_new, newer["prop_grad"], older["prop_grad"]),
        "turning": older["turning"]
        | newer["turning"]
        | _is_turning(rho, older["p_first"], newer["p_last"]),
        "diverging": older["diverging"] | newer["diverging"],
    }


def _build_subtree(key, vg, v, p, grad, direction, eps, n_leaves, H0, max_depth):
    """Iteratively build a balanced subtree of `n_leaves` (= 2^depth, traced)
    leapfrog states in `direction`, merging completed power-of-two blocks
    through a fixed [max_depth+1]-slot stack, with U-turn checks at every
    merge.  Returns (summary, end_v, end_p, end_grad, sum_alpha, n_alpha)."""
    dtype = v.dtype
    shape = v.shape
    nslots = max_depth + 1

    def stack_zeros():
        z = jnp.zeros((nslots,) + shape, dtype)
        return {
            "rho": z,
            "p_first": z,
            "p_last": z,
            "logw": jnp.full((nslots,), -jnp.inf, dtype),
            "prop_v": z,
            "prop_logp": jnp.zeros((nslots,), dtype),
            "prop_grad": z,
            "turning": jnp.zeros((nslots,), bool),
            "diverging": jnp.zeros((nslots,), bool),
        }

    def slot_get(stack, idx):
        return {
            k: jax.lax.dynamic_index_in_dim(s, idx, keepdims=False)
            for k, s in stack.items()
        }

    def slot_set(stack, idx, summ):
        return {
            k: jax.lax.dynamic_update_index_in_dim(
                stack[k], summ[k].astype(stack[k].dtype), idx, axis=0
            )
            for k in stack
        }

    def leapfrog_one(v, p, grad):
        p = p + 0.5 * direction * eps * grad
        v = v + direction * eps * p
        logp, grad = vg(v)
        p = p + 0.5 * direction * eps * grad
        return v, p, grad, logp

    def body(state):
        key, i, v, p, grad, stack, top, stop, sum_alpha, n_alpha = state
        key, k_merge = jax.random.split(key)
        v, p, grad, logp = leapfrog_one(v, p, grad)
        H = logp - 0.5 * jnp.sum(p**2)
        delta = H - H0
        diverging = delta < -1000.0
        sum_alpha = sum_alpha + jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))
        n_alpha = n_alpha + 1.0
        leaf = {
            "rho": p,
            "p_first": p,
            "p_last": p,
            "logw": delta,
            "prop_v": v,
            "prop_logp": logp,
            "prop_grad": grad,
            "turning": jnp.asarray(False),
            "diverging": diverging,
        }

        # merge completed power-of-two blocks: after leaf i (0-based), merge
        # once per trailing ONE-bit of i (bits 0..k of i all set)
        def merge_body(carry, k):
            key, summ, top = carry
            key, sub = jax.random.split(key)
            mask = (jnp.asarray(1, jnp.int32) << (k + 1)) - 1
            do = (i & mask) == mask
            older = slot_get(stack, jnp.maximum(top - 1, 0))
            merged = _merge_trees(sub, older, summ)
            summ = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do, b, a), summ, merged
            )
            top = jnp.where(do, top - 1, top)
            return (key, summ, top), None

        (key, summ, top), _ = jax.lax.scan(
            merge_body, (k_merge, leaf, top), jnp.arange(nslots)
        )
        stack = slot_set(stack, top, summ)
        top = top + 1
        stop = stop | summ["turning"] | summ["diverging"]
        return key, i + 1, v, p, grad, stack, top, stop, sum_alpha, n_alpha

    def cond(state):
        _, i, _, _, _, _, _, stop, _, _ = state
        return jnp.logical_and(i < n_leaves, ~stop)

    init = (
        key,
        jnp.zeros([], jnp.int32),
        v,
        p,
        grad,
        stack_zeros(),
        jnp.zeros([], jnp.int32),
        jnp.asarray(False),
        jnp.zeros([], dtype),
        jnp.zeros([], dtype),
    )
    key, i, v_e, p_e, grad_e, stack, top, stop, sum_alpha, n_alpha = (
        jax.lax.while_loop(cond, body, init)
    )
    # fold whatever is on the stack into one summary (oldest at the bottom);
    # only needed when we stopped early -- for a completed subtree top == 1
    summ = slot_get(stack, 0)

    def fold(carry, k):
        key, summ = carry
        key, sub = jax.random.split(key)
        newer = slot_get(stack, k)
        merged = _merge_trees(sub, summ, newer)
        summ = jax.tree_util.tree_map(
            lambda a, b: jnp.where(k < top, b, a), summ, merged
        )
        return (key, summ), None

    (key, summ), _ = jax.lax.scan(fold, (key, summ), jnp.arange(1, nslots))
    # a stop that fired mid-subtree invalidates the whole doubling
    summ["turning"] = summ["turning"] | (stop & (i < n_leaves))
    return summ, v_e, p_e, grad_e, sum_alpha, n_alpha


def nuts_step(key, vg, v0, logp0, grad0, eps, max_depth: int = 8):
    """One iterative multinomial-NUTS transition.  Returns
    (v, logp, grad, accept_stat) with accept_stat the dual-averaging
    statistic (mean Metropolis ratio over visited leaves)."""
    dtype = v0.dtype
    key, k_mom = jax.random.split(key)
    p0 = jax.random.normal(k_mom, v0.shape, dtype)
    H0 = logp0 - 0.5 * jnp.sum(p0**2)

    tree = {
        "rho": p0,
        "p_first": p0,
        "p_last": p0,
        "logw": jnp.zeros([], dtype),
        "prop_v": v0,
        "prop_logp": logp0,
        "prop_grad": grad0,
        "turning": jnp.asarray(False),
        "diverging": jnp.asarray(False),
    }
    # trajectory ends: (v, p, grad) backward (left) and forward (right)
    ends = (v0, p0, grad0, v0, p0, grad0)

    def body(state):
        key, tree, ends, depth, done, sum_alpha, n_alpha = state
        key, k_dir, k_sub, k_acc = jax.random.split(key, 4)
        go_right = jax.random.bernoulli(k_dir)
        vl, pl, gl, vr, pr, gr = ends
        v_e = jnp.where(go_right, vr, vl)
        p_e = jnp.where(go_right, pr, pl)
        g_e = jnp.where(go_right, gr, gl)
        direction = jnp.where(go_right, 1.0, -1.0).astype(v_e.dtype)
        n_leaves = jnp.asarray(1, jnp.int32) << depth
        sub, v_n, p_n, g_n, sa, na = _build_subtree(
            k_sub, vg, v_e, p_e, g_e, direction, eps, n_leaves, H0, max_depth
        )
        sum_alpha = sum_alpha + sa
        n_alpha = n_alpha + na
        bad = sub["turning"] | sub["diverging"]

        # biased progressive sampling across doublings: take the new
        # subtree's proposal with prob min(1, w_sub / w_tree)
        take = (~bad) & (
            jnp.log(jax.random.uniform(k_acc)) < sub["logw"] - tree["logw"]
        )
        new_tree = {
            "rho": tree["rho"] + sub["rho"],
            # rho spans the whole trajectory; ends updated below
            "p_first": tree["p_first"],
            "p_last": tree["p_last"],
            "logw": jnp.logaddexp(tree["logw"], sub["logw"]),
            "prop_v": jnp.where(take, sub["prop_v"], tree["prop_v"]),
            "prop_logp": jnp.where(take, sub["prop_logp"], tree["prop_logp"]),
            "prop_grad": jnp.where(take, sub["prop_grad"], tree["prop_grad"]),
            "turning": tree["turning"],
            "diverging": tree["diverging"],
        }
        tree = jax.tree_util.tree_map(
            lambda a, b: jnp.where(bad, a, b), tree, new_tree
        )
        # update the extended end
        vl2 = jnp.where(bad | go_right, vl, v_n)
        pl2 = jnp.where(bad | go_right, pl, p_n)
        gl2 = jnp.where(bad | go_right, gl, g_n)
        vr2 = jnp.where(bad | (~go_right), vr, v_n)
        pr2 = jnp.where(bad | (~go_right), pr, p_n)
        gr2 = jnp.where(bad | (~go_right), gr, g_n)
        # full-trajectory generalized U-turn (momenta at the two ends)
        full_turn = _is_turning(tree["rho"], pl2, pr2)
        done = done | bad | full_turn
        return key, tree, (vl2, pl2, gl2, vr2, pr2, gr2), depth + 1, done, sum_alpha, n_alpha

    def cond(state):
        _, _, _, depth, done, _, _ = state
        return jnp.logical_and(depth < max_depth, ~done)

    init = (key, tree, ends, jnp.zeros([], jnp.int32), jnp.asarray(False),
            jnp.zeros([], dtype), jnp.zeros([], dtype))
    _, tree, _, _, _, sum_alpha, n_alpha = jax.lax.while_loop(cond, body, init)
    accept_stat = sum_alpha / jnp.maximum(n_alpha, 1.0)
    return tree["prop_v"], tree["prop_logp"], tree["prop_grad"], accept_stat


def nuts_chain(
    model,
    L_K,
    mu0,
    key,
    n_samples: int,
    n_burnin: int,
    step_size: float = 0.1,
    max_depth: int = 8,
    target_accept: float = 0.8,
):
    """Run one NUTS chain on the whitened latents; returns f samples
    [n_samples, L, N].  Dual-averaging step-size adaptation during burn-in,
    identical schedule to `hmc_chain`."""
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
        v, logp, grad, accept_stat = nuts_step(
            key_t, vg, state.v, state.logp, state.grad, state.step_size, max_depth
        )
        # dual averaging (same as hmc_chain)
        t = state.t + is_burn
        gamma, t0, kappa = 0.05, 10.0, 0.75
        h_bar = jnp.where(
            is_burn > 0,
            (1.0 - 1.0 / (t + t0)) * state.h_bar
            + (target_accept - accept_stat) / (t + t0),
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


def sample_nuts(model, n_samples: int, key=None, n_chains: int = 1, max_depth: int = 8):
    """Public entry: NUTS sampling for an MCGP-style full model."""
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
        return nuts_chain(
            model,
            L_K,
            mu0,
            k,
            n_samples,
            inf.n_burnin,
            step_size=getattr(inf, "step_size", 0.1),
            max_depth=max_depth,
        )

    keys = jax.random.split(key, n_chains)
    fs = jax.jit(jax.vmap(chain))(keys)
    return fs[0] if n_chains == 1 else fs


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
