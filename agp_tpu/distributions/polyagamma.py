"""Vectorized Polya-Gamma sampling, exact.

The reference draws PG(1, z) *exactly* with the Polson-Scott-Windle
alternating-series rejection sampler, scalar with data-dependent loops
(/root/reference/src/ComplementaryDistributions/polyagamma.jl:136-166), and
general b by decomposition: integer part = sum of PG(1, z) draws, fractional
part via a truncated Gamma convolution series (polyagamma.jl:169-177).

TPU-native design (no scalar loops, everything elementwise on the VPU):

* `sample_pg1(key, c)` -- exact PSW sampler as ONE masked `lax.while_loop`
  over the whole batch: each trip every not-yet-accepted lane draws one
  proposal (mixture of a truncated exponential on (t, inf) and a truncated
  inverse-Gaussian on (0, t], the inner rejection of the latter folded into
  the same trip as a "proposal invalid" flag) and runs the alternating
  partial-sum accept test with a fixed unrolled term count.  Acceptance per
  trip is ~0.6-0.99 uniformly in z, so a handful of trips drains the batch;
  a bounded trip count keeps the program compile-friendly.

* `sample_pg(key, b, c)` -- PG additivity in b: omega = sum of
  min(floor(b), int_cap) exact PG(1, c) draws (a static [cap]-axis masked
  sum) + the residual (fractional or overflow) part via the truncated Gamma
  series with a closed-form tail-mean correction.  With the default cap the
  residual is exactly the fractional part for every b <= int_cap, matching
  the reference's decomposition; only b > int_cap falls back to the
  (mean-corrected) series for the excess.

Identities used by the tests:
  E[PG(b,c)]   = b/(2c) tanh(c/2)
  Var[PG(b,c)] = b/(4c^3) (sinh(c) - c) / cosh^2(c/2)
(both follow from the Gamma-convolution representation
 omega = 1/(2 pi^2) sum_k g_k / ((k-1/2)^2 + c^2/(4 pi^2)), g_k ~ Ga(b,1).)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI_SQ = 2.0 * jnp.pi**2
_T = 0.64  # PSW threshold between the IG body and the exponential tail


# ------------------------------------------------------------ PSW PG(1, z)
def _coef_a(n, x, dtype):
    """Alternating-series coefficient a_n(x) of the J*(1, z) density
    (piecewise form around the threshold t)."""
    k = (n + 0.5) * jnp.pi
    right = k * jnp.exp(-(k**2) * x / 2.0)  # x > t branch
    # x <= t branch: (2/(pi x))^{3/2} k exp(-2 (n+1/2)^2 / x)
    safe_x = jnp.maximum(x, 1e-30)
    left = jnp.exp(
        -1.5 * (jnp.log(jnp.asarray(jnp.pi / 2.0, dtype)) + jnp.log(safe_x))
        + jnp.log(k)
        - 2.0 * (n + 0.5) ** 2 / safe_x
    )
    return jnp.where(x > _T, right, left)


def _mass_texpon(z, K):
    """Probability r of the truncated-exponential mixture component."""
    from jax.scipy.stats import norm

    t = _T
    sqrt_inv_t = 1.0 / jnp.sqrt(jnp.asarray(t, z.dtype))
    b = sqrt_inv_t * (t * z - 1.0)
    a = -sqrt_inv_t * (t * z + 1.0)
    x0 = jnp.log(K) + K * t
    xb = x0 - z + norm.logcdf(b)
    xa = x0 + z + norm.logcdf(a)
    qdivp = (4.0 / jnp.pi) * (jnp.exp(xb) + jnp.exp(xa))
    return 1.0 / (1.0 + qdivp)


def _series_accept(key, x, n_terms: int):
    """Alternating-sum squeeze test: accept x with probability
    f(x) / (a_0(x)) using partial sums S_n that bracket the density.
    Returns (accepted, decided); undecided after n_terms (astronomically
    rare) counts as rejected."""
    dtype = x.dtype
    s = _coef_a(jnp.zeros([], dtype), x, dtype)
    y = jax.random.uniform(key, x.shape, dtype) * s
    accepted = jnp.zeros(x.shape, bool)
    decided = jnp.zeros(x.shape, bool)
    for n in range(1, n_terms + 1):
        an = _coef_a(jnp.asarray(float(n), dtype), x, dtype)
        if n % 2 == 1:
            s = s - an
            newly = (~decided) & (y <= s)
            accepted = accepted | newly
            decided = decided | newly
        else:
            s = s + an
            decided = decided | ((~decided) & (y > s))
    return accepted, decided


def sample_pg1(key, c, n_terms: int = 12, max_trips: int = 64):
    """Exact omega ~ PG(1, c) elementwise (PSW rejection, batched).

    c: any-shape array.  One masked while_loop; each trip costs a few
    elementwise ops per lane.  Matches the reference sampler's law
    (polyagamma.jl:136-166) without its scalar loops.
    """
    c = jnp.asarray(c)
    dtype = jnp.result_type(c.dtype, jnp.float32)
    z = jnp.abs(c.astype(dtype)) / 2.0  # sample J*(1, z)/4
    K = jnp.pi**2 / 8.0 + z**2 / 2.0
    r = _mass_texpon(z, K)
    mu = 1.0 / jnp.maximum(z, 1e-30)  # IG mean (z=0 -> improper; body path)

    def trip(state):
        key, x, done, pending, trips = state
        key, k_choice, k_exp, k_e1, k_e2, k_u, k_n, k_flip, k_ser = jax.random.split(key, 9)
        # branch choice: only re-drawn when NOT mid-way through the body
        # sampler's inner rejection (a committed body lane keeps retrying the
        # truncated-IG; re-choosing the branch there would over-represent the
        # tail and bias the law)
        u_choice = jax.random.uniform(k_choice, z.shape, dtype)
        use_tail = (~pending) & (u_choice < r)
        body = pending | ((~pending) & ~(u_choice < r))

        # tail: x = t + Exp/K on (t, inf) -- always a valid proposal
        x_tail = _T + jax.random.exponential(k_exp, z.shape, dtype) / K

        # body: one attempt at the truncated inverse-Gaussian on (0, t]
        # case mu > t: chi-square method + exp(-z^2 x / 2) thinning
        E1 = jax.random.exponential(k_e1, z.shape, dtype)
        E2 = jax.random.exponential(k_e2, z.shape, dtype)
        ok_chi = E1**2 <= 2.0 * E2 / _T
        x_chi = _T / (1.0 + _T * E1) ** 2
        u_thin = jax.random.uniform(k_u, z.shape, dtype)
        ok_chi = ok_chi & (u_thin <= jnp.exp(-(z**2) * x_chi / 2.0))
        # case mu <= t: one Michael-Schucany-Haas IG(mu, 1) draw, keep if <= t
        nu = jax.random.normal(k_n, z.shape, dtype)
        Y = nu**2
        muY = mu * Y
        x_ig = mu + mu * muY / 2.0 - mu / 2.0 * jnp.sqrt(4.0 * muY + muY**2)
        u_flip = jax.random.uniform(k_flip, z.shape, dtype)
        x_ig = jnp.where(u_flip <= mu / (mu + x_ig), x_ig, mu**2 / jnp.maximum(x_ig, 1e-30))
        big_mu = mu > _T
        x_body = jnp.where(big_mu, x_chi, x_ig)
        ok_body = jnp.where(big_mu, ok_chi, x_ig <= _T)

        proposal = jnp.where(use_tail, x_tail, x_body)
        valid = use_tail | (body & ok_body)
        accepted, _ = _series_accept(k_ser, proposal, n_terms)
        newly = (~done) & valid & accepted
        x = jnp.where(newly, proposal, x)
        # stay committed to the body branch until it yields a valid draw;
        # a series-rejected valid draw restarts the outer cycle (re-choose)
        pending = (~done) & body & (~ok_body)
        return key, x, done | newly, pending, trips + 1

    def cond(state):
        _, _, done, _, trips = state
        return jnp.logical_and(~jnp.all(done), trips < max_trips)

    init = (
        key,
        jnp.full(z.shape, 2.0 / jnp.pi**2, dtype),  # ~E[J*(1,0)] fallback
        jnp.zeros(z.shape, bool),
        jnp.zeros(z.shape, bool),
        jnp.zeros([], jnp.int32),
    )
    _, x, _, _, _ = jax.lax.while_loop(cond, trip, init)
    return (x / 4.0).astype(c.dtype)


# ------------------------------------------------- general b: decomposition
def sample_pg(key, b, c, n_terms: int = 64, int_cap: int = 16):
    """Draw omega ~ PG(b, c) elementwise for arbitrary b >= 0.

    Additivity decomposition (reference polyagamma.jl:55-70): the first
    min(floor(b), int_cap) units are exact PG(1, c) draws; the residual
    (fractional part, plus any excess above the static cap) uses the
    truncated Gamma-convolution series with a closed-form tail-mean
    correction.  b, c: same-shape arrays (b may be data-dependent, e.g.
    y + gamma in the Poisson/NegBinomial/multiclass Gibbs paths).
    """
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    shape = jnp.broadcast_shapes(b.shape, c.shape)
    b = jnp.broadcast_to(b, shape)
    c = jnp.broadcast_to(c, shape)
    dtype = jnp.result_type(b.dtype, c.dtype, jnp.float32)

    n_int = jnp.minimum(jnp.floor(b), float(int_cap))  # exact units
    resid = jnp.maximum(b - n_int, 0.0)

    key_units, key_resid = jax.random.split(key)
    if int_cap > 0:
        keys = jax.random.split(key_units, int_cap)
        idx = jnp.arange(int_cap, dtype=dtype)

        def unit(k, i):
            return jnp.where(i < n_int, sample_pg1(k, c).astype(dtype), 0.0)

        units = jax.vmap(unit)(keys, idx)  # [cap, ...]
        total = jnp.sum(units, axis=0)
    else:
        total = jnp.zeros(shape, dtype)
    total = total + _series_residual(key_resid, resid, c, n_terms, dtype)
    return jnp.where(b <= 0.0, jnp.zeros_like(total), total).astype(
        jnp.result_type(b.dtype, c.dtype)
    )


def _series_residual(key, e, c, n_terms: int, dtype):
    """Truncated Gamma-series draw of PG(e, c) (reference
    polyagamma.jl:169-177) + closed-form mean correction for the dropped
    tail sum_{k>K} E[g_k]/d_k."""
    k = jnp.arange(1, n_terms + 1, dtype=dtype)
    denom_base = (k - 0.5) ** 2
    w = (c.astype(dtype) / (2.0 * jnp.pi)) ** 2
    g = jax.random.gamma(
        key, jnp.maximum(e, 1e-12)[..., None], shape=e.shape + (n_terms,), dtype=dtype
    )
    series = jnp.sum(g / (denom_base + w[..., None]), axis=-1) / TWO_PI_SQ
    sqrt_w = jnp.sqrt(jnp.maximum(w, 1e-12))
    tail_sum = (jnp.pi / 2.0 - jnp.arctan((n_terms + 0.5) / sqrt_w)) / sqrt_w
    tail_sum = jnp.where(w < 1e-10, 1.0 / (n_terms + 0.5), tail_sum)
    tail = e * tail_sum / TWO_PI_SQ
    return jnp.where(e <= 0.0, jnp.zeros_like(series), series + tail)


def sample_pg_series(key, b, c, n_terms: int = 64):
    """Legacy fully-series sampler (mean-exact, variance slightly biased by
    truncation); kept for benchmarking against the exact path."""
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    shape = jnp.broadcast_shapes(b.shape, c.shape)
    b = jnp.broadcast_to(b, shape)
    c = jnp.broadcast_to(c, shape)
    dtype = jnp.result_type(b.dtype, c.dtype, jnp.float32)
    return _series_residual(key, b.astype(dtype), c, n_terms, dtype).astype(
        jnp.result_type(b.dtype, c.dtype)
    )


# ------------------------------------------------------------------ moments
def pg_mean(b, c):
    """E[PG(b, c)] = b tanh(c/2) / (2c), with the c -> 0 limit b/4."""
    c = jnp.asarray(c)
    small = jnp.abs(c) < 1e-6
    safe_c = jnp.where(small, 1.0, c)
    val = b * jnp.tanh(safe_c / 2.0) / (2.0 * safe_c)
    return jnp.where(small, b / 4.0, val)


def pg_var(b, c):
    """Var[PG(b, c)] = b (sinh(c) - c) / (4 c^3 cosh^2(c/2)), with the
    c -> 0 limit b/24 (from sinh(c) - c ~ c^3/6)."""
    c = jnp.asarray(c)
    small = jnp.abs(c) < 1e-4
    safe_c = jnp.where(small, 1.0, c)
    val = b * (jnp.sinh(safe_c) - safe_c) / (4.0 * safe_c**3 * jnp.cosh(safe_c / 2.0) ** 2)
    return jnp.where(small, b / 24.0, val)
