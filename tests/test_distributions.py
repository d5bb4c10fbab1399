"""Distributional tests for the auxiliary-variable samplers.

The VI paths only need closed-form moments; the Gibbs paths need *draws
from the correct law*.  These tests check the vectorized samplers against
exact moment identities AND the exact densities (KS), which catches
shape/variance bias that posterior-mean Gibbs oracles cannot see.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agp_tpu.distributions.polyagamma import (
    pg_mean,
    pg_var,
    sample_pg,
    sample_pg1,
)


def _pg1_pdf(x, c):
    """Exact PG(1, c) density via the PSW alternating series:
    PG(1, c) = J*(1, c/2) / 4 with
    f_{J*(1,z)}(t) = cosh(z) e^{-t z^2/2} sum_n (-1)^n pi (n+1/2)
                     (2/(pi t))^{3/2} exp(-2 (n+1/2)^2 / t)
    (the small-t form of the series; numerically convergent on the bulk).
    Reference: /root/reference/src/ComplementaryDistributions/polyagamma.jl:36-45.
    """
    z = c / 2.0
    t = 4.0 * x
    total = np.zeros_like(t)
    for n in range(200):
        k = n + 0.5
        term = np.pi * k * (2.0 / (np.pi * t)) ** 1.5 * np.exp(-2.0 * k**2 / t)
        total += (-1.0) ** n * term
    dens_j = np.cosh(z) * np.exp(-t * z**2 / 2.0) * total
    return 4.0 * dens_j  # jacobian of t = 4x


@pytest.mark.parametrize("c", [0.0, 0.5, 1.0, 2.5, 6.0])
def test_pg1_mean_and_variance(c):
    key = jax.random.PRNGKey(int(c * 10) + 3)
    n = 120_000
    s = np.asarray(sample_pg1(key, jnp.full((n,), float(c))))
    m_true = float(pg_mean(1.0, c))
    v_true = float(pg_var(1.0, c))
    assert abs(s.mean() / m_true - 1.0) < 0.02, (s.mean(), m_true)
    assert abs(s.var() / v_true - 1.0) < 0.04, (s.var(), v_true)


@pytest.mark.parametrize("b,c", [(2.0, 1.0), (3.5, 0.5), (25.0, 2.0), (0.3, 1.5)])
def test_pg_general_b_mean_and_variance(b, c):
    """PG(b, c) via additivity (integer part exact + residual series) must
    match mean AND variance -- the round-1 series sampler was mean-corrected
    only."""
    key = jax.random.PRNGKey(int(b * 100 + c))
    n = 120_000
    s = np.asarray(sample_pg(key, jnp.full((n,), float(b)), jnp.full((n,), float(c))))
    m_true = float(pg_mean(b, c))
    v_true = float(pg_var(b, c))
    assert abs(s.mean() / m_true - 1.0) < 0.02
    assert abs(s.var() / v_true - 1.0) < 0.05


@pytest.mark.parametrize("c", [0.5, 2.0])
def test_pg1_kolmogorov_smirnov(c):
    """Empirical CDF of the batched PSW sampler vs the exact series density
    (numerically integrated).  n = 20k; KS 1% critical value ~ 0.0115."""
    key = jax.random.PRNGKey(int(c * 7) + 11)
    n = 20_000
    s = np.sort(np.asarray(sample_pg1(key, jnp.full((n,), float(c)))))
    grid = np.linspace(1e-4, max(2.0, s[-1] * 1.1), 4000)
    pdf = _pg1_pdf(grid, c)
    cdf = np.cumsum(pdf) * (grid[1] - grid[0])
    cdf /= cdf[-1]  # tiny renormalization for truncation
    cdf_at_s = np.interp(s, grid, cdf)
    emp = (np.arange(1, n + 1) - 0.5) / n
    ks = np.max(np.abs(cdf_at_s - emp))
    assert ks < 0.0125, ks


def test_pg1_vs_series_density_normalization():
    """Sanity: the series density integrates to ~1 for the test c values."""
    for c in (0.5, 2.0):
        grid = np.linspace(1e-4, 4.0, 8000)
        tot = np.trapz(_pg1_pdf(grid, c), grid)
        assert abs(tot - 1.0) < 1e-3, (c, tot)


@pytest.mark.parametrize(
    "p,a,b",
    [
        (-2.0, 2.0, 3.0),
        (-0.5, 1.0, 2.0),
        (0.5, 2.0, 3.0),
        (1.7, 0.5, 0.2),
        (1.5, 3.0, 0.01),  # Matern-3/2 Gibbs regime, near-zero residual
        (0.3, 0.05, 0.05),  # small-omega concave regime
        (0.3, 1e-6, 1e-6),  # omega -> 0: the regime where the pre-fix
        # envelope's acceptance collapsed ~omega^(2(1-lam)) and the f32 mode
        # formula cancelled to 0 (regression guard)
        (0.9, 1e-6, 1e-6),
        (-3.5, 1.0, 1.0),
    ],
)
def test_gig_general_p_moments(p, a, b):
    """General-p GIG sampler vs exact Bessel-ratio moments
    (E[X] = sqrt(b/a) K_{p+1}(w)/K_p(w), w = sqrt(ab)); covers all three
    rejection regimes + the sign inversion.  Reference capability:
    generalizedinversegaussian.jl:58-164."""
    import scipy.special as sp

    from agp_tpu.distributions.gig import sample_gig

    key = jax.random.PRNGKey(abs(hash((p, a, b))) % 100000)
    n = 120_000
    s = np.asarray(sample_gig(key, jnp.full((n,), a), jnp.full((n,), b), p))
    om = np.sqrt(a * b)
    sc = np.sqrt(b / a)
    m1 = sc * sp.kv(p + 1, om) / sp.kv(p, om)
    m2 = sc**2 * sp.kv(p + 2, om) / sp.kv(p, om)
    v = m2 - m1**2
    minv = sp.kv(p - 1, om) / sp.kv(p, om) / sc
    assert abs(s.mean() / m1 - 1.0) < 0.02
    assert abs(s.var() / v - 1.0) < 0.06
    if om >= 1e-3:
        # E[1/X] at omega -> 0 with 0 < p < 1 is dominated by a region of
        # probability ~omega^p: no sampler's 120k-draw MC estimate of that
        # functional converges there, so only check it at moderate omega
        assert abs((1.0 / s).mean() / minv - 1.0) < 0.03
    assert np.all(s > 0)


def test_gig_half_integer_closed_forms():
    """gig_mean/gig_mean_inv closed forms must agree with scipy Bessel."""
    import scipy.special as sp

    from agp_tpu.distributions.gig import gig_mean, gig_mean_inv

    for p in (-1.5, -0.5, 0.5, 1.5):
        for a, b in ((2.0, 3.0), (0.5, 0.1)):
            om = np.sqrt(a * b)
            sc = np.sqrt(b / a)
            m1 = sc * sp.kv(p + 1, om) / sp.kv(p, om)
            minv = sp.kv(p - 1, om) / sp.kv(p, om) / sc
            np.testing.assert_allclose(float(gig_mean(a, b, p)), m1, rtol=1e-10)
            np.testing.assert_allclose(float(gig_mean_inv(a, b, p)), minv, rtol=1e-10)


def test_pg_data_dependent_b_traced():
    """b = y + gamma with traced (jit) values, as in the Poisson/NegBinomial
    Gibbs paths: must compile and match moments."""

    @jax.jit
    def draw(key, b, c):
        return sample_pg(key, b, c)

    key = jax.random.PRNGKey(0)
    b = jnp.asarray([1.0, 2.0, 5.0, 11.0])  # heterogeneous counts
    c = jnp.asarray([0.5, 1.0, 2.0, 0.1])
    keys = jax.random.split(key, 30_000)
    s = jax.vmap(lambda k: draw(k, b, c))(keys)
    m = np.asarray(jnp.mean(s, axis=0))
    m_true = np.asarray(pg_mean(b, c))
    np.testing.assert_allclose(m, m_true, rtol=0.03)
