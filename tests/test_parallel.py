"""Sharding tests on the 8-virtual-device CPU mesh: data-parallel CAVI must
be bit-compatible (up to float assoc.) with single-device execution, and the
multi-chip dryrun must compile + run.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import agp_tpu as agp
from tests.testingtools import generate_f


def test_data_parallel_matches_single_device():
    from agp_tpu.parallel.mesh import make_mesh, sharded_train

    kern = agp.SqExponentialKernel()
    X, f = generate_f(64, 2, kern)
    y = np.sign(np.asarray(f))
    lik = agp.LogisticLikelihood.create()

    model1 = agp.SVGP.create(kern, lik, agp.AnalyticVI(), X[:8], optimiser=None)
    m1, s1 = agp.train(model1, X, y, iterations=10)

    model2 = agp.SVGP.create(kern, lik, agp.AnalyticVI(), X[:8], optimiser=None)
    mesh = make_mesh(8)
    m2, s2 = sharded_train(model2, X, y, iterations=10, mesh=mesh)

    np.testing.assert_allclose(np.asarray(s1.mu), np.asarray(s2.mu), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(s1.Sigma), np.asarray(s2.Sigma), rtol=1e-8, atol=1e-9
    )


def test_statistics_psum_in_sharded_step():
    """The sharded step's statistic contraction must produce identical
    [M]/[M,M] results to a local einsum (GSPMD inserts the reduction)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from agp_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(8)
    B, M = 64, 8
    kappa = jax.random.normal(jax.random.PRNGKey(0), (B, M))
    theta = jax.random.uniform(jax.random.PRNGKey(1), (B,))
    kappa_s = shard_batch(mesh, kappa)
    theta_s = shard_batch(mesh, theta)

    @jax.jit
    def stats(k, t):
        return jnp.einsum("bm,b,bn->mn", k, t, k)

    out_s = stats(kappa_s, theta_s)
    out = stats(kappa, theta)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out), rtol=1e-10)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_gibbs_chains_shard_over_devices():
    """Chains are vmapped; with a device axis they shard for free."""
    kern = agp.SqExponentialKernel()
    X, f = generate_f(20, 2, kern)
    y = np.sign(np.asarray(f))
    mg = agp.MCGP.create(X, y, kern, agp.LogisticLikelihood.create(),
                         agp.GibbsSampling(n_burnin=10))
    samples = agp.sample(mg, 20, key=jax.random.PRNGKey(0), n_chains=8)
    assert samples.shape == (8, 20, 1, 20)
    assert bool(jnp.all(jnp.isfinite(samples)))


def test_sharded_svi_minibatch_step():
    """shard_map per-device minibatch draw + GSPMD statistic psum."""
    from agp_tpu.parallel.mesh import make_mesh, sharded_svi_train

    X = np.random.RandomState(0).randn(1024, 4)
    y = np.sign(X @ np.ones(4))
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
        agp.AnalyticSVI(128), jnp.asarray(X[:16]), optimiser=None,
    )
    mesh = make_mesh(8)
    m, s = sharded_svi_train(m, X, y, iterations=30, mesh=mesh)
    from agp_tpu.training.predictions import predict_y

    acc = float(jnp.mean(predict_y(m, s, jnp.asarray(X)) == jnp.asarray(y)))
    assert acc > 0.8
