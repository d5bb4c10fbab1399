"""Plot-recipe tests (reference: src/functions/plotting.jl:4-73).

Render each recipe to the Agg backend and assert the artists exist — the
same depth of checking RecipesBase recipes get (shape/arg plumbing), since
visual output isn't oracle-checkable.
"""
import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import agp_tpu as agp
from agp_tpu.utils.plotting import plot_gp, plot_mo_gp, plot_multilatent

from tests.testingtools import generate_f


@pytest.fixture(scope="module")
def data_1d():
    kern = agp.SqExponentialKernel()
    X, f = generate_f(30, 1, kern)
    return np.asarray(X), np.asarray(f)


def test_plot_gp_regression_ribbon(data_1d):
    X, f = data_1d
    y = f + 0.05 * np.random.default_rng(0).normal(size=f.shape)
    m = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.GaussianLikelihood.create(0.01),
        agp.AnalyticVI(), Z=X[:8], optimiser=None,
    )
    m, s = agp.train(m, X, y, iterations=10)
    ax = plot_gp(m, s, X, X_train=X, y_train=y)
    # mean line + ribbon + scatter
    assert len(ax.lines) == 1
    assert len(ax.collections) >= 2
    plt.close("all")


def test_plot_gp_classification_probability(data_1d):
    X, f = data_1d
    y = np.sign(f)
    m = agp.VGP.create(X, y, agp.SqExponentialKernel(),
                       agp.LogisticLikelihood.create(), agp.AnalyticVI(),
                       optimiser=None)
    m, s = agp.train(m, X, y, iterations=10)
    ax = plot_gp(m, s, X)
    (line,) = ax.lines
    p = line.get_ydata()
    assert np.all((p >= 0) & (p <= 1))  # probability path, no ribbon
    plt.close("all")


def test_plot_multilatent_heteroscedastic(data_1d):
    X, f = data_1d
    y = f + 0.05 * np.random.default_rng(1).normal(size=f.shape)
    m = agp.VGP.create(X, y, agp.SqExponentialKernel(),
                       agp.HeteroscedasticLikelihood.create(1.0),
                       agp.AnalyticVI(), optimiser=None)
    m, s = agp.train(m, X, y, iterations=10)
    ax = plot_multilatent(m, s, X)
    assert len(ax.lines) == 2  # f and g latents
    assert len(ax.collections) == 2
    plt.close("all")


def test_plot_mo_gp_tasks(data_1d):
    X, f = data_1d
    y_cls = np.sign(f)
    y_reg = f
    m = agp.MOSVGP.create(
        agp.SqExponentialKernel(),
        [agp.LogisticLikelihood.create(), agp.LaplaceLikelihood.create()],
        agp.AnalyticVI(), Z=X[:8], n_latent=2, optimiser=None,
    )
    m, s = agp.mo_train(m, X, (y_cls, y_reg), iterations=10)
    axes = plot_mo_gp(m, s, X, X_train=X, ys_train=(y_cls, y_reg))
    assert len(axes) == m.n_tasks
    for ax in axes:
        assert len(ax.lines) >= 1
        assert len(ax.collections) >= 2  # ribbon(s) + data scatter
    plt.close("all")
