"""Plotting helpers (matplotlib): predictive-ribbon plots.

Equivalent of the reference's RecipesBase recipes
(/root/reference/src/functions/plotting.jl:4-73): mean line + k-sigma
ribbon per latent/output, training scatter overlay.  Import is lazy so the
core library never requires matplotlib.
"""
from __future__ import annotations

import numpy as np


def plot_gp(model, state, X_test, X_train=None, y_train=None, sigmas: float = 2.0, ax=None):
    """1-D ribbon plot of the predictive distribution."""
    import matplotlib.pyplot as plt

    from ..training.predictions import proba_y

    X_test = np.asarray(X_test)
    order = np.argsort(X_test[:, 0] if X_test.ndim > 1 else X_test)
    out = proba_y(model, state, X_test)
    if isinstance(out, tuple):
        mu, var = np.asarray(out[0]), np.asarray(out[1])
    else:  # classification probability
        mu, var = np.asarray(out), None
    if ax is None:
        _, ax = plt.subplots()
    xs = (X_test[:, 0] if X_test.ndim > 1 else X_test)[order]
    ax.plot(xs, mu[order], label="predictive mean")
    if var is not None:
        sd = np.sqrt(np.maximum(var[order], 0.0))
        ax.fill_between(xs, mu[order] - sigmas * sd, mu[order] + sigmas * sd, alpha=0.3,
                        label=f"+-{sigmas} sigma")
    if X_train is not None and y_train is not None:
        X_train = np.asarray(X_train)
        ax.scatter(X_train[:, 0] if X_train.ndim > 1 else X_train, np.asarray(y_train),
                   s=8, c="k", alpha=0.5, label="data")
    ax.legend()
    return ax


def plot_multilatent(model, state, X_test, sigmas: float = 2.0, ax=None):
    """Multi-latent ribbon plot (one curve per latent GP f_1..f_K), the
    analog of the reference's n_latent > 1 recipe branch
    (functions/plotting.jl:27-37); used for multiclass / heteroscedastic
    models."""
    import matplotlib.pyplot as plt

    from ..training.predictions import predict_f

    X_test = np.asarray(X_test)
    xs_full = X_test[:, 0] if X_test.ndim > 1 else X_test
    order = np.argsort(xs_full)
    mu, var = predict_f(model, state, X_test, cov=True)
    mu = np.atleast_2d(np.asarray(mu))
    var = np.atleast_2d(np.asarray(var))
    if ax is None:
        _, ax = plt.subplots()
    xs = xs_full[order]
    for k in range(mu.shape[0]):
        sd = np.sqrt(np.maximum(var[k][order], 0.0))
        m = mu[k][order]
        (line,) = ax.plot(xs, m, label=f"f{k + 1}")
        ax.fill_between(xs, m - sigmas * sd, m + sigmas * sd, alpha=0.3,
                        color=line.get_color())
    ax.legend()
    return ax


def plot_mo_gp(
    model, state, X_test, X_train=None, ys_train=None, sigmas: float = 2.0, axes=None
):
    """Multi-output ribbon plot: one subplot per task, one ribbon per
    latent row of that task, optional training scatter -- the analog of the
    reference's MOSVGP recipe (functions/plotting.jl:44-73).

    Returns the array of axes."""
    import matplotlib.pyplot as plt

    from ..models.multioutput import mo_predict_f

    X_test = np.asarray(X_test)
    xs_full = X_test[:, 0] if X_test.ndim > 1 else X_test
    order = np.argsort(xs_full)
    xs = xs_full[order]
    mu_r, var_r = mo_predict_f(model, state, X_test)
    mu_r = np.asarray(mu_r)
    var_r = np.asarray(var_r)
    n_tasks = model.n_tasks
    if axes is None:
        _, axes = plt.subplots(n_tasks, 1, sharex=True, squeeze=False)
        axes = axes[:, 0]
    for t, (s, e) in enumerate(model.row_slices()):
        ax = axes[t]
        if X_train is not None and ys_train is not None:
            X_tr = np.asarray(X_train)
            ax.scatter(X_tr[:, 0] if X_tr.ndim > 1 else X_tr,
                       np.asarray(ys_train[t]), s=8, c="k", alpha=0.5, label="data")
        for j in range(s, e):
            sd = np.sqrt(np.maximum(var_r[j][order], 0.0))
            m = mu_r[j][order]
            (line,) = ax.plot(xs, m, label=f"f{j - s + 1}")
            ax.fill_between(xs, m - sigmas * sd, m + sigmas * sd, alpha=0.3,
                            color=line.get_color())
        ax.set_title(f"Task {t + 1}")
        ax.legend()
    return axes
