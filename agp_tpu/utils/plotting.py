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
