"""GP classification on a REAL tabular dataset (vendored, no network).

Mirrors the reference's classification walkthrough
(/root/reference/docs/src/examples/gpclassification.md:7-44), which fetches
the 2-D banana dataset over HTTP, trains SVGP+Logistic+AnalyticVI at an
increasing number of inducing points, and compares against the full VGP.
This environment has no network egress, so the vendored real dataset is the
Wisconsin Diagnostic Breast Cancer data (569 patients x 30 real-valued
features, binary malignant/benign labels; examples/data/breast_cancer.csv)
-- same protocol: standardize, 80/20 split, SVGP at M in {4, 8, 16, 32, 64}
plus the full VGP, report held-out accuracy per model.

Run: python examples/real_data_classification.py   (~1 min on CPU)
"""
from __future__ import annotations

import os

if os.environ.get("AGP_EXAMPLES_CPU", "1") != "0":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax
import jax.numpy as jnp
import numpy as np

import agp_tpu as agp

HERE = os.path.dirname(os.path.abspath(__file__))


def load_breast_cancer(dtype=np.float64):
    """(X, y) with y in {-1, +1}; X standardized per feature."""
    raw = np.loadtxt(
        os.path.join(HERE, "data", "breast_cancer.csv"), delimiter=",", skiprows=1
    )
    X, y = raw[:, :-1], raw[:, -1]
    X = (X - X.mean(0)) / X.std(0)
    y = np.where(y > 0.5, 1.0, -1.0)
    return X.astype(dtype), y.astype(dtype)


def split(X, y, train_frac=0.8, seed=0):
    rng = np.random.RandomState(seed)
    perm = rng.permutation(X.shape[0])
    n_tr = int(train_frac * X.shape[0])
    tr, te = perm[:n_tr], perm[n_tr:]
    return X[tr], y[tr], X[te], y[te]


def main():
    X_tr, y_tr, X_te, y_te = split(*load_breast_cancer())
    kernel = agp.SqExponentialKernel(lengthscale=jnp.asarray(3.0))
    results = {}

    # sparse models at increasing M (reference: Ms = [4, 8, 16, 32, 64])
    for M in (4, 8, 16, 32, 64):
        m = agp.SVGP.create(
            kernel, agp.LogisticLikelihood.create(), agp.AnalyticVI(),
            Z=X_tr[:M], optimiser=None,
        )
        m, s = agp.train(m, X_tr, y_tr, iterations=30)
        acc = float(np.mean(np.asarray(agp.predict_y(m, s, X_te)) == y_te))
        results[f"SVGP M={M}"] = acc
        print(f"SVGP  M={M:3d}: held-out accuracy {acc:.3f}", flush=True)

    # full VGP (reference's mfull)
    m = agp.VGP.create(
        X_tr, y_tr, kernel, agp.LogisticLikelihood.create(), agp.AnalyticVI(),
        optimiser=None,
    )
    m, s = agp.train(m, iterations=30)
    acc = float(np.mean(np.asarray(agp.predict_y(m, s, X_te)) == y_te))
    results["VGP (full)"] = acc
    print(f"VGP  full : held-out accuracy {acc:.3f}", flush=True)

    # predictive probabilities are calibrated-ish: mean p on the positive
    # class well above the negative class
    p = np.asarray(agp.proba_y(m, s, X_te))
    sep = float(p[y_te > 0].mean() - p[y_te < 0].mean())
    print(f"proba_y class separation: {sep:.3f}")

    best = max(results.values())
    assert best > 0.9, f"expected >0.9 held-out accuracy, got {best}"
    assert results["SVGP M=64"] > 0.9
    print("REAL-DATA WALKTHROUGH: PASS")
    return results


if __name__ == "__main__":
    main()
