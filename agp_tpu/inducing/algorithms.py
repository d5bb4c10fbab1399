"""Inducing-point selection algorithms.

The reference outsources these to InducingPoints.jl (KmeansAlg, OIPS,
UniGrid, online updateZ; re-exported API, SURVEY.md section 1).  The TPU
build internalizes equivalents:

* offline selection (`inducingpoints`) runs host-side (numpy) once, before
  training -- it is setup code, not hot-path;
* the *online* OIPS update (`oips_update`) runs on-device as a `lax.scan`
  over the batch with a fixed-capacity masked inducing set, because it
  executes every streaming batch inside the training step.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class KmeansAlg:
    """Lloyd's k-means on the inputs (reference: InducingPoints.KmeansAlg)."""

    k: int
    n_iters: int = 20

    def __call__(self, X, key=None):
        X = np.asarray(X)
        seed = 0 if key is None else int(np.asarray(key)[-1])
        from ..utils import native

        if native.available():  # OpenMP C++ Lloyd (native/agp_native.cpp)
            return jnp.asarray(native.kmeans(X, self.k, self.n_iters, seed))
        rng = np.random.RandomState(seed)
        idx = rng.choice(X.shape[0], size=min(self.k, X.shape[0]), replace=False)
        C = X[idx].copy()
        for _ in range(self.n_iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(C.shape[0]):
                pts = X[assign == j]
                if len(pts):
                    C[j] = pts.mean(0)
        return jnp.asarray(C)


@dataclasses.dataclass(frozen=True)
class RandomSubset:
    k: int

    def __call__(self, X, key=None):
        X = np.asarray(X)
        rng = np.random.RandomState(0 if key is None else int(key[-1]))
        idx = rng.choice(X.shape[0], size=min(self.k, X.shape[0]), replace=False)
        return jnp.asarray(X[idx])


@dataclasses.dataclass(frozen=True)
class UniGrid:
    """Uniform grid over the bounding box (1D/2D; reference: UniGrid)."""

    points_per_dim: int

    def __call__(self, X, key=None):
        X = np.asarray(X)
        D = X.shape[1]
        axes = [
            np.linspace(X[:, d].min(), X[:, d].max(), self.points_per_dim)
            for d in range(D)
        ]
        mesh = np.meshgrid(*axes, indexing="ij")
        return jnp.asarray(np.stack([m.ravel() for m in mesh], axis=1))


@dataclasses.dataclass(frozen=True)
class OIPS:
    """Online inducing-point selection (Galy-Fajou & Opper):
    accept a point when its maximum kernel correlation to the current set is
    below rho; fixed capacity cap for static shapes."""

    rho: float = 0.8
    capacity: int = 128

    def __call__(self, X, key=None, kernel=None):
        """Offline/batched init: sequential pass (C++ when the kernel is a
        scalar-lengthscale RBF or unspecified, numpy otherwise)."""
        X = np.asarray(X)
        from ..utils import native

        ls = 1.0
        simple = kernel is None
        if kernel is not None and type(kernel).__name__ in (
            "SqExponentialKernel",
            "RBFKernel",
        ):
            arr = np.asarray(kernel.lengthscale)
            if arr.ndim == 0:
                ls, simple = float(arr), True
        if simple and native.available():
            return jnp.asarray(native.oips(X, self.rho, ls, self.capacity))
        Z = [X[0]]
        for x in X[1:]:
            if kernel is None:
                corr = max(
                    float(np.exp(-0.5 * ((x - z) ** 2).sum())) for z in Z
                )
            else:
                kz = kernel.gram(jnp.asarray(x)[None, :], jnp.asarray(np.stack(Z)))
                corr = float(jnp.max(kz)) / float(kernel.diag(jnp.asarray(x)[None, :])[0])
            if corr < self.rho and len(Z) < self.capacity:
                Z.append(x)
        return jnp.asarray(np.stack(Z))


def inducingpoints(alg, X, key=None, kernel=None):
    """Select an initial inducing set (reference: InducingPoints.inducingpoints)."""
    if isinstance(alg, (OIPS, GreedyVariance)):
        return alg(X, key=key, kernel=kernel)
    return alg(X, key=key)


def oips_update(kernel, Z, mask, X_batch, rho: float):
    """On-device streaming OIPS update with a fixed-capacity masked set.

    Z: [M_cap, D] slots, mask: [M_cap] active flags.  A lax.scan over the
    batch preserves the sequential accept rule (each accepted point changes
    later correlations) while staying static-shaped.
    """
    cap = Z.shape[0]
    kdiag = kernel.diag(Z)  # [M_cap] prior variances at slots

    def body(carry, x):
        Z, mask = carry
        kv = kernel.gram(x[None, :], Z)[0]  # [M_cap]
        kx = kernel.diag(x[None, :])[0]
        corr = kv / jnp.sqrt(jnp.maximum(kx * kdiag, 1e-30))
        max_corr = jnp.max(jnp.where(mask, corr, -jnp.inf))
        n_active = jnp.sum(mask)
        accept = jnp.logical_and(max_corr < rho, n_active < cap)
        slot = jnp.argmin(mask)  # first inactive slot
        Z = jnp.where(
            accept,
            jax.lax.dynamic_update_slice(Z, x[None, :], (slot, 0)),
            Z,
        )
        mask = jnp.where(accept, mask.at[slot].set(True), mask)
        return (Z, mask), accept

    (Z, mask), _ = jax.lax.scan(body, (Z, mask), X_batch)
    return Z, mask


@dataclasses.dataclass(frozen=True)
class GreedyVariance:
    """Greedy conditional-variance selection (Burt et al. '20): repeatedly
    add the point with the largest posterior conditional variance given the
    already-selected set.  Vectorized over candidates; O(k N) per step."""

    k: int

    def __call__(self, X, key=None, kernel=None):
        X = np.asarray(X)
        N = X.shape[0]
        if kernel is None:
            kfn = lambda A, B: np.exp(
                -0.5 * ((A[:, None] - B[None]) ** 2).sum(-1)
            )
            kdiag = np.ones(N)
        else:
            kfn = lambda A, B: np.asarray(kernel.gram(jnp.asarray(A), jnp.asarray(B)))
            kdiag = np.asarray(kernel.diag(jnp.asarray(X)))
        k = min(self.k, N)
        chosen = [int(np.argmax(kdiag))]
        # running Cholesky-style residual variance
        V = np.zeros((k, N))  # rows: (K_zx - partial) / sqrt(cond var)
        cond_var = kdiag.copy().astype(np.float64)
        for i in range(k - 1):
            z = chosen[-1]
            kzx = kfn(X[z : z + 1], X)[0]
            resid = kzx - V[:i].T @ V[:i, z]
            denom = np.sqrt(max(cond_var[z], 1e-12))
            V[i] = resid / denom
            cond_var = np.maximum(cond_var - V[i] ** 2, 0.0)
            cond_var[chosen] = -np.inf
            chosen.append(int(np.argmax(cond_var)))
        return jnp.asarray(X[chosen])
