"""Kernel (covariance-function) library.

The reference delegates kernels to KernelFunctions.jl and re-exports it as
part of its API (/root/reference/src/AugmentedGaussianProcesses.jl:30-33).
The TPU build internalizes an equivalent library, designed MXU-first:

* every Gram matrix is computed through one batched matmul
  (``|x|^2 + |z|^2 - 2 x z^T``) followed by a fused elementwise map -- the
  layout XLA tiles onto the 128x128 systolic array;
* kernels are immutable pytree dataclasses; their float leaves *are* the
  trainable hyperparameters (all positive, optimized in log space, matching
  the reference's positive-parameter update rule,
  /root/reference/src/hyperparameter/autotuning_utils.jl:47-83);
* a model holds one kernel pytree whose leaves carry a leading latent axis
  [L, ...]; per-latent Grams are obtained with ``jax.vmap`` over the pytree.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from flax import struct


def _scale(X: jnp.ndarray, lengthscale) -> jnp.ndarray:
    return X / lengthscale


def _use_bf16_gram() -> bool:
    import os

    return bool(os.environ.get("AGP_TPU_BF16_GRAM"))


def sq_dist(X: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distance via the matmul identity.

    The cross-term dot runs at HIGHEST matmul precision: xx + zz - 2 xz is
    a catastrophic cancellation, and the TPU's DEFAULT f32 matmul (bf16
    passes, ~1e-3 relative) perturbs the Gram enough to wreck
    ill-conditioned cases -- measured on v5e: dense N=512 heteroscedastic
    rmse 0.32 -> 28.9, and SVGP hyperopt from a long-lengthscale init
    (near-singular Kmm) fails to converge.  The D-axis contraction is tiny
    (D = 2..20) next to the M-axis matmuls, so the 3-pass cost is noise.

    With AGP_TPU_BF16_GRAM=1 the cross-term matmul instead runs in
    bfloat16 with float32 accumulation (2x MXU rate); the norm terms stay
    f32 so the diagonal is exact.  Off by default: ~1e-2 relative error in
    the Gram is usually harmless for well-conditioned sparse CAVI (a
    fixed-point iteration) but unsafe for dense/ill-conditioned grams."""
    xx = jnp.sum(X * X, axis=-1)
    zz = jnp.sum(Z * Z, axis=-1)
    if _use_bf16_gram() and X.dtype == jnp.float32:
        xz = jnp.dot(
            X.astype(jnp.bfloat16),
            Z.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    else:
        xz = jnp.dot(X, Z.T, precision=jax.lax.Precision.HIGHEST)
    d2 = xx[:, None] + zz[None, :] - 2.0 * xz
    return jnp.maximum(d2, 0.0)


def dist(X: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    # sqrt has infinite gradient at 0; clamp like standard GP libraries do.
    return jnp.sqrt(jnp.maximum(sq_dist(X, Z), 1e-36))


class Kernel(struct.PyTreeNode):
    """Base kernel. Subclasses implement `gram` and `diag`."""

    def gram(self, X: jnp.ndarray, Z: jnp.ndarray | None = None) -> jnp.ndarray:
        raise NotImplementedError

    def diag(self, X: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __add__(self, other: "Kernel") -> "Kernel":
        return SumKernel(left=self, right=other)

    def __mul__(self, other: Union["Kernel", float]) -> "Kernel":
        if isinstance(other, Kernel):
            return ProductKernel(left=self, right=other)
        return self.replace(variance=self.variance * other)

    __rmul__ = __mul__


class StationaryKernel(Kernel):
    """Stationary kernel with ARD lengthscale and output variance."""

    lengthscale: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))
    variance: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))

    def _from_r2(self, r2: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def gram(self, X, Z=None):
        Z = X if Z is None else Z
        r2 = sq_dist(_scale(X, self.lengthscale), _scale(Z, self.lengthscale))
        return self.variance * self._from_r2(r2)

    def diag(self, X):
        return jnp.broadcast_to(self.variance, (X.shape[0],)).astype(X.dtype)


class SqExponentialKernel(StationaryKernel):
    """k(x,z) = v * exp(-|x-z|^2 / (2 l^2)) (a.k.a. RBF)."""

    def _from_r2(self, r2):
        return jnp.exp(-0.5 * r2)


RBFKernel = SqExponentialKernel


class Matern12Kernel(StationaryKernel):
    """k = v * exp(-r) (exponential / Ornstein-Uhlenbeck)."""

    def _from_r2(self, r2):
        return jnp.exp(-jnp.sqrt(jnp.maximum(r2, 1e-36)))


class Matern32Kernel(StationaryKernel):
    def _from_r2(self, r2):
        r = jnp.sqrt(jnp.maximum(3.0 * r2, 1e-36))
        return (1.0 + r) * jnp.exp(-r)


class Matern52Kernel(StationaryKernel):
    def _from_r2(self, r2):
        r = jnp.sqrt(jnp.maximum(5.0 * r2, 1e-36))
        return (1.0 + r + r**2 / 3.0) * jnp.exp(-r)


class RationalQuadraticKernel(StationaryKernel):
    alpha: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(2.0))

    def _from_r2(self, r2):
        return (1.0 + r2 / (2.0 * self.alpha)) ** (-self.alpha)


class CosineKernel(StationaryKernel):
    """k = v * prod_d cos(2 pi (x_d - z_d) / l_d) -- the per-dimension
    product form is PSD (cos of a difference factorizes into cos/sin
    features); a cos of the Euclidean norm would not be."""

    def gram(self, X, Z=None):
        Z = X if Z is None else Z
        diff = X[:, None, :] - Z[None, :, :]
        return self.variance * jnp.prod(
            jnp.cos(2.0 * jnp.pi * diff / self.lengthscale), axis=-1
        )


class PeriodicKernel(StationaryKernel):
    period: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))

    def gram(self, X, Z=None):
        Z = X if Z is None else Z
        # sum_d sin^2(pi (x_d - z_d) / p) / l_d^2
        diff = X[:, None, :] - Z[None, :, :]  # [N, M, D]
        s = jnp.sin(jnp.pi * diff / self.period) / self.lengthscale
        return self.variance * jnp.exp(-2.0 * jnp.sum(s * s, axis=-1))


class LinearKernel(Kernel):
    variance: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))
    bias: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1e-12))

    def gram(self, X, Z=None):
        Z = X if Z is None else Z
        xz = jnp.dot(X, Z.T, precision=jax.lax.Precision.HIGHEST)
        return self.variance * xz + self.bias

    def diag(self, X):
        return self.variance * jnp.sum(X * X, axis=-1) + self.bias


class PolynomialKernel(Kernel):
    variance: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))
    bias: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))
    degree: int = struct.field(pytree_node=False, default=2)

    def gram(self, X, Z=None):
        Z = X if Z is None else Z
        xz = jnp.dot(X, Z.T, precision=jax.lax.Precision.HIGHEST)
        return self.variance * (xz + self.bias) ** self.degree

    def diag(self, X):
        return self.variance * (jnp.sum(X * X, axis=-1) + self.bias) ** self.degree


class ConstantKernel(Kernel):
    variance: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))

    def gram(self, X, Z=None):
        Z = X if Z is None else Z
        return jnp.broadcast_to(self.variance, (X.shape[0], Z.shape[0])).astype(X.dtype)

    def diag(self, X):
        return jnp.broadcast_to(self.variance, (X.shape[0],)).astype(X.dtype)


class WhiteKernel(Kernel):
    variance: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))

    def gram(self, X, Z=None):
        if Z is None or Z is X:
            return self.variance * jnp.eye(X.shape[0], dtype=X.dtype)
        return jnp.zeros((X.shape[0], Z.shape[0]), dtype=X.dtype)

    def diag(self, X):
        return jnp.broadcast_to(self.variance, (X.shape[0],)).astype(X.dtype)


class SumKernel(Kernel):
    left: Kernel
    right: Kernel

    def gram(self, X, Z=None):
        return self.left.gram(X, Z) + self.right.gram(X, Z)

    def diag(self, X):
        return self.left.diag(X) + self.right.diag(X)


class ProductKernel(Kernel):
    left: Kernel
    right: Kernel

    def gram(self, X, Z=None):
        return self.left.gram(X, Z) * self.right.gram(X, Z)

    def diag(self, X):
        return self.left.diag(X) * self.right.diag(X)


def replicate(kernel: Kernel, n_latent: int) -> Kernel:
    """Stack a kernel's leaves with a leading latent axis [L, ...].

    The TPU analog of the reference's per-latent ``deepcopy(kernel)``
    (/root/reference/src/models/VGP.jl etc.): one pytree, vmapped Grams.
    """
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_latent,) + jnp.shape(x)), kernel
    )


def batch_gram(kernel: Kernel, X, Z=None) -> jnp.ndarray:
    """[L, N, M] Gram stack from a replicated kernel ([L]-leading leaves)."""
    if Z is None:
        return jax.vmap(lambda k: k.gram(X, X))(kernel)
    if Z.ndim == 3:  # per-latent inducing sets
        return jax.vmap(lambda k, z: k.gram(X, z))(kernel, Z)
    return jax.vmap(lambda k: k.gram(X, Z))(kernel)


def batch_gram_zz(kernel: Kernel, Z) -> jnp.ndarray:
    """[L, M, M] Gram of per-latent inducing sets Z [L, M, D]."""
    return jax.vmap(lambda k, z: k.gram(z, z))(kernel, Z)


def batch_diag(kernel: Kernel, X) -> jnp.ndarray:
    return jax.vmap(lambda k: k.diag(X))(kernel)
