"""Pallas TPU kernels for the sparse-CAVI hot path.

The reference's "native tier" is BLAS (SURVEY.md section 2); ours is fused
TPU kernels.  The fusions cover the per-iteration data path of a sparse
CAVI step (analytic_vi.py) and all work in the WHITENED basis W = Knm L^-T
(L = chol(Kmm)):

1. `fused_w`: X[B,D], Z[M,D], L^-T[M,M] -> W[B,M], Ktilde[B]
   computes the Knm gram tile, the whitened features W and the Ktilde
   diagonal correction in one VMEM-resident pass per B-tile -- Knm never
   round-trips to HBM (the XLA path materializes it between the gram and
   the solve).
2. `cavi_stats`: W[B,M], g[B], theta[B] -> u1[M], U2[M,M]
   the two cross-data reductions of the natural gradient, accumulated
   tile-by-tile in a VMEM scratch accumulator; the caller unwhitens
   (s1 = L^-T u1, S2 = L^-T U2 L^-1) with tiny [M,M] HIGHEST matmuls.
3. `fused_cavi_stats` / `fused_kappa_moments_batched`: the full megakernel
   tier (gram -> W -> moments -> E-step -> statistics in one HBM pass).

Why whitened (round 3): kappa = Knm Kmm^-1 cancels internally -- Kmm^-1
entries are O(1/lambda_min) while kappa is O(1) -- and the MXU's split
products (bf16 pieces, >= 2^-16 residuals) left O(1) errors in the latent
moments for ill-conditioned Kmm.  The on-chip acceptance sweep caught every
theta-dependent likelihood silently wrong or NaN on hardware while CPU
interpret-mode parity passed.  W's rows are bounded by sqrt(var)
(sum W^2 = var - Ktilde), so no in-kernel product multiplies large
cancelling operands; the remaining O(M^2/M^3) whiten/unwhiten ops run
XLA-side at HIGHEST where precision is configurable.

All kernels are grid-over-B with the M axis resident in VMEM (M <= 512),
MXU matmuls with float32 accumulation.  `available()` gates usage: the XLA
einsum path in analytic_vi.py remains the portable fallback (CPU tests).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at runtime; import lazily/safely
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _dot3(a, b):
    """Hand-rolled 3-pass bf16 matmul (the "HIGH" algorithm, which Mosaic
    does not expose): split each f32 operand into a bf16 high part and a
    bf16 residual, then a_hi b_hi + a_hi b_lo + a_lo b_hi with f32
    accumulation.  ~f32-quality products at 3x the bf16 MXU rate -- used for
    the in-kernel kappa = Knm K^-1, whose internal cancellation makes
    1-pass bf16 (Mosaic's f32 default) catastrically wrong and 6-pass
    (HIGHEST) needlessly slow (measured: the fused tier halved at M=512)."""
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(u, v):
        return jax.lax.dot_general(
            u, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


# ----------------------------------------------------- fused whitened features
def _gram(x, z, var, kind):
    """Stationary gram block k(x, z) [B, M]; the single source of truth for
    the kernel formulas used by both the Pallas kernels and their XLA twins
    (AD backward path)."""
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    zz = jnp.sum(z * z, axis=1, keepdims=True).T
    # HIGHEST: xx + zz - 2 xz cancels catastrophically; 1-pass-bf16 f32
    # matmuls corrupt ill-conditioned grams (see kernels.sq_dist).  The
    # D-axis contraction is tiny, so 6-pass costs nothing (Mosaic supports
    # only DEFAULT/HIGHEST; the big kappa dot uses the hand-rolled _dot3).
    xz = jnp.dot(
        x, z.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    r2 = jnp.maximum(xx + zz - 2.0 * xz, 0.0)
    if kind == "rbf":
        return var * jnp.exp(-0.5 * r2)
    if kind == "matern32":
        r = jnp.sqrt(jnp.maximum(3.0 * r2, 1e-36))
        return var * (1.0 + r) * jnp.exp(-r)
    if kind == "matern52":
        r = jnp.sqrt(jnp.maximum(5.0 * r2, 1e-36))
        return var * (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    if kind == "matern12":
        r = jnp.sqrt(jnp.maximum(r2, 1e-36))
        return var * jnp.exp(-r)
    raise ValueError(kind)


def _w_kernel(x_ref, z_ref, linvt_ref, params_ref, w_ref, ktilde_ref, *, kind):
    # x: [TB, D], z: [M, D], linvt: [M, M] upper = (chol(Kmm)^-1)^T,
    # params: [3] (lengthscale scalar, variance, jitter) in SMEM
    ls = params_ref[0]
    var = params_ref[1]
    jitt = params_ref[2]
    knm = _gram(x_ref[:] / ls, z_ref[:] / ls, var, kind)
    w = _dot3(knm, linvt_ref[:])
    w_ref[:] = w
    # Ktilde = var + jitt - |W|^2_row (exact: diag(Knm K^-1 Knm^T) = diag(W W^T));
    # kept [TB, 1] -- 1-D operands hit XLA/Mosaic layout mismatches on TPU
    ktilde_ref[:] = jnp.maximum(
        var + jitt - jnp.sum(w * w, axis=1, keepdims=True), 1e-12
    )


def _w_xla_twin(X, Z, L_invT, lengthscale, variance, jitt, kind):
    """Pure-XLA implementation of exactly the fused_w math (including the
    Ktilde floor).  Used as the reverse-mode rule: `pallas_call` has no AD,
    but the hyperparameter step differentiates the ELBO through
    latent_moments -> fused_w (training/autotuning.py), so the custom VJP
    recomputes this twin's linearization in the backward pass."""
    knm = _gram(X / lengthscale, Z / lengthscale, variance, kind)
    w = _dot3(knm, L_invT)
    ktilde = jnp.maximum(variance + jitt - jnp.sum(w * w, axis=1), 1e-12)
    return w, ktilde


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_w(X, Z, L_invT, lengthscale, variance, jitt, kind="rbf", tile_b=512):
    """Single-latent fused WHITENED features (W = Knm L^-T, Ktilde).
    X [B, D], Z [M, D], L_invT [M, M].  W rows are bounded by sqrt(var)
    (sum_m W^2 = var - Ktilde), so the 3-pass split product stays accurate
    for ill-conditioned Kmm -- unlike the retired kappa = Knm K^-1 form
    (see _cavi_fused_kernel).  kappa recovers as W L^-1; statistics against
    W unwhiten as s1 = L^-T u1, S2 = L^-T U2 L^-1.  Differentiable:
    backward runs through the XLA twin (`_w_xla_twin`)."""
    return _fused_w_impl(X, Z, L_invT, lengthscale, variance, jitt, kind, tile_b)


def _fused_w_fwd(X, Z, L_invT, lengthscale, variance, jitt, kind, tile_b):
    out = _fused_w_impl(X, Z, L_invT, lengthscale, variance, jitt, kind, tile_b)
    return out, (X, Z, L_invT, lengthscale, variance, jitt)


def _fused_w_bwd(kind, tile_b, res, cts):
    X, Z, L_invT, lengthscale, variance, jitt = res
    outs, vjp = jax.vjp(
        lambda x, z, li, ls, var, jt: _w_xla_twin(x, z, li, ls, var, jt, kind),
        X, Z, L_invT, lengthscale, variance, jitt,
    )
    cts = tuple(jnp.asarray(c, o.dtype) for c, o in zip(cts, outs))
    return vjp(cts)


fused_w.defvjp(_fused_w_fwd, _fused_w_bwd)


@functools.partial(jax.jit, static_argnames=("kind", "tile_b"))
def _fused_w_impl(X, Z, L_invT, lengthscale, variance, jitt, kind, tile_b):
    B, D = X.shape
    M = Z.shape[0]
    Bp = _round_up(B, tile_b)
    if Bp != B:
        X = jnp.pad(X, ((0, Bp - B), (0, 0)))
    params = jnp.stack(
        [
            jnp.asarray(lengthscale, jnp.float32).reshape(()),
            jnp.asarray(variance, jnp.float32).reshape(()),
            jnp.asarray(jitt, jnp.float32).reshape(()),
        ]
    )
    w, ktilde = pl.pallas_call(
        functools.partial(_w_kernel, kind=kind),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0)),
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, M), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, M), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ],
    )(X.astype(jnp.float32), Z.astype(jnp.float32), L_invT.astype(jnp.float32), params)
    return w[:B], ktilde[:B, 0]


# --------------------------------------- batched (multi-latent) kappa+moments
def _kappa_moments_batched_kernel(
    x_ref, z_ref, linvt_ref, mu_w_ref, sigma_w_ref, ls_ref, params_ref,
    w_ref, mf_ref, vf_ref, *, kind,
):
    """Grid (L, B-tiles): one latent GP x one minibatch tile per step.
    gram -> whitened features W = Knm L^-T -> Ktilde -> mean_f/var_f in one
    VMEM-resident pass; Knm never reaches HBM.  W IS written out (the
    E-step couples latents -- e.g. the logistic-softmax inner fixed point
    sums over classes -- so the statistics contraction needs W again after
    an XLA elementwise stage; see `cavi_stats_batched` + the caller's
    unwhitening).  WHITENED BASIS: see `_cavi_fused_kernel` -- W rows are
    bounded by sqrt(var), so the split-product error never meets a
    cancelling O(1/lambda_min) operand the way kappa = Knm K^-1 did.

    ls_ref is the per-latent [1, D] lengthscale block in VMEM (isotropic
    lengthscales arrive broadcast to [L, D], so per-latent ARD folds into
    the coordinates in-kernel -- the analog of the single-latent tier's
    `_fused_scaled_inputs`).  params_ref is the full [L, 2] (variance,
    jitter) SMEM array (blocked SMEM specs are not lowerable on TPU),
    indexed by the latent grid position."""
    l = pl.program_id(0)
    var = params_ref[l, 0]
    jitt = params_ref[l, 1]
    inv_ls = 1.0 / ls_ref[0]  # [D]
    knm = _gram(x_ref[:] * inv_ls, z_ref[0] * inv_ls, var, kind)
    w = _dot3(knm, linvt_ref[0])  # 3-pass: see _dot3
    ktilde = jnp.maximum(
        var + jitt - jnp.sum(w * w, axis=1, keepdims=True), 1e-12
    )
    mf = _dot3(w, mu_w_ref[0])  # [TB,1]
    kS = jnp.dot(w, sigma_w_ref[0], preferred_element_type=jnp.float32)
    vf = jnp.maximum(ktilde + jnp.sum(kS * w, axis=1, keepdims=True), 1e-12)
    w_ref[0] = w
    mf_ref[0] = mf
    vf_ref[0] = vf


def _kappa_moments_xla_twin(X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt, kind):
    """Pure-XLA twin of the batched kernel's math (AD backward rule).
    ls is [L, D] (per-latent ARD; isotropic = broadcast columns)."""
    def one(z, linvt, l, v, m_w, s_w):
        knm = _gram(X / l, z / l, v, kind)
        w = _dot3(knm, linvt)
        ktilde = jnp.maximum(v + jitt - jnp.sum(w * w, axis=1), 1e-12)
        mf = _dot3(w, m_w[:, None])[:, 0]
        vf = jnp.maximum(ktilde + jnp.sum((w @ s_w) * w, axis=1), 1e-12)
        return w, mf, vf

    return jax.vmap(one)(Z, L_invT, ls, var, mu_w, Sigma_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_kappa_moments_batched(
    X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt, kind="rbf", tile_b=512
):
    """Multi-latent fused WHITENED (W [L,B,M], mean_f [L,B], var_f [L,B]).

    X [B,D]; Z [L,M,D]; L_invT [L,M,M] = per-latent (chol(Kmm)^-1)^T;
    ls [L,D] (per-latent ARD; broadcast isotropic values to D columns);
    var [L]; mu_w = L^-1 mu [L,M]; Sigma_w = L^-1 Sigma L^-T [L,M,M]
    (whiten with inference/analytic_vi.py::whiten_posterior_batched).
    Returns whitened features W = Knm L^-T; statistics computed against W
    must be unwhitened (s1 = L^-T u1, S2 = L^-T U2 L^-1).  The latent axis
    is a grid dimension: multiclass (K classes), MOVGP/MOSVGP (Q latents)
    and heteroscedastic (2 GPs) all hit this path.  Differentiable via the
    XLA twin (hyperparameter steps)."""
    return _kappa_moments_batched_impl(X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt, kind, tile_b)


def _kappa_moments_batched_fwd(X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt, kind, tile_b):
    out = _kappa_moments_batched_impl(X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt, kind, tile_b)
    return out, (X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt)


def _kappa_moments_batched_bwd(kind, tile_b, res, cts):
    X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt = res
    outs, vjp = jax.vjp(
        lambda x, z, li, l, v, m, s, jt: _kappa_moments_xla_twin(
            x, z, li, l, v, m, s, jt, kind
        ),
        X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt,
    )
    cts = tuple(jnp.asarray(c, o.dtype) for c, o in zip(cts, outs))
    return vjp(cts)


fused_kappa_moments_batched.defvjp(
    _kappa_moments_batched_fwd, _kappa_moments_batched_bwd
)


@functools.partial(jax.jit, static_argnames=("kind", "tile_b"))
def _kappa_moments_batched_impl(X, Z, L_invT, ls, var, mu_w, Sigma_w, jitt, kind, tile_b):
    B, D = X.shape
    L, M, _ = Z.shape
    Bp = _round_up(B, tile_b)
    if Bp != B:
        X = jnp.pad(X, ((0, Bp - B), (0, 0)))
    ls2d = jnp.broadcast_to(
        jnp.reshape(ls.astype(jnp.float32), (L, -1)), (L, D)
    )  # [L, D]: isotropic broadcasts, ARD passes through
    params = jnp.stack(
        [
            jnp.broadcast_to(jnp.ravel(var.astype(jnp.float32)), (L,)),
            jnp.full((L,), jitt, jnp.float32),
        ],
        axis=1,
    )  # [L, 2]
    kappa, mf, vf = pl.pallas_call(
        functools.partial(_kappa_moments_batched_kernel, kind=kind),
        grid=(L, Bp // tile_b),
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda l, i: (i, 0)),
            pl.BlockSpec((1, M, D), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, M, M), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, M, 1), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, M, M), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, D), lambda l, i: (l, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, M), lambda l, i: (l, i, 0)),
            pl.BlockSpec((1, tile_b, 1), lambda l, i: (l, i, 0)),
            pl.BlockSpec((1, tile_b, 1), lambda l, i: (l, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp, M), jnp.float32),
            jax.ShapeDtypeStruct((L, Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, Bp, 1), jnp.float32),
        ],
    )(
        X.astype(jnp.float32),
        Z.astype(jnp.float32),
        L_invT.astype(jnp.float32),
        mu_w.astype(jnp.float32)[..., None],
        Sigma_w.astype(jnp.float32),
        ls2d,
        params,
    )
    return kappa[:, :B], mf[:, :B, 0], vf[:, :B, 0]


# ----------------------------------------------- batched (multi-latent) stats
def _stats_batched_kernel(kappa_ref, g_ref, theta_ref, s1_ref, s2_ref):
    i = pl.program_id(1)
    kappa = kappa_ref[0]  # [TB, M]
    g = g_ref[0]  # [TB, 1]
    th = theta_ref[0]  # [TB, 1]

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[0] += jnp.sum(kappa * g, axis=0, keepdims=True)
    s2_ref[0] += jnp.dot((kappa * th).T, kappa, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_b",))
def cavi_stats_batched(kappa, g, theta, tile_b=512):
    """s1[l] = kappa[l]^T g[l], S2[l] = kappa[l]^T diag(theta[l]) kappa[l]
    for every latent l in one pass over kappa (grid (L, B-tiles); the [M] /
    [M,M] accumulators stay VMEM-resident across each latent's B-loop)."""
    L, B, M = kappa.shape
    Bp = _round_up(B, tile_b)
    if Bp != B:
        kappa = jnp.pad(kappa, ((0, 0), (0, Bp - B), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, Bp - B)))
        theta = jnp.pad(theta, ((0, 0), (0, Bp - B)))
    s1, s2 = pl.pallas_call(
        _stats_batched_kernel,
        grid=(L, Bp // tile_b),
        in_specs=[
            pl.BlockSpec((1, tile_b, M), lambda l, i: (l, i, 0)),
            pl.BlockSpec((1, tile_b, 1), lambda l, i: (l, i, 0)),
            pl.BlockSpec((1, tile_b, 1), lambda l, i: (l, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, M), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, M, M), lambda l, i: (l, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, 1, M), jnp.float32),
            jax.ShapeDtypeStruct((L, M, M), jnp.float32),
        ],
    )(
        kappa.astype(jnp.float32),
        g.astype(jnp.float32)[..., None],
        theta.astype(jnp.float32)[..., None],
    )
    return s1[:, 0], s2


# ------------------------------------------------------------- CAVI stats
def _stats_kernel(kappa_ref, g_ref, theta_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    kappa = kappa_ref[:]  # [TB, M]
    g = g_ref[:]  # [TB, 1]
    th = theta_ref[:]  # [TB, 1]

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += jnp.sum(kappa * g, axis=0, keepdims=True)  # [1, M]
    s2_ref[:] += jnp.dot(
        (kappa * th).T, kappa, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("tile_b",))
def cavi_stats(kappa, g, theta, tile_b=512):
    """s1 = kappa^T g, S2 = kappa^T diag(theta) kappa in one pass."""
    B, M = kappa.shape
    Bp = _round_up(B, tile_b)
    if Bp != B:
        kappa = jnp.pad(kappa, ((0, Bp - B), (0, 0)))
        g = jnp.pad(g, (0, Bp - B))
        theta = jnp.pad(theta, (0, Bp - B))
    s1, s2 = pl.pallas_call(
        _stats_kernel,
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, M), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((M, M), jnp.float32),
        ],
    )(
        kappa.astype(jnp.float32),
        g.astype(jnp.float32)[:, None],
        theta.astype(jnp.float32)[:, None],
    )
    return s1[0], s2


# ------------------------------------------------- fused full CAVI statistics
def _cavi_fused_kernel(
    x_ref, y_ref, mask_ref, z_ref, linvt_ref, mu_w_ref, sigma_w_ref, params_ref,
    s1_ref, s2_ref, c_ref, theta_ref, mf_ref, vf_ref, *, kind, lik, bf16,
):
    """One pass per B-tile: gram -> whitened features W = Knm L^-T ->
    Ktilde -> latent moments -> likelihood E-step -> whitened statistic
    accumulation.  Everything VMEM-resident; the minibatch tile is read
    exactly once from HBM.

    WHITENED BASIS (round-3 hardware-correctness redesign): the old form
    kappa = Knm K^-1 cancels internally -- K^-1 entries are
    O(1/lambda_min(Kmm)) while kappa is O(1) -- so the MXU's limited split
    precision (2-piece bf16 _dot3, ~2^-16 residual) left O(1) errors in the
    latent moments for ill-conditioned Kmm.  The on-chip acceptance sweep
    caught every theta-dependent likelihood (StudentT/Laplace/Matern32/SVM/
    Poisson) silently wrong or NaN; logistic survived only because its
    grad_e_mu = y/2 is moment-independent.  W = Knm L^-T has rows bounded
    by sqrt(var) (sum_m W^2 = var - Ktilde <= var), so no product in this
    kernel multiplies large cancelling operands:
        Ktilde = var - |W|^2_row              (exact subtraction)
        mean_f = W mu_w,      mu_w    = L^-1 mu
        var_f  = Ktilde + diag(W Sigma_w W^T), Sigma_w = L^-1 Sigma L^-T
        u1     = W^T (rho gmu),  U2 = W^T diag(rho gs) W
    and the caller unwhitens s1 = L^-T u1, S2 = L^-T U2 L^-1 with tiny
    [M,M] HIGHEST matmuls.

    bf16=True feeds the variance/statistics MXU matmuls bfloat16 operands
    (f32 accumulation) for the bf16 MXU rate."""
    i = pl.program_id(0)
    ls = params_ref[0]
    var = params_ref[1]
    jitt = params_ref[2]
    rho = params_ref[3]
    p0 = params_ref[4]  # likelihood parameter (sigma2 / nu etc.)
    p1 = params_ref[5]

    mxu = (lambda a: a.astype(jnp.bfloat16)) if bf16 else (lambda a: a)
    hi = os.environ.get("AGP_TPU_FUSED_PRECISION") == "highest"

    def dot32(a, b):
        if hi and not bf16:
            return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        return jnp.dot(mxu(a), mxu(b), preferred_element_type=jnp.float32)

    dot3 = (
        (lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32))
        if hi else _dot3
    )

    x = x_ref[:] / ls
    z = z_ref[:] / ls
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    zz = jnp.sum(z * z, axis=1, keepdims=True).T
    # the gram dot stays f32 even in bf16 mode: r2 is a difference of
    # near-equal numbers and D is small (cheap relative to the M-dots)
    r2 = jnp.maximum(xx + zz - 2.0 * jnp.dot(x, z.T, preferred_element_type=jnp.float32), 0.0)
    if kind == "rbf":
        knm = var * jnp.exp(-0.5 * r2)
    elif kind == "matern32":
        r = jnp.sqrt(jnp.maximum(3.0 * r2, 1e-36))
        knm = var * (1.0 + r) * jnp.exp(-r)
    elif kind == "matern52":
        r = jnp.sqrt(jnp.maximum(5.0 * r2, 1e-36))
        knm = var * (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    else:
        r = jnp.sqrt(jnp.maximum(r2, 1e-36))
        knm = var * jnp.exp(-r)
    # whitened features; 3-pass split product (see _dot3).  |knm| <= var and
    # |L^-T| columns are O(lambda_min^-1/2), vs O(lambda_min^-1) for K^-1 --
    # the split residual no longer meets a cancelling O(1/lambda_min) operand
    w = dot3(knm, linvt_ref[:])
    ktilde = jnp.maximum(
        var + jitt - jnp.sum(w * w, axis=1, keepdims=True), 1e-12
    )  # [TB, 1]
    mf = dot3(w, mu_w_ref[:])  # [TB, 1]; 3-pass: |mu_w| can be O(10)
    kS = dot32(w, sigma_w_ref[:])
    # var_f >= 0 mathematically (Ktilde + quadratic form); clamp shields the
    # E-step's sqrt/ratios from tiny negative rounding
    vf = jnp.maximum(
        ktilde + jnp.sum(kS * w, axis=1, keepdims=True), 1e-12
    )  # [TB, 1]
    yb = y_ref[:]  # [TB, 1]

    if lik == "logistic":
        c = jnp.sqrt(mf * mf + vf)
        theta = jnp.tanh(c / 2.0) / (2.0 * c)
        gmu = yb / 2.0
        gs = theta / 2.0
    elif lik == "gaussian":
        c = jnp.sqrt(jnp.maximum((mf - yb) ** 2 + vf, 1e-30))
        theta = jnp.full_like(mf, 1.0 / p0)  # sigma2
        gmu = yb / p0
        gs = theta / 2.0
    elif lik == "studentt":
        # p0 = nu, p1 = sigma^2
        c = ((mf - yb) ** 2 + vf + p1 * p0) / 2.0
        theta = ((p0 + 1.0) / 2.0) / c
        gmu = theta * yb
        gs = theta / 2.0
    elif lik == "laplace":
        # p0 = a = 1/beta^2; local "b" returned in the c slot
        c = jnp.sqrt(jnp.maximum((mf - yb) ** 2 + vf, 1e-30))
        theta = jnp.sqrt(p0) / c
        gmu = theta * yb
        gs = theta / 2.0
    elif lik == "bayesiansvm":
        c = (1.0 - yb * mf) ** 2 + vf
        theta = 1.0 / jnp.sqrt(jnp.maximum(c, 1e-30))
        gmu = yb * (theta + 1.0)
        gs = theta / 2.0
    elif lik == "matern32":
        # p0 = rho (likelihood lengthscale)
        c = jnp.sqrt(jnp.maximum((mf - yb) ** 2 + vf, 1e-30))
        sqrt3 = 1.7320508075688772
        theta = 3.0 / (2.0 * sqrt3 * c * p0 + 2.0 * p0 * p0)
        gmu = 2.0 * theta * yb
        gs = theta
    elif lik == "negbinomial":
        # p0 = r (failure count); omega ~ PG(y + r, f)
        c = jnp.sqrt(jnp.maximum(mf * mf + vf, 1e-30))
        theta = (yb + p0) * jnp.tanh(c / 2.0) / (2.0 * c)
        gmu = (yb - p0) / 2.0
        gs = theta / 2.0
    elif lik == "poisson":
        # p0 = lambda (rate scale, updated by the caller from mf/vf);
        # gamma = E[latent count] = lam e^{-mf/2} / (2 cosh(c/2))
        c = jnp.sqrt(jnp.maximum(mf * mf + vf, 1e-30))
        logcosh_half = c / 2.0 + jnp.log1p(jnp.exp(-c)) - 0.6931471805599453
        gamma = p0 * jnp.exp(-mf / 2.0 - logcosh_half) / 2.0
        theta = (yb + gamma) * jnp.tanh(c / 2.0) / (2.0 * c)
        gmu = (yb - gamma) / 2.0
        gs = theta / 2.0
    else:
        raise ValueError(lik)

    c_ref[:] = c
    theta_ref[:] = theta
    mf_ref[:] = mf
    vf_ref[:] = vf

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    # mask out padded rows (their gram values against Z are NOT zero)
    m = mask_ref[:]  # [TB, 1]
    s1_ref[:] += jnp.sum(w * (rho * gmu * m), axis=0, keepdims=True)
    s2_ref[:] += dot32((w * (rho * gs * m)).T, w)


_FUSED_LIKS = (
    "logistic", "gaussian", "studentt", "laplace", "bayesiansvm", "matern32",
    "negbinomial", "poisson",
)


@functools.partial(jax.jit, static_argnames=("kind", "lik", "tile_b", "bf16"))
def fused_cavi_stats(
    xb, yb, Z, L_invT, mu_w, Sigma_w, lengthscale, variance, jitt, rho,
    lik_p0=0.0, lik_p1=0.0, kind="rbf", lik="logistic", tile_b=1024, bf16=False,
):
    """Fused WHITENED statistics for one CAVI step (single latent GP).

    Inputs are pre-whitened by the caller: L_invT = (L^-1)^T for
    L = chol(Kmm), mu_w = L^-1 mu, Sigma_w = L^-1 Sigma L^-T (see
    inference/analytic_vi.py::_whiten).  Returns
    (u1 [M], U2 [M, M], c [B], theta [B], mf [B], vf [B]) with
    (u1, U2) = (W^T rho gmu, W^T diag(rho gs) W) for W = Knm L^-T; the
    caller recovers s1 = L^-T u1 and S2 = L^-T U2 L^-1.  (c, theta) are the
    E-step local variables (so state.local_vars stays in sync without a
    second pass) and (mf, vf) the latent moments (needed by likelihoods
    with closed-form parameter updates, e.g. the Poisson rate)."""
    B, D = xb.shape
    M = Z.shape[0]
    Bp = _round_up(B, tile_b)
    mask = jnp.ones((B,), jnp.float32)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
        yb = jnp.pad(yb, (0, Bp - B))
        mask = jnp.pad(mask, (0, Bp - B))
    params = jnp.stack([
        jnp.asarray(lengthscale, jnp.float32).reshape(()),
        jnp.asarray(variance, jnp.float32).reshape(()),
        jnp.asarray(jitt, jnp.float32).reshape(()),
        jnp.asarray(rho, jnp.float32).reshape(()),
        jnp.asarray(lik_p0, jnp.float32).reshape(()),
        jnp.asarray(lik_p1, jnp.float32).reshape(()),
    ])
    s1, s2, c, theta, mf, vf = pl.pallas_call(
        functools.partial(_cavi_fused_kernel, kind=kind, lik=lik, bf16=bf16),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec((M, 1), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((M, M), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ],
    )(
        xb.astype(jnp.float32),
        yb.astype(jnp.float32)[:, None],
        mask[:, None],
        Z.astype(jnp.float32),
        L_invT.astype(jnp.float32),
        mu_w.astype(jnp.float32)[:, None],
        Sigma_w.astype(jnp.float32),
        params,
    )
    return s1[0], s2, c[:B, 0], theta[:B, 0], mf[:B, 0], vf[:B, 0]
