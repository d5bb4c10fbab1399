"""Pallas TPU kernels for the sparse-CAVI hot path.

The reference's "native tier" is BLAS (SURVEY.md section 2); ours is fused
TPU kernels.  The fusions cover the per-iteration data path of a sparse
CAVI step (analytic_vi.py):

1. `fused_kappa`: X[B,D], Z[M,D], L^-T[M,M] -> kappa[B,M], Ktilde[B]
   computes the Knm gram tile, kappa = Knm K^-1 and the Ktilde diagonal
   correction in one VMEM-resident pass per B-tile -- Knm never
   round-trips to HBM (the XLA path materializes it between the gram and
   the solve).
2. `cavi_stats`: kappa[B,M], g[B], theta[B] -> s1[M], S2[M,M]
   the two cross-data reductions of the natural gradient, accumulated
   tile-by-tile in a VMEM scratch accumulator.
3. `fused_cavi_stats` / `fused_kappa_moments_batched`: the full megakernel
   tier (gram -> kappa -> moments -> E-step -> statistics in one HBM pass).

NUMERICS (round-4 redesign; the round-2 and round-3 hardware failures were
both precision architecture, not formulas -- CPU interpret mode passed
throughout):

* kappa = Knm K^-1 must NOT be formed directly: K^-1 entries are
  O(1/lambda_min) while kappa is O(1), so the product cancels by
  cond(Kmm) and the MXU's split-precision error becomes O(1) (round 2).
* The round-3 fix worked in the whitened basis W = Knm L^-T end-to-end and
  unwhitened the statistics XLA-side (s1 = L^-T u1, S2 = L^-T U2 L^-1) --
  but unwhitening AMPLIFIES any error in U2 by up to cond(Kmm) (measured
  ~7e2 at cond 1.5e5), and Mosaic's DEFAULT f32 dot is 1-pass bf16
  (2.3e-3 max rel error, measured on chip), so S2 came out garbage and
  six theta-dependent likelihoods were silently wrong on hardware.
* Round 4a formed kappa through the whitened intermediate
  (W = Knm L^-T then kappa = W L^-1, both 3-pass): correct on hardware
  (each factor cancels only by sqrt(cond)) but SLOWER than XLA at every
  shape once timed honestly (PALLAS_BENCH.json, host-readback timing:
  0.57-0.94x) -- the second [B,M]@[M,M] 3-pass dot and the 6-pass gram
  gave the tier 8 MXU-pass-equivalents where XLA's chain pays 5.
* Round 4b (current): kappa = Knm K^-1 DIRECTLY at 3-pass
  (`_dot3` == XLA `Precision.HIGH`, the production path's own algorithm
  and precision, bit-comparable error) with K^-1 = L^-T L^-1 formed
  XLA-side at HIGHEST.  The direct product cancels by cond(Kmm), not
  sqrt(cond) -- exactly like the XLA production path, whose downstream
  (kappa-basis statistics, natural-gradient update) is error-tolerant
  and proven end-to-end by the on-chip acceptance sweep (23/23,
  TPU_ACCEPTANCE.json; the round-2 failure was this product at DEFAULT
  1-pass, a 500x coarser algorithm).  FUSED_VARIANTS.json holds the
  measured on-chip design sweep that picked this form.  Per-dot policy:
      gram cross-term x z^T        _dot3   (r2 = xx+zz-2xz cancels; 4.5e-6
                                            per-op puts ~1e-5 abs error on
                                            r2 -- negligible; DEFAULT's
                                            2.3e-3 was the round-3 failure)
      kappa = Knm K^-1             _dot3   (== XLA HIGH, the proven bar)
      Ktilde = var - sum kappa*Knm exact   (VPU f32, the XLA formula)
      mf = kappa mu                DEFAULT (matvec; XLA twin runs DEFAULT)
      kS = kappa Sigma             DEFAULT (XLA twin runs DEFAULT)
      S2 = kappa^T diag(g) kappa   DEFAULT (XLA twin runs DEFAULT)
      s1 = kappa^T g               exact   (VPU f32 elementwise+sum)

All kernels are grid-over-B with the M axis resident in VMEM (M <= 512),
MXU matmuls with float32 accumulation.  `available()` gates usage: the XLA
einsum path in analytic_vi.py remains the portable fallback (CPU tests).
"""
from __future__ import annotations

import functools

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


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b, dims=(((1,), (0,)), ((), ()))):
    """Hand-rolled 3-pass bf16 matmul (the "HIGH" algorithm, which Mosaic
    does not expose): split each f32 operand into a bf16 high part and a
    bf16 residual, then a_hi b_hi + a_hi b_lo + a_lo b_hi with f32
    accumulation.  ~4.5e-6 max rel error (measured v5e, 512x512 randn) at
    3x the bf16 MXU rate, vs 2.3e-3 for Mosaic's DEFAULT f32 dot (1-pass
    bf16) and 2.2e-7 for HIGHEST (6-pass).  Used for the dots with
    sqrt(cond(Kmm)) internal cancellation (module docstring)."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)

    def d(u, v):
        return jax.lax.dot_general(u, v, dims, preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def _dot1(a, b):
    """Mosaic DEFAULT f32 dot: 1-pass bf16 operands, f32 accumulation
    (2.3e-3 max rel error measured on chip) -- full MXU rate.  Used only
    where the XLA twin einsum also runs at DEFAULT precision (variance
    quadratic form, statistic contraction), so the fused tier is never
    less accurate than the proven XLA path."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot1_g0(a, b):
    """DEFAULT-precision a^T b without an explicit in-kernel transpose:
    dot_general contracting dim 0 of BOTH operands.  The explicit `.T`
    forces a VPU relayout of the [TB, M] tile before the MXU; letting
    Mosaic fuse the contraction measured up to 20% faster at M=128
    (FUSED_VARIANTS.json, v2_direct_nt vs v1_direct_t)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kinv(L_invT):
    """Kmm^-1 = L^-T L^-1 from the stored triangular inverse, at HIGHEST
    (XLA-side, O(M^3) once per call -- microseconds next to the B-loop).
    Batched over a leading latent axis when present."""
    return jnp.einsum(
        "...ij,...kj->...ik", L_invT, L_invT,
        precision=jax.lax.Precision.HIGHEST,
    )


# ----------------------------------------------------------- fused kappa tile
def _gram(x, z, var, kind):
    """Stationary gram block k(x, z) [B, M]; the single source of truth for
    the kernel formulas used by both the Pallas kernels and their XLA twins
    (AD backward path)."""
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    zz = jnp.sum(z * z, axis=1, keepdims=True).T
    # 3-pass: xx + zz - 2 xz cancels catastrophically, so Mosaic's DEFAULT
    # f32 dot (1-pass bf16, 2.3e-3) corrupts ill-conditioned grams (the
    # round-3 failure mode); _dot3's 4.5e-6 per-op error leaves ~1e-5 abs
    # error on r2.  The D-axis contraction pads to the MXU's K=128, so the
    # gram dot costs ~B*M*128 per pass regardless of D -- at 6-pass it was
    # ~25% of the whole fused kernel's MXU work (FUSED_VARIANTS.json).
    r2 = jnp.maximum(xx + zz - 2.0 * _dot3(x, z.T), 0.0)
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


def _kappa_tile(x, z, kinv, var, jitt, kind):
    """Shared tile math: gram -> kappa -> Ktilde (direct form).  kinv is
    Kmm^-1 = L^-T L^-1, formed XLA-side at HIGHEST by the impl wrappers.
    See the module docstring for the precision policy and the measured
    design sweep (FUSED_VARIANTS.json) that picked the direct product over
    the round-4a two-factor whitened form."""
    knm = _gram(x, z, var, kind)
    kappa = _dot3(knm, kinv)  # == XLA Precision.HIGH, the production bar
    # Ktilde = var + jitt - diag(Qnn), the XLA production formula
    ktilde = jnp.maximum(
        var + jitt - jnp.sum(kappa * knm, axis=1, keepdims=True), 1e-12
    )
    return kappa, ktilde


def _kappa_kernel(x_ref, z_ref, kinv_ref, params_ref, kappa_ref, ktilde_ref, *, kind):
    # x: [TB, D], z: [M, D], kinv: [M, M] = Kmm^-1,
    # params: [3] (lengthscale scalar, variance, jitter) in SMEM
    ls = params_ref[0]
    kappa, ktilde = _kappa_tile(
        x_ref[:] / ls, z_ref[:] / ls, kinv_ref[:], params_ref[1], params_ref[2], kind
    )
    kappa_ref[:] = kappa
    # kept [TB, 1] -- 1-D operands hit XLA/Mosaic layout mismatches on TPU
    ktilde_ref[:] = ktilde


def _kappa_xla_twin(X, Z, L_invT, lengthscale, variance, jitt, kind):
    """Pure-XLA implementation of exactly the fused_kappa math (including
    the Ktilde floor).  Used as the reverse-mode rule: `pallas_call` has no
    AD, but the hyperparameter step differentiates the ELBO through
    latent_moments -> fused_kappa (training/autotuning.py), so the custom
    VJP recomputes this twin's linearization in the backward pass."""
    kinv = _kinv(L_invT)
    knm = _gram(X / lengthscale, Z / lengthscale, variance, kind)
    kappa = _dot3(knm, kinv)
    ktilde = jnp.maximum(variance + jitt - jnp.sum(kappa * knm, axis=1), 1e-12)
    return kappa, ktilde


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_kappa(X, Z, L_invT, lengthscale, variance, jitt, kind="rbf", tile_b=512):
    """Single-latent fused (kappa = Knm Kmm^-1 [B, M], Ktilde [B]).
    X [B, D], Z [M, D], L_invT [M, M].  kappa forms directly as
    Knm (L^-T L^-1) at 3-pass -- the XLA production path's own algorithm
    and precision (Precision.HIGH), proven end-to-end by the on-chip
    acceptance sweep; the measured design sweep (FUSED_VARIANTS.json)
    picked this over the slower two-factor whitened form.  Differentiable:
    backward runs through the XLA twin (`_kappa_xla_twin`)."""
    return _fused_kappa_impl(X, Z, L_invT, lengthscale, variance, jitt, kind, tile_b)


def _fused_kappa_fwd(X, Z, L_invT, lengthscale, variance, jitt, kind, tile_b):
    out = _fused_kappa_impl(X, Z, L_invT, lengthscale, variance, jitt, kind, tile_b)
    return out, (X, Z, L_invT, lengthscale, variance, jitt)


def _fused_kappa_bwd(kind, tile_b, res, cts):
    X, Z, L_invT, lengthscale, variance, jitt = res
    outs, vjp = jax.vjp(
        lambda x, z, li, ls, var, jt: _kappa_xla_twin(x, z, li, ls, var, jt, kind),
        X, Z, L_invT, lengthscale, variance, jitt,
    )
    cts = tuple(jnp.asarray(c, o.dtype) for c, o in zip(cts, outs))
    return vjp(cts)


fused_kappa.defvjp(_fused_kappa_fwd, _fused_kappa_bwd)


@functools.partial(jax.jit, static_argnames=("kind", "tile_b"))
def _fused_kappa_impl(X, Z, L_invT, lengthscale, variance, jitt, kind, tile_b):
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
    kinv = _kinv(L_invT.astype(jnp.float32))
    kappa, ktilde = pl.pallas_call(
        functools.partial(_kappa_kernel, kind=kind),
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
    )(X.astype(jnp.float32), Z.astype(jnp.float32), kinv, params)
    return kappa[:B], ktilde[:B, 0]


# --------------------------------------- batched (multi-latent) kappa+moments
def _kappa_moments_batched_kernel(
    xT_ref, z_ref, kinv_ref, mu_ref, sigma_ref, ls_ref, ls_col_ref,
    params_ref, kappa_ref, mf_ref, vf_ref, *, kind,
):
    """Grid (L, B-tiles): one latent GP x one minibatch tile per step.
    gram -> kappa -> Ktilde -> mean_f/var_f in one VMEM-resident pass; Knm
    never reaches HBM.  kappa IS written out (the E-step couples latents --
    e.g. the logistic-softmax inner fixed point sums over classes -- so the
    statistics contraction needs kappa again after an XLA elementwise
    stage; see `cavi_stats_batched`).

    TRANSPOSED layout (round 5, same redesign as the single-latent
    megakernel): the tile works in [M, TB] with the batch on the LANE
    axis, so the per-point moment vectors are [1, TB] (lane-dense) instead
    of [TB, 1] (1 of 128 lanes), and the tile's kappa block writes out as
    [L, M, Bp] -- consumers get lazily-swapped [L, B, M] views whose
    transposes XLA folds into the downstream dot dimension numbers.

    ls_ref is the per-latent [1, 1, D] lengthscale block in VMEM and
    ls_col_ref the same values as [1, D, 1] (the transposed x tile needs a
    column broadcast; building [D, 1] from a [D] lane vector in-kernel is
    a relayout).  Isotropic lengthscales arrive broadcast to [L, 1, D] /
    [L, D, 1], so per-latent ARD folds into the coordinates in-kernel --
    the analog of the single-latent tier's `_fused_scaled_inputs`.  The
    leading singleton keeps the trailing two block dims equal to full
    array dims: a 2-D [L, D] input with block (1, D) violates Mosaic's
    (8, 128) sublane tiling whenever L is not a multiple of 8 (the
    round-3 multi-latent lowering crash, VERDICT r3 Weak #2); leading
    batch dims may be blocked freely.  params_ref is the full [L, 2]
    (variance, jitter) SMEM array (blocked SMEM specs are not lowerable on
    TPU), indexed by the latent grid position."""
    l = pl.program_id(0)
    var = params_ref[l, 0]
    jitt = params_ref[l, 1]
    xs = xT_ref[:] / ls_col_ref[0]  # [D, TB]
    zs = z_ref[0] / ls_ref[0]  # [M, D]
    zz = jnp.sum(zs * zs, axis=1, keepdims=True)  # [M, 1]
    xx = jnp.sum(xs * xs, axis=0, keepdims=True)  # [1, TB]
    # 3-pass cross term: see _gram (round-3 failure mode at DEFAULT)
    r2 = jnp.maximum(zz + xx - 2.0 * _dot3(zs, xs), 0.0)  # [M, TB]
    if kind == "rbf":
        gramT = var * jnp.exp(-0.5 * r2)
    elif kind == "matern32":
        r = jnp.sqrt(jnp.maximum(3.0 * r2, 1e-36))
        gramT = var * (1.0 + r) * jnp.exp(-r)
    elif kind == "matern52":
        r = jnp.sqrt(jnp.maximum(5.0 * r2, 1e-36))
        gramT = var * (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    elif kind == "matern12":
        r = jnp.sqrt(jnp.maximum(r2, 1e-36))
        gramT = var * jnp.exp(-r)
    else:
        raise ValueError(kind)
    kappaT = _dot3(kinv_ref[0], gramT)  # [M, TB]; == XLA Precision.HIGH
    ktilde = jnp.maximum(
        var + jitt - jnp.sum(kappaT * gramT, axis=0, keepdims=True), 1e-12
    )  # [1, TB]
    mf = _dot1(mu_ref[0], kappaT)  # [1, TB] DEFAULT: matches the XLA twin
    kS = _dot1(sigma_ref[0], kappaT)  # [M, TB] DEFAULT: matches the twin
    vf = jnp.maximum(
        ktilde + jnp.sum(kS * kappaT, axis=0, keepdims=True), 1e-12
    )  # [1, TB]
    kappa_ref[0] = kappaT
    mf_ref[0] = mf
    vf_ref[0] = vf


def _kappa_moments_xla_twin(X, Z, L_invT, ls, var, mu, Sigma, jitt, kind):
    """Pure-XLA twin of the batched kernel's math (AD backward rule).
    ls is [L, D] (per-latent ARD; isotropic = broadcast columns)."""
    def twin(z, linvt, l, v, m, s):
        knm = _gram(X / l, z / l, v, kind)
        kappa = _dot3(knm, _kinv(linvt))
        ktilde = jnp.maximum(v + jitt - jnp.sum(kappa * knm, axis=1), 1e-12)
        mf = _dot1(kappa, m[:, None])[:, 0]
        vf = jnp.maximum(ktilde + jnp.sum(_dot1(kappa, s) * kappa, axis=1), 1e-12)
        return kappa, mf, vf

    return jax.vmap(twin)(Z, L_invT, ls, var, mu, Sigma)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_kappa_moments_batched(
    X, Z, L_invT, ls, var, mu, Sigma, jitt, kind="rbf", tile_b=512
):
    """Multi-latent fused (kappa [L,B,M], mean_f [L,B], var_f [L,B]).

    X [B,D]; Z [L,M,D]; L_invT [L,M,M] = per-latent (chol(Kmm)^-1)^T;
    ls [L,D] (per-latent ARD; broadcast isotropic values to D columns);
    var [L]; mu [L,M]; Sigma [L,M,M] (the ORIGINAL inducing-basis
    posterior; kappa forms directly as Knm K^-1 in-kernel at 3-pass,
    module docstring).  The latent axis
    is a grid dimension: multiclass (K classes), MOVGP/MOSVGP (Q latents)
    and heteroscedastic (2 GPs) all hit this path.  Differentiable via the
    XLA twin (hyperparameter steps)."""
    return _kappa_moments_batched_impl(X, Z, L_invT, ls, var, mu, Sigma, jitt, kind, tile_b)


def _kappa_moments_batched_fwd(X, Z, L_invT, ls, var, mu, Sigma, jitt, kind, tile_b):
    out = _kappa_moments_batched_impl(X, Z, L_invT, ls, var, mu, Sigma, jitt, kind, tile_b)
    return out, (X, Z, L_invT, ls, var, mu, Sigma, jitt)


def _kappa_moments_batched_bwd(kind, tile_b, res, cts):
    X, Z, L_invT, ls, var, mu, Sigma, jitt = res
    outs, vjp = jax.vjp(
        lambda x, z, li, l, v, m, s, jt: _kappa_moments_xla_twin(
            x, z, li, l, v, m, s, jt, kind
        ),
        X, Z, L_invT, ls, var, mu, Sigma, jitt,
    )
    cts = tuple(jnp.asarray(c, o.dtype) for c, o in zip(cts, outs))
    return vjp(cts)


fused_kappa_moments_batched.defvjp(
    _kappa_moments_batched_fwd, _kappa_moments_batched_bwd
)


@functools.partial(jax.jit, static_argnames=("kind", "tile_b"))
def _kappa_moments_batched_impl(X, Z, L_invT, ls, var, mu, Sigma, jitt, kind, tile_b):
    B, D = X.shape
    L, M, _ = Z.shape
    Bp = _round_up(B, tile_b)
    if Bp != B:
        X = jnp.pad(X, ((0, Bp - B), (0, 0)))
    ls2 = jnp.broadcast_to(
        jnp.reshape(ls.astype(jnp.float32), (L, -1)), (L, D)
    )  # isotropic broadcasts, ARD passes through
    ls3d = ls2[:, None, :]  # [L, 1, D]: the singleton middle axis keeps the
    # BlockSpec's trailing dims full (see kernel doc)
    ls_col = ls2[:, :, None]  # [L, D, 1] for the transposed x tile
    params = jnp.stack(
        [
            jnp.broadcast_to(jnp.ravel(var.astype(jnp.float32)), (L,)),
            jnp.full((L,), jitt, jnp.float32),
        ],
        axis=1,
    )  # [L, 2]
    kappaT, mfT, vfT = pl.pallas_call(
        functools.partial(_kappa_moments_batched_kernel, kind=kind),
        grid=(L, Bp // tile_b),
        in_specs=[
            pl.BlockSpec((D, tile_b), lambda l, i: (0, i)),
            pl.BlockSpec((1, M, D), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, M, M), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, 1, M), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, M, M), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, D, 1), lambda l, i: (l, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M, tile_b), lambda l, i: (l, 0, i)),
            pl.BlockSpec((1, 1, tile_b), lambda l, i: (l, 0, i)),
            pl.BlockSpec((1, 1, tile_b), lambda l, i: (l, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, M, Bp), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, Bp), jnp.float32),
        ],
    )(
        # one XLA-side relayout to the kernel's [D, B] lane-major layout
        X.astype(jnp.float32).T,
        Z.astype(jnp.float32),
        _kinv(L_invT.astype(jnp.float32)),
        mu.astype(jnp.float32)[:, None, :],
        Sigma.astype(jnp.float32),
        ls3d,
        ls_col,
        params,
    )
    # lazy [L, B, M] view: the swap folds into downstream dot dimension
    # numbers (and cancels against cavi_stats_batched's swap back)
    return jnp.swapaxes(kappaT, -1, -2)[:, :B], mfT[:, 0, :B], vfT[:, 0, :B]


# ----------------------------------------------- batched (multi-latent) stats
def _stats_batched_kernel(kappa_ref, g_ref, theta_ref, s1_ref, s2_ref):
    """TRANSPOSED layout: kappa arrives [M, TB] (batch on the lane axis);
    the statistics contract over dim 1 of both operands -- no in-kernel
    transposes, and g/theta are lane-dense [1, TB]."""
    i = pl.program_id(1)
    kappaT = kappa_ref[0]  # [M, TB]
    g = g_ref[0]  # [1, TB]
    th = theta_ref[0]  # [1, TB]

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[0] += jax.lax.dot_general(
        kappaT, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, 1]
    # DEFAULT precision: consumed in the kappa basis (no amplification),
    # matching the XLA twin einsum (module docstring)
    s2_ref[0] += jax.lax.dot_general(
        kappaT * th, kappaT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("tile_b",))
def cavi_stats_batched(kappa, g, theta, tile_b=512):
    """s1[l] = kappa[l]^T g[l], S2[l] = kappa[l]^T diag(theta[l]) kappa[l]
    for every latent l in one pass over kappa (grid (L, B-tiles); the [M] /
    [M,M] accumulators stay VMEM-resident across each latent's B-loop).

    Takes kappa as [L, B, M]; the kernel consumes the [L, M, B] transpose
    -- when kappa came from `fused_kappa_moments_batched` (which now
    emits [L, M, Bp] and returns a lazily-swapped view), the two
    transposes cancel and the kernel reads the ORIGINAL layout with no
    copy."""
    L, B, M = kappa.shape
    kappaT = jnp.swapaxes(kappa, -1, -2)  # [L, M, B]
    Bp = _round_up(B, tile_b)
    if Bp != B:
        kappaT = jnp.pad(kappaT, ((0, 0), (0, 0), (0, Bp - B)))
        g = jnp.pad(g, ((0, 0), (0, Bp - B)))
        theta = jnp.pad(theta, ((0, 0), (0, Bp - B)))
    s1, s2 = pl.pallas_call(
        _stats_batched_kernel,
        grid=(L, Bp // tile_b),
        in_specs=[
            pl.BlockSpec((1, M, tile_b), lambda l, i: (l, 0, i)),
            pl.BlockSpec((1, 1, tile_b), lambda l, i: (l, 0, i)),
            pl.BlockSpec((1, 1, tile_b), lambda l, i: (l, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, M, 1), lambda l, i: (l, 0, 0)),
            pl.BlockSpec((1, M, M), lambda l, i: (l, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, M, M), jnp.float32),
        ],
    )(
        kappaT.astype(jnp.float32),
        g.astype(jnp.float32)[:, None, :],
        theta.astype(jnp.float32)[:, None, :],
    )
    return s1[:, :, 0], s2


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
    # DEFAULT precision: kappa-basis, matches the XLA twin (module doc)
    s2_ref[:] += _dot1_g0(kappa * th, kappa)


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
    xT_ref, y_ref, mask_ref, z_ref, kinv_ref, mu_ref, sigma_ref, params_ref,
    s1_ref, s2_ref, c_ref, theta_ref, mf_ref, vf_ref, *, kind, lik,
):
    """One pass per B-tile: gram -> kappa = Knm K^-1 -> Ktilde ->
    latent moments -> likelihood E-step -> kappa-basis statistic
    accumulation.  Everything VMEM-resident; the minibatch tile is read
    exactly once from HBM.  Precision policy: module docstring (the
    round-2/round-3 hardware failures were both precision architecture).

    TRANSPOSED layout (round 5): the tile works in [M, TB] with the batch
    on the LANE axis, so every per-point vector (mf, vf, c, theta, y,
    mask) is [1, TB] -- lane-dense -- instead of the previous [TB, 1],
    which used 1 of 128 lanes for all E-step elementwise/transcendental
    work.  Measured v5e (same harness, 4 shapes): 1.08-1.14x over the
    row-major form at identical numerics (rel err vs old kernel ~1e-6 =
    shared-_dot3 reduction-order noise).  The wrapper transposes the
    minibatch XLA-side once per call ([B, D] -> [D, B], a cheap relayout
    next to the kernel's MXU work)."""
    i = pl.program_id(0)
    ls = params_ref[0]
    var = params_ref[1]
    jitt = params_ref[2]
    rho = params_ref[3]
    p0 = params_ref[4]  # likelihood parameter (sigma2 / nu etc.)
    p1 = params_ref[5]

    xT = xT_ref[:] / ls  # [D, TB]
    z = z_ref[:] / ls  # [M, D]
    zz = jnp.sum(z * z, axis=1, keepdims=True)  # [M, 1]
    xx = jnp.sum(xT * xT, axis=0, keepdims=True)  # [1, TB]
    # 3-pass cross term: see _gram (the round-3 failure mode at DEFAULT)
    r2 = jnp.maximum(zz + xx - 2.0 * _dot3(z, xT), 0.0)  # [M, TB]
    if kind == "rbf":
        gramT = var * jnp.exp(-0.5 * r2)
    elif kind == "matern32":
        r = jnp.sqrt(jnp.maximum(3.0 * r2, 1e-36))
        gramT = var * (1.0 + r) * jnp.exp(-r)
    elif kind == "matern52":
        r = jnp.sqrt(jnp.maximum(5.0 * r2, 1e-36))
        gramT = var * (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    elif kind == "matern12":
        r = jnp.sqrt(jnp.maximum(r2, 1e-36))
        gramT = var * jnp.exp(-r)
    else:
        raise ValueError(kind)
    # kappa^T = Kmm^-1 Knm^T (Kinv symmetric); == XLA Precision.HIGH
    kappa = _dot3(kinv_ref[:], gramT)  # [M, TB]
    ktilde = jnp.maximum(
        var + jitt - jnp.sum(kappa * gramT, axis=0, keepdims=True), 1e-12
    )  # [1, TB]
    mf = _dot1(mu_ref[:], kappa)  # [1, TB] DEFAULT: matches the XLA twin
    kS = _dot1(sigma_ref[:], kappa)  # [M, TB] DEFAULT: matches the XLA twin
    # var_f >= 0 mathematically (Ktilde + quadratic form); clamp shields the
    # E-step's sqrt/ratios from tiny negative rounding
    vf = jnp.maximum(
        ktilde + jnp.sum(kS * kappa, axis=0, keepdims=True), 1e-12
    )  # [1, TB]
    yb = y_ref[:]  # [1, TB]

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
    m = mask_ref[:]  # [1, TB]
    # statistics contract over the LANE (batch) axis: dim 1 of both
    # operands -- no in-kernel transpose, Mosaic fuses the N^T contraction
    s1_ref[:] += jax.lax.dot_general(
        kappa, rho * gmu * m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, 1]
    # DEFAULT precision: kappa-basis statistics feed the natural-gradient
    # update directly (no basis mapping, no cond amplification) and the XLA
    # twin einsum also runs DEFAULT -- see module docstring
    s2_ref[:] += jax.lax.dot_general(
        kappa * (rho * gs * m), kappa, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


_FUSED_LIKS = (
    "logistic", "gaussian", "studentt", "laplace", "bayesiansvm", "matern32",
    "negbinomial", "poisson",
)


def _auto_tile_b(M, B):
    """B-tile height for the single-latent megakernel: the largest tile
    whose ~3 [M, TB] f32 working tensors (gramT, kappaT, kS) fit VMEM with
    headroom (scoped limit 16 MB; tile_b=4096 at M=256 measured an 18 MB
    OOM).  Bigger tiles amortize per-grid-step overheads -- measured v5e
    flagship (M=64, B=4096): 66.1k -> 70.7k -> 74.6k iters/s at tile_b
    1024 / 2048 / 4096 (grid 4 -> 2 -> 1)."""
    if M <= 128:
        tb = 4096
    elif M <= 256:
        tb = 2048
    else:
        tb = 1024
    return min(tb, max(_round_up(B, 256), 256))


def _auto_tile_b_lat(K, M, B):
    """B-tile height for the K-latent megakernels: all K per-class kappa
    tiles stay VMEM-resident, so the budget scales with K*M.  Measured v5e
    (mc K=10/M=64, K=3/M=256; het M=64/256): tile 2048 beats 1024 by 2-6%
    everywhere it fits; 4096 REGRESSES het M=64 (36.5k vs 42.5k --
    pipelining loses double-buffer headroom), so 2048 is the cap."""
    tb = 2048 if K * M <= 768 else 1024
    return min(tb, max(_round_up(B, 256), 256))


@functools.partial(jax.jit, static_argnames=("kind", "lik", "tile_b"))
def fused_cavi_stats(
    xb, yb, Z, L_invT, mu, Sigma, lengthscale, variance, jitt, rho,
    lik_p0=0.0, lik_p1=0.0, kind="rbf", lik="logistic", tile_b=None,
):
    """Fused kappa-basis statistics for one CAVI step (single latent GP).

    Takes the ORIGINAL inducing-basis posterior (mu [M], Sigma [M, M]) and
    L_invT = (chol(Kmm)^-1)^T; kappa forms in-kernel directly as
    Knm (L^-T L^-1) at 3-pass (module docstring).  Returns
    (s1 [M], S2 [M, M], c [B], theta [B], mf [B], vf [B]) with
    (s1, S2) = (kappa^T rho gmu, kappa^T diag(rho gs) kappa) -- directly
    consumable by the natural-gradient update, no basis mapping.  (c,
    theta) are the E-step local variables (so state.local_vars stays in
    sync without a second pass) and (mf, vf) the latent moments (needed by
    likelihoods with closed-form parameter updates, e.g. the Poisson
    rate).  tile_b None -> _auto_tile_b (VMEM-bounded by M)."""
    B, D = xb.shape
    M = Z.shape[0]
    if tile_b is None:
        tile_b = _auto_tile_b(M, B)
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
        functools.partial(_cavi_fused_kernel, kind=kind, lik=lik),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((D, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, 1), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, M), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ],
    )(
        # one XLA-side relayout to the kernel's [D, B] lane-major layout
        xb.astype(jnp.float32).T,
        yb.astype(jnp.float32)[None, :],
        mask[None, :],
        Z.astype(jnp.float32),
        _kinv(L_invT.astype(jnp.float32)),
        mu.astype(jnp.float32)[None, :],
        Sigma.astype(jnp.float32),
        params,
    )
    return s1[:, 0], s2, c[0, :B], theta[0, :B], mf[0, :B], vf[0, :B]


# ----------------------------------- fully-fused multiclass CAVI statistics
def _digamma_psi(x):
    """In-kernel digamma for the logistic-softmax fixed point: 5 unrolled
    recurrence shifts (psi(x) = psi(x+1) - 1/x) to x >= 6, then the
    asymptotic series -- ~1e-9 absolute for x >= 1, and alpha = 1 +
    sum_k gamma_k >= 1 always.  (jax.scipy.special.digamma has no Mosaic
    lowering.)"""
    res = jnp.zeros_like(x)
    for _ in range(5):
        res = jnp.where(x < 6.0, res - 1.0 / x, res)
        x = jnp.where(x < 6.0, x + 1.0, x)
    inv = 1.0 / x
    inv2 = inv * inv
    return (
        res + jnp.log(x) - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
    )


def _cavi_fused_mc_kernel(
    xT_ref, y_ref, mask_ref, alpha_ref, beta_ref, z_ref, kinv_ref, mu_ref,
    sigma_ref, ls_ref, ls_col_ref, params_ref,
    s1_ref, s2_ref, c_ref, theta_ref, gamma_ref, alpha_out_ref, *, kind, K,
):
    """Fully-fused multiclass (logistic-softmax) CAVI statistics: ALL K
    latents AND the cross-class triple-augmentation E-step in one kernel,
    grid over B-tiles only -- kappa never round-trips to HBM (the
    two-kernel batched tier pays that trip because its E-step runs
    XLA-side; at small M the trip dominates and the tier loses 0.68-0.75x,
    GATE_AB boundary sweep).  The K loop is unrolled in-kernel (K static);
    all [K, M, M] operands and the per-class kappa tiles stay VMEM-resident
    -- the auto gate bounds K*M so they fit (analytic_vi._pallas_fused_mc_spec).

    Transposed [M, TB] layout throughout (round-5 design): per-point
    E-step arrays are [K, TB] / [1, TB], lane-dense.

    E-step (likelihoods/multiclass.py::local_updates, reference
    logisticsoftmax.jl:55-79), y one-hot [K, TB]:
      c_k = sqrt(mf_k^2 + vf_k)
      repeat 2x:  gamma_k = e^psi(alpha) e^{-mf_k/2} / (2 beta cosh(c_k/2))
                  alpha   = 1 + sum_k gamma_k
      theta_k = (y_k + gamma_k) tanh(c_k/2) / (2 c_k)
    beta is carried from local_vars (constant K under CAVI)."""
    i = pl.program_id(0)
    jitt = params_ref[0]
    rho = params_ref[1]
    xT = xT_ref[:]  # [D, TB]

    kappas = []
    mfs = []
    vfs = []
    for k in range(K):
        var_k = params_ref[2 + k]
        zs = z_ref[k] / ls_ref[k]  # [M, D]
        xs = xT / ls_col_ref[k]  # [D, TB]
        zz = jnp.sum(zs * zs, axis=1, keepdims=True)
        xx = jnp.sum(xs * xs, axis=0, keepdims=True)
        r2 = jnp.maximum(zz + xx - 2.0 * _dot3(zs, xs), 0.0)  # [M, TB]
        if kind == "rbf":
            gramT = var_k * jnp.exp(-0.5 * r2)
        elif kind == "matern32":
            r = jnp.sqrt(jnp.maximum(3.0 * r2, 1e-36))
            gramT = var_k * (1.0 + r) * jnp.exp(-r)
        elif kind == "matern52":
            r = jnp.sqrt(jnp.maximum(5.0 * r2, 1e-36))
            gramT = var_k * (1.0 + r + r * r / 3.0) * jnp.exp(-r)
        elif kind == "matern12":
            r = jnp.sqrt(jnp.maximum(r2, 1e-36))
            gramT = var_k * jnp.exp(-r)
        else:
            raise ValueError(kind)
        kappaT = _dot3(kinv_ref[k], gramT)  # [M, TB]
        ktilde = jnp.maximum(
            var_k + jitt - jnp.sum(kappaT * gramT, axis=0, keepdims=True),
            1e-12,
        )
        mf_k = _dot1(mu_ref[k], kappaT)  # [1, TB]
        kS = _dot1(sigma_ref[k], kappaT)
        vf_k = jnp.maximum(
            ktilde + jnp.sum(kS * kappaT, axis=0, keepdims=True), 1e-12
        )
        kappas.append(kappaT)
        mfs.append(mf_k)
        vfs.append(vf_k)

    mf = jnp.concatenate(mfs, axis=0)  # [K, TB]
    vf = jnp.concatenate(vfs, axis=0)
    c = jnp.sqrt(mf * mf + vf)
    # exp(-mf/2)/cosh(c/2) in log space (ops/special.py::safe_expcosh)
    ch = jnp.abs(c / 2.0)
    logcosh = ch + jnp.log1p(jnp.exp(-2.0 * ch)) - 0.6931471805599453
    expcosh = jnp.exp(-mf / 2.0 - logcosh)
    alpha = alpha_ref[:]  # [1, TB]
    beta = beta_ref[:]  # [1, TB]
    for _ in range(2):  # inner fixed point
        gamma = jnp.exp(_digamma_psi(alpha)) * expcosh / (2.0 * beta)
        alpha = 1.0 + jnp.sum(gamma, axis=0, keepdims=True)
    yT = y_ref[:]  # [K, TB]
    theta = (yT + gamma) * jnp.tanh(c / 2.0) / (2.0 * c)
    gmu = (yT - gamma) / 2.0
    gs = theta / 2.0

    c_ref[:] = c
    theta_ref[:] = theta
    gamma_ref[:] = gamma
    alpha_out_ref[:] = alpha

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    m = mask_ref[:]  # [1, TB]
    for k in range(K):
        s1_ref[k] += jax.lax.dot_general(
            kappas[k], rho * gmu[k : k + 1] * m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s2_ref[k] += jax.lax.dot_general(
            kappas[k] * (rho * gs[k : k + 1] * m), kappas[k],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("kind", "tile_b"))
def fused_cavi_stats_multiclass(
    xb, y_onehot, Z, L_invT, mu, Sigma, ls, var, jitt, rho, alpha0, beta0,
    kind="rbf", tile_b=None,
):
    """One-kernel multiclass CAVI statistics pass.

    xb [B, D]; y_onehot [B, K]; Z [K, M, D]; L_invT [K, M, M]; mu [K, M];
    Sigma [K, M, M]; ls [K, D] (ARD; broadcast isotropic); var [K];
    alpha0/beta0 [B] (the carried Gamma local variables).  Returns
    (s1 [K, M], S2 [K, M, M], c [K, B], theta [K, B], gamma [K, B],
    alpha [B]).  tile_b None -> _auto_tile_b_lat (VMEM-bounded by K*M)."""
    B, D = xb.shape
    K, M, _ = Z.shape
    if tile_b is None:
        tile_b = _auto_tile_b_lat(K, M, B)
    Bp = _round_up(B, tile_b)
    mask = jnp.ones((B,), jnp.float32)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
        y_onehot = jnp.pad(y_onehot, ((0, Bp - B), (0, 0)))
        mask = jnp.pad(mask, (0, Bp - B))
        alpha0 = jnp.pad(alpha0, (0, Bp - B), constant_values=1.0)
        beta0 = jnp.pad(beta0, (0, Bp - B), constant_values=float(K))
    ls2 = jnp.broadcast_to(jnp.reshape(ls.astype(jnp.float32), (K, -1)), (K, D))
    params = jnp.concatenate([
        jnp.asarray([jitt, rho], jnp.float32),
        jnp.broadcast_to(jnp.ravel(var.astype(jnp.float32)), (K,)),
    ])
    s1, s2, c, theta, gamma, alpha = pl.pallas_call(
        functools.partial(_cavi_fused_mc_kernel, kind=kind, K=K),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((D, tile_b), lambda i: (0, i)),
            pl.BlockSpec((K, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((K, M, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, M, M), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, 1, M), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, M, M), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, 1, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, D, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, M, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, M, M), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, tile_b), lambda i: (0, i)),
            pl.BlockSpec((K, tile_b), lambda i: (0, i)),
            pl.BlockSpec((K, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, M, M), jnp.float32),
            jax.ShapeDtypeStruct((K, Bp), jnp.float32),
            jax.ShapeDtypeStruct((K, Bp), jnp.float32),
            jax.ShapeDtypeStruct((K, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ],
    )(
        xb.astype(jnp.float32).T,
        y_onehot.astype(jnp.float32).T,
        mask[None, :],
        alpha0.astype(jnp.float32)[None, :],
        beta0.astype(jnp.float32)[None, :],
        Z.astype(jnp.float32),
        _kinv(L_invT.astype(jnp.float32)),
        mu.astype(jnp.float32)[:, None, :],
        Sigma.astype(jnp.float32),
        ls2[:, None, :],
        ls2[:, :, None],
        params,
    )
    return (
        s1[:, :, 0], s2, c[:, :B], theta[:, :B], gamma[:, :B], alpha[0, :B]
    )


# ------------------------------------ fully-fused heteroscedastic statistics
def _cavi_fused_het_kernel(
    xT_ref, y_ref, mask_ref, z_ref, kinv_ref, mu_ref, sigma_ref, ls_ref,
    ls_col_ref, params_ref,
    s1_ref, s2_ref, c_ref, phi_ref, gamma_ref, theta_ref, sigg_ref, *, kind,
):
    """Fully-fused heteroscedastic (2-latent) CAVI statistics: both latent
    GPs (f = mean, g = log-precision) and their COUPLED E-step
    (likelihoods/heteroscedastic.py::local_updates, reference
    heteroscedastic.jl:50-96) in one kernel, grid over B-tiles --
    same design as `_cavi_fused_mc_kernel` (kappa never round-trips to
    HBM; transposed [M, TB] layout).  The closed-form lambda update is an
    XLA epilogue on the emitted (phi, sigg) locals: it is a cross-batch
    reduction feeding the NEXT step only (local_updates computes gamma
    with the old lambda)."""
    i = pl.program_id(0)
    jitt = params_ref[0]
    rho = params_ref[1]
    lam = params_ref[2]

    xT = xT_ref[:]
    kappas = []
    moments = []
    for k in range(2):
        var_k = params_ref[3 + k]
        zs = z_ref[k] / ls_ref[k]
        xs = xT / ls_col_ref[k]
        zz = jnp.sum(zs * zs, axis=1, keepdims=True)
        xx = jnp.sum(xs * xs, axis=0, keepdims=True)
        r2 = jnp.maximum(zz + xx - 2.0 * _dot3(zs, xs), 0.0)
        if kind == "rbf":
            gramT = var_k * jnp.exp(-0.5 * r2)
        elif kind == "matern32":
            r = jnp.sqrt(jnp.maximum(3.0 * r2, 1e-36))
            gramT = var_k * (1.0 + r) * jnp.exp(-r)
        elif kind == "matern52":
            r = jnp.sqrt(jnp.maximum(5.0 * r2, 1e-36))
            gramT = var_k * (1.0 + r + r * r / 3.0) * jnp.exp(-r)
        elif kind == "matern12":
            r = jnp.sqrt(jnp.maximum(r2, 1e-36))
            gramT = var_k * jnp.exp(-r)
        else:
            raise ValueError(kind)
        kappaT = _dot3(kinv_ref[k], gramT)
        ktilde = jnp.maximum(
            var_k + jitt - jnp.sum(kappaT * gramT, axis=0, keepdims=True),
            1e-12,
        )
        mf_k = _dot1(mu_ref[k], kappaT)
        kS = _dot1(sigma_ref[k], kappaT)
        vf_k = jnp.maximum(
            ktilde + jnp.sum(kS * kappaT, axis=0, keepdims=True), 1e-12
        )
        kappas.append(kappaT)
        moments.append((mf_k, vf_k))

    yb = y_ref[:]  # [1, TB]
    (mf, vf), (mg, vg) = moments
    phi = ((mf - yb) ** 2 + vf) / 2.0
    c = jnp.sqrt(mg * mg + vg)
    ch = jnp.abs(c / 2.0)
    logcosh = ch + jnp.log1p(jnp.exp(-2.0 * ch)) - 0.6931471805599453
    sigg = jnp.exp(-mg / 2.0 - logcosh) / 2.0
    # gamma/theta use the OLD lam (exactly like local_updates); the f-latent
    # GRADIENTS use the NEW lam (grad_e_mu reads the post-update
    # likelihood), which is a batch-global reduction unknown until every
    # tile is processed -- but lam enters those gradients as a SCALAR
    # factor, so the f statistics accumulate WITHOUT it and the XLA
    # epilogue scales s1[0]/S2[0] by new_lam.
    gamma = lam * phi * sigg
    theta = (0.5 + gamma) * jnp.tanh(c / 2.0) / (2.0 * c)
    gmu_f = yb * sigg / 2.0  # x new_lam in the epilogue
    gs_f = sigg / 2.0  # x new_lam in the epilogue
    gmu_g = (0.5 - gamma) / 2.0
    gs_g = theta / 2.0

    c_ref[:] = c
    phi_ref[:] = phi
    gamma_ref[:] = gamma
    theta_ref[:] = theta
    sigg_ref[:] = sigg

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    m = mask_ref[:]
    for k, (gmu, gs) in enumerate(((gmu_f, gs_f), (gmu_g, gs_g))):
        s1_ref[k] += jax.lax.dot_general(
            kappas[k], rho * gmu * m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s2_ref[k] += jax.lax.dot_general(
            kappas[k] * (rho * gs * m), kappas[k], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("kind", "tile_b"))
def fused_cavi_stats_het(
    xb, yb, Z, L_invT, mu, Sigma, ls, var, jitt, rho, lam,
    kind="rbf", tile_b=None,
):
    """One-kernel heteroscedastic CAVI statistics pass.

    xb [B, D]; yb [B]; Z [2, M, D]; L_invT [2, M, M]; mu [2, M];
    Sigma [2, M, M]; ls [2, D]; var [2]; lam the (old) precision scale.
    Returns (s1 [2, M], S2 [2, M, M], c, phi, gamma, theta, sigg [B])."""
    B, D = xb.shape
    _, M, _ = Z.shape
    if tile_b is None:
        tile_b = _auto_tile_b_lat(2, M, B)
    Bp = _round_up(B, tile_b)
    mask = jnp.ones((B,), jnp.float32)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
        yb = jnp.pad(yb, (0, Bp - B))
        mask = jnp.pad(mask, (0, Bp - B))
    ls2 = jnp.broadcast_to(jnp.reshape(ls.astype(jnp.float32), (2, -1)), (2, D))
    params = jnp.concatenate([
        jnp.asarray(
            [jitt, rho, jnp.asarray(lam, jnp.float32)], jnp.float32
        ).reshape(3),
        jnp.broadcast_to(jnp.ravel(var.astype(jnp.float32)), (2,)),
    ])
    outs = pl.pallas_call(
        functools.partial(_cavi_fused_het_kernel, kind=kind),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((D, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
            pl.BlockSpec((2, M, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, M, M), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, 1, M), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, M, M), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, 1, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, D, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, M, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, M, M), lambda i: (0, 0, 0)),
        ] + [pl.BlockSpec((1, tile_b), lambda i: (0, i))] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((2, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((2, M, M), jnp.float32),
        ] + [jax.ShapeDtypeStruct((1, Bp), jnp.float32)] * 5,
    )(
        xb.astype(jnp.float32).T,
        yb.astype(jnp.float32)[None, :],
        mask[None, :],
        Z.astype(jnp.float32),
        _kinv(L_invT.astype(jnp.float32)),
        mu.astype(jnp.float32)[:, None, :],
        Sigma.astype(jnp.float32),
        ls2[:, None, :],
        ls2[:, :, None],
        params,
    )
    s1, s2, c, phi, gamma, theta, sigg = outs
    return (
        s1[:, :, 0], s2, c[0, :B], phi[0, :B], gamma[0, :B], theta[0, :B],
        sigg[0, :B],
    )
