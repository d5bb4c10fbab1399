"""AnalyticVI / AnalyticSVI: blockwise CAVI with natural-gradient updates.

The TPU-native re-design of /root/reference/src/inference/analyticVI.jl.
One CAVI iteration is a single jitted program:

  kernel matrices -> (kappa, Ktilde) -> mean_f/var_f -> likelihood E-step ->
  natural gradient -> eta -> (mu, Sigma)

Hot ops and their hardware mapping:
  * Knm gram + kappa = Knm Kmm^-1       -> batched [L,B,M]x[L,M,M] matmuls (MXU)
  * kappa^T diag(theta) kappa           -> one einsum contraction (MXU); this
    [M,M]-sized statistic (plus kappa^T grad_e_mu, an [M] vector) is the ONLY
    cross-data reduction of the step -- under a sharded data axis these are
    psum-ed (see parallel/sharded.py), everything else is local.
  * local updates                       -> fused elementwise [L,B] block (VPU)
  * eta -> moments                      -> [L,M,M] Cholesky, vmapped

Update equations (re-derived; reference analyticVI.jl:126-180):
  dense:  eta1 = gmu + K^-1 mu0;  eta2 = -(Diag(gs) + K^-1/2)
  sparse: d_eta1 = kappa^T (rho gmu) + K^-1 mu0 - eta1
          d_eta2 = -(rho kappa^T Diag(gs) kappa + K^-1/2) - eta2
  stochastic: eta += RobbinsMonro-scaled d_eta; else eta += d_eta (exact CAVI).
"""
from __future__ import annotations

import contextlib
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import jitter
from ..kernels import batch_diag, batch_gram, batch_gram_zz
from ..means import batch_call
from ..ops import linalg
from ..ops.kl import gaussian_kl
from ..training.state import TrainState
from ..utils.opt import ascent_update


# --------------------------------------------------------------- kernel mats
def compute_kmat(model, X) -> Dict[str, jnp.ndarray]:
    """Cholesky + inverse of the prior covariance over the inducing inputs
    (sparse: Z [L,M,D]; full: the training inputs X)
    (reference: gpblocks/latentgp.jl:201-207).

    L_inv (the triangular inverse of the Cholesky factor) backs the fused
    Pallas tier, which rebuilds K^-1 = L^-T L^-1 at HIGHEST and forms
    kappa = Knm K^-1 in-kernel at 3-pass -- the XLA production path's own
    algorithm and precision (see ops/pallas_kernels.py module docstring
    for the round-2/3/4 precision-architecture history)."""
    if model.is_sparse:
        K = batch_gram_zz(model.kernel, model.Z)
    else:
        K = batch_gram(model.kernel, X)
    jitt = jitter(K.dtype)
    L_K = jax.vmap(lambda k: linalg.safe_cholesky(k, jitt))(K)
    K_inv = jax.vmap(linalg.chol_inv)(L_K)
    out = {"L_K": L_K, "K_inv": K_inv}
    if model.is_sparse:
        # only the sparse fused tier consumes L_inv; for full models K is
        # [L, N, N] over the whole training set and the extra O(N^3)
        # triangular solve (+50% kmat memory) would be pure waste
        eye = jnp.eye(K.shape[-1], dtype=K.dtype)
        out["L_inv"] = jax.vmap(
            lambda l: jax.scipy.linalg.solve_triangular(l, eye, lower=True)
        )(L_K)
    return out


def kmat_l_inv(kmat):
    """kmat["L_inv"], computed from L_K when absent (e.g. the online
    masked_kmat path, which never reaches the fused tier but shares
    helpers)."""
    if "L_inv" in kmat:
        return kmat["L_inv"]
    eye = jnp.eye(kmat["L_K"].shape[-1], dtype=kmat["L_K"].dtype)
    return jax.vmap(
        lambda l: jax.scipy.linalg.solve_triangular(l, eye, lower=True)
    )(kmat["L_K"])


def _kappa_precision():
    """Matmul precision for the kappa = Knm K^-1 product.  The product
    cancels internally (K_inv entries are O(cond(Kmm)) while kappa is
    O(1)): DEFAULT (1-pass bf16) gives O(1) errors on moderately
    ill-conditioned Kmm (measured v5e: SVGP logistic accuracy 0.99 ->
    0.73), so the floor is HIGH (3-pass, ~f32-quality products; the full
    v5e acceptance sweep is 10/10 at HIGH with values matching HIGHEST,
    and the flagship runs +4.6% over HIGHEST).  Env override
    AGP_TPU_KAPPA_PRECISION=highest buys the last ~2 bits."""
    import os

    return {
        # "default" is an escape hatch for measured-well-conditioned
        # workloads only -- it is the silently-wrong mode the audit caught
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[os.environ.get("AGP_TPU_KAPPA_PRECISION", "high")]


_PALLAS_KINDS = {
    "SqExponentialKernel": "rbf",
    "RBFKernel": "rbf",
    "Matern12Kernel": "matern12",
    "Matern32Kernel": "matern32",
    "Matern52Kernel": "matern52",
}


# Trace-time override for the fused-tier gate.  GSPMD-partitioned programs
# (parallel/mesh.py jit-with-shardings steps) must trace with the tier OFF:
# XLA treats a pallas_call as an opaque custom call it cannot partition, so
# the partitioner would all-gather the sharded minibatch around it.  The
# shard_map-based fused step (mesh.py::sharded_fused_svi_step) instead calls
# the kernel per shard explicitly and psums the statistics.
_PALLAS_OVERRIDE: list[str | None] = [None]


@contextlib.contextmanager
def pallas_override(mode: str | None):
    """Force the fused-tier gate within a trace: "on", "off", or None (auto).
    Takes precedence over the AGP_TPU_PALLAS env var.

    TRACE-time state, NOT part of any jit cache key: a function already
    compiled under one mode will NOT retrace when called again under
    another (in-package uses wrap the override around the traced body
    itself, which is safe).  For an A/B of the same jitted function in one
    process, call `jax.clear_caches()` between modes (benchmarks/gate_ab.py)
    or use separate processes with AGP_TPU_PALLAS."""
    _PALLAS_OVERRIDE.append(mode)
    try:
        yield
    finally:
        _PALLAS_OVERRIDE.pop()


def _pallas_forced() -> str | None:
    """"on"/"off" when the tier is forced (override context or env),
    None in auto mode."""
    import os

    if _PALLAS_OVERRIDE[-1] is not None:
        return _PALLAS_OVERRIDE[-1]
    flag = os.environ.get("AGP_TPU_PALLAS")
    if flag == "0":
        return "off"
    if flag == "1":
        # forced on: TPU, or CPU under pltpu.force_tpu_interpret_mode()
        # (how the CPU test suite exercises the fused production path)
        return "on"
    return None


def _pallas_enabled(model) -> bool:
    """Backend gate for the fused Pallas tier; each tier applies its own
    measured shape policy on top (see _pallas_kind / _pallas_kind_batched).
    Env override: AGP_TPU_PALLAS=1 forces on, =0 forces off."""
    forced = _pallas_forced()
    if forced is not None:
        return forced == "on"
    from ..ops import pallas_kernels as pk

    return pk.available()


def _pallas_kind(model):
    """Fused-kernel kind when the single-latent Pallas path applies: TPU
    backend, stationary kernel, winning shape.  ARD lengthscales fold into
    the inputs (`_fused_scaled_inputs`), so the kernel always sees an
    isotropic ls.  Since round 4 the fused tier is basis-transparent
    (kernels return kappa, never whitened features), so every
    latent_moments consumer -- including NumericalVI's d1/d2 contractions
    (the round-3 advisor finding) -- reads the third output safely.

    Shape policy (round-5 TRANSPOSED fused kernel -- the [M, TB] layout
    with the batch on the lane axis; measured end-to-end on v5e with
    host-readback timing, GATE_AB.json / benchmarks/gate_ab.py): the
    fused step now wins at EVERY measured single-latent shape -- 1.10x at
    the flagship M=64/B=4096, 1.05x M=128/B=32768, 1.09-1.22x M=256,
    1.08-1.46x M=512 (1.59x studentt).  Auto: on for M >= 64 AND
    (stochastic per-step batch >= 4096, the smallest measured win shape,
    or full batch -- stochastic=False, batchsize=0, per-step B=N).
    Below those, unmeasured territory where tile padding (tile_b=1024)
    wastes compute: XLA path."""
    if not _pallas_enabled(model) or model.n_latent != 1:
        return None
    if _pallas_forced() != "on":
        if getattr(model, "n_inducing", 0) < 64:
            return None
        inf = model.inference
        if getattr(inf, "stochastic", False) and inf.batchsize < 4096:
            return None
    return _PALLAS_KINDS.get(type(model.kernel).__name__)


def _pallas_kind_kappa_only(model):
    """Gate for the kappa-ONLY kernel uses (latent_moments' fused_kappa and
    apply_natural_gradient's cavi_stats when the fully-fused spec did not
    apply, e.g. NumericalVI or an @augmodel likelihood).  These save no HBM
    round trip -- kappa is immediately re-read XLA-side -- and measured a
    LOSS at every shape on v5e (PALLAS_BENCH.json kappa columns), so they
    are never auto-enabled: forced-on only (AGP_TPU_PALLAS=1 /
    pallas_override("on")).  The fully-fused statistics path
    (_pallas_fused_spec) and the batched moments+stats pair keep their
    measured auto gates."""
    if _pallas_forced() != "on":
        return None
    return _pallas_kind(model)


def _fused_scaled_inputs(model, x):
    """(x', Z', ls) for the single-latent fused kernels.  Isotropic
    lengthscale passes through; an ARD (per-dim) lengthscale is folded into
    the coordinates (x/ls, Z/ls with ls=1 in-kernel) -- stationary kernels
    depend on the scaled pairwise distance only, and hyper-gradients flow
    through the XLA scaling op into the custom-VJP kernels unchanged."""
    ls = model.kernel.lengthscale
    ls0 = ls[0] if jnp.ndim(ls) >= 1 else ls  # strip the [L=1] latent axis
    if jnp.ndim(ls0) == 0:
        return x, model.Z[0], ls0
    return x / ls0, model.Z[0] / ls0, jnp.asarray(1.0, x.dtype)


def _pallas_kind_batched(model):
    """Fused-kernel kind for the MULTI-latent sparse path (multiclass [K],
    multi-output [Q], heteroscedastic [2]): the latent axis becomes a Pallas
    grid dimension (ops/pallas_kernels.py::fused_kappa_moments_batched /
    cavi_stats_batched).

    Measured v5e win region (round-5 TRANSPOSED batched kernels,
    host-readback production A/B -- GATE_AB.json): K=3 logistic-softmax
    1.42x at M=512/B=32768, 1.00x at M=512/B=8192, a wash at M=256
    (0.99-1.03x) and a loss at M=64 (0.68-0.75x, K=10) -- the batched
    tier's kappa round-trip to HBM (the E-step couples latents XLA-side)
    needs the M >= 512 compute density.  Auto: on for M >= 512 AND
    stochastic per-step batch >= 16384 (full-batch AnalyticVI,
    stochastic=False with batchsize=0, gates on M alone -- per-step B=N)."""
    if not _pallas_enabled(model) or model.n_latent <= 1:
        return None
    if not model.is_sparse or getattr(model, "is_online", False):
        return None
    if _pallas_forced() != "on":
        if getattr(model, "n_inducing", 0) < 512:
            return None
        inf = model.inference
        if getattr(inf, "stochastic", False) and inf.batchsize < 16384:
            return None
    # [L, D] ARD lengthscales fold into the coordinates in-kernel (the
    # batched kernel takes ls as a per-latent [L, D] VMEM input)
    return _PALLAS_KINDS.get(type(model.kernel).__name__)


def _pallas_fused_spec(model):
    """(kind, lik_name, p0, p1, c_key) when the WHOLE single-latent CAVI
    statistics pass can run as one fused Pallas kernel
    (ops/pallas_kernels.py::fused_cavi_stats): supported stationary kernel
    + supported likelihood.  The kernel reads the minibatch tile from HBM
    exactly once -- gram, kappa, Ktilde, latent moments, E-step and both
    statistic contractions never round-trip.  c_key names the local-vars
    slot the kernel's c output maps to (None: theta-only likelihood)."""
    kind = _pallas_kind(model)
    if kind is None or not model.is_sparse or getattr(model, "is_online", False):
        return None
    lik = model.likelihood
    name = type(lik).__name__
    if name == "LogisticLikelihood":
        return kind, "logistic", 0.0, 0.0, "c"
    if name == "GaussianLikelihood" and lik.opt_noise is None:
        return kind, "gaussian", lik.sigma2, 0.0, None
    if name == "StudentTLikelihood":
        return kind, "studentt", lik.nu, lik.sigma**2, "c"
    if name == "LaplaceLikelihood":
        return kind, "laplace", lik.a, 0.0, "b"
    if name == "BayesianSVM":
        return kind, "bayesiansvm", 0.0, 0.0, "c"
    if name == "Matern32Likelihood":
        return kind, "matern32", lik.rho, 0.0, "c"
    if name == "NegBinomialLikelihood":
        return kind, "negbinomial", lik.r, 0.0, "c"
    if name == "PoissonLikelihood":
        # lam passes in as p0; its closed-form MLE update runs as an XLA
        # epilogue on the kernel's (mf, vf) outputs (see variational_update)
        return kind, "poisson", lik.lam, 0.0, "c"
    return None


def _pallas_fused_mc_spec(model):
    """Kernel kind when the FULLY-fused multiclass path applies
    (ops/pallas_kernels.py::fused_cavi_stats_multiclass): logistic-softmax
    + supported stationary kernel, sparse, not online.  All K latents and
    the cross-class triple-augmentation E-step run in ONE kernel, grid
    over B-tiles -- kappa never round-trips to HBM, unlike the two-kernel
    batched tier whose XLA-side E-step forces the trip.  VMEM bound: the
    [K, M, M] operands and per-class kappa tiles stay resident, so the
    kernel requires K * M <= 2560 and M <= 256 -- complementary to the
    batched tier's M >= 512 gate.

    Measured v5e win region (host-readback production A/B, GATE_AB.json
    round 5): K=10 M=64 1.07x at B=2048 / 1.16x at B=8192; K=5 M=128
    1.14x at B=4096; K=3 M=256 1.16x at B=8192 / 1.30x at B=32768 --
    where the two-kernel tier LOST 0.68-0.75x (K=10 M=64) or washed
    (M=256), with mu-trajectory correlation ~1.0 between arms on chip.
    Auto: on for stochastic per-step batch >= 2048 (or full batch)."""
    if not _pallas_enabled(model) or model.n_latent <= 1:
        return None
    if not model.is_sparse or getattr(model, "is_online", False):
        return None
    if type(model.likelihood).__name__ != "LogisticSoftMaxLikelihood":
        return None
    K, M = model.n_latent, getattr(model, "n_inducing", 0)
    if K * M > 2560 or M > 256:
        return None
    if _pallas_forced() != "on":
        inf = model.inference
        if getattr(inf, "stochastic", False) and inf.batchsize < 2048:
            return None
    return _PALLAS_KINDS.get(type(model.kernel).__name__)


def _pallas_fused_het_spec(model):
    """Kernel kind when the fully-fused heteroscedastic path applies
    (ops/pallas_kernels.py::fused_cavi_stats_het): both latents and the
    coupled E-step in one kernel, small-M region (M <= 256), same design
    rationale as `_pallas_fused_mc_spec`.  The closed-form lambda update
    runs as an XLA epilogue on the emitted (phi, sigg) locals.

    Measured v5e (host-readback production A/B, round 5): M=64/B=2048
    1.07x, M=64/B=8192 1.02x, M=256/B=8192 1.10x, mu-trajectory
    correlation ~1.0 between arms.  Auto: on for stochastic per-step
    batch >= 2048 (or full batch)."""
    if not _pallas_enabled(model) or model.n_latent != 2:
        return None
    if not model.is_sparse or getattr(model, "is_online", False):
        return None
    if getattr(model, "is_multioutput", False):
        return None
    if type(model.likelihood).__name__ != "HeteroscedasticLikelihood":
        return None
    if getattr(model, "n_inducing", 0) > 256:
        return None
    if _pallas_forced() != "on":
        inf = model.inference
        if getattr(inf, "stochastic", False) and inf.batchsize < 2048:
            return None
    return _PALLAS_KINDS.get(type(model.kernel).__name__)


def compute_kappa(model, x, kmat):
    """(Knm, kappa = Knm Kmm^-1, Ktilde) for a data batch
    (reference: gpblocks/latentgp.jl:209-215).

    The reference asserts Ktilde > 0; on accelerators we clamp at a tiny
    positive floor instead of aborting the jitted program.  (The fused TPU
    tier does not route through here -- its kernels form kappa in-kernel
    via the whitened intermediate; see latent_moments and
    ops/pallas_kernels.py.)"""
    Knm = batch_gram(model.kernel, x, model.Z)  # [L, B, M]
    # HIGHEST: kappa = Knm K^-1 cancels internally (K_inv entries are
    # O(cond(Kmm)) while kappa is O(1)); at the TPU's default f32 matmul
    # precision the error reaches O(1) for moderately ill-conditioned Kmm
    # (measured v5e: kappa rel error 1.66, SVGP logistic acc 0.99 -> 0.73).
    # The downstream additive statistics stay at default.
    kappa = jnp.einsum(
        "lbm,lmn->lbn",
        Knm,
        kmat["K_inv"],
        preferred_element_type=Knm.dtype,
        precision=_kappa_precision(),
    )
    kdiag = batch_diag(model.kernel, x)  # [L, B]
    Ktilde = kdiag + jitter(Knm.dtype) - linalg.diag_ABt(kappa, Knm)
    Ktilde = jnp.maximum(Ktilde, 1e-12)
    return Knm, kappa, Ktilde


def latent_moments(model, state: TrainState, x, kmat):
    """mean_f/var_f of the latent function at the batch
    (reference: gpblocks/latentgp.jl:171-189).

    The n_latent == 1 sparse path uses unbatched [B, M] matmuls: batch-1
    einsums/vmapped ops lower poorly on TPU (measured 3.5x slower per CAVI
    step than the squeezed forms).

    The third return value is ALWAYS kappa (basis-transparent since round
    4): the fused Pallas kernels form kappa in-kernel through the whitened
    intermediate W = Knm L^-T (ops/pallas_kernels.py module docstring), so
    every consumer -- apply_natural_gradient, numerical_vi's d1/d2, the MO
    mixing path -- contracts against the same kappa the XLA path yields."""
    if model.is_sparse:
        if getattr(model, "is_online", False):
            from ..models.online_svgp import masked_kappa

            _, kappa, Ktilde = masked_kappa(model, x, kmat)
        elif model.n_latent == 1:
            kind = _pallas_kind_kappa_only(model)
            if kind is not None:
                from ..ops import pallas_kernels as pk

                xs, zs, ls = _fused_scaled_inputs(model, x)
                kappa1, Ktilde1 = pk.fused_kappa(
                    xs,
                    zs,
                    kmat_l_inv(kmat)[0].T,
                    ls,
                    jnp.ravel(model.kernel.variance)[0],
                    jitter(x.dtype),
                    kind=kind,
                )
                kappa1 = kappa1.astype(x.dtype)
                Ktilde1 = Ktilde1.astype(x.dtype)
                mu_f = (kappa1 @ state.mu[0])[None]
                kS = jnp.dot(kappa1, state.Sigma[0])
                vf = Ktilde1 + jnp.sum(kS * kappa1, axis=1)
                return mu_f, jnp.maximum(vf, 1e-12)[None], kappa1[None]
            kernel1 = jax.tree_util.tree_map(lambda l: l[0], model.kernel)
            Knm = kernel1.gram(x, model.Z[0])  # [B, M]
            # HIGHEST: see compute_kappa
            kappa1 = jnp.dot(
                Knm, kmat["K_inv"][0], precision=_kappa_precision()
            )
            Ktilde1 = (
                kernel1.diag(x) + jitter(Knm.dtype) - jnp.sum(kappa1 * Knm, axis=1)
            )
            Ktilde1 = jnp.maximum(Ktilde1, 1e-12)
            mu_f = (kappa1 @ state.mu[0])[None]
            vf = Ktilde1 + jnp.sum((kappa1 @ state.Sigma[0]) * kappa1, axis=1)
            return mu_f, vf[None], kappa1[None]
        else:
            kind = _pallas_kind_batched(model)
            if kind is not None:
                from ..ops import pallas_kernels as pk

                L, D = model.n_latent, x.shape[-1]
                ls2d = jnp.broadcast_to(
                    jnp.reshape(model.kernel.lengthscale, (L, -1)), (L, D)
                )
                kappa, mu_f, var_f = pk.fused_kappa_moments_batched(
                    x,
                    model.Z,
                    jnp.swapaxes(kmat_l_inv(kmat), -1, -2),
                    ls2d,
                    jnp.ravel(model.kernel.variance),
                    state.mu,
                    state.Sigma,
                    jitter(x.dtype),
                    kind=kind,
                )
                return (
                    mu_f.astype(x.dtype),
                    var_f.astype(x.dtype),
                    kappa.astype(x.dtype),
                )
            _, kappa, Ktilde = compute_kappa(model, x, kmat)
        mu_f = jnp.einsum("lbm,lm->lb", kappa, state.mu)
        kS = jnp.einsum(
            "lbm,lmn->lbn", kappa, state.Sigma, preferred_element_type=kappa.dtype
        )
        var_f = Ktilde + linalg.diag_ABt(kS, kappa)
        return mu_f, var_f, kappa
    mu_f = state.mu
    var_f = jnp.diagonal(state.Sigma, axis1=-2, axis2=-1)
    return mu_f, var_f, None


# ----------------------------------------------------------------- CAVI step
def variational_update(model, state: TrainState, x, y, w=None) -> Tuple[Any, TrainState]:
    """One blockwise coordinate-ascent update (E-step + natural gradient +
    global update), reference analyticVI.jl:62-85.

    On TPU in the large-M regime the entire statistics pass (gram -> kappa
    -> moments -> E-step -> contractions) runs as ONE Pallas kernel; the
    minibatch is read from HBM exactly once (see `_pallas_fused_spec`).

    `w` ([B] of 0/1, optional) zero-weights padded rows out of every
    cross-batch statistic -- used by the sharded full-batch drivers
    (parallel/mesh.py) when N is not divisible by the mesh size.  The
    statistics s1/stat2 are linear in the per-row gmu/gs, so masking those
    (plus the likelihood-parameter sums, see Likelihood.local_updates)
    makes the padded trajectory bit-equivalent to the unpadded one."""
    kmat = state.kmat
    if getattr(model, "is_tprior", False):
        from ..models.vstp import local_prior_updates

        state = local_prior_updates(model, state, x)

    # the fully-fused kernel runs its E-step in-kernel with no mask input;
    # weighted (padded) batches take the XLA path
    fused = _pallas_fused_spec(model) if w is None else None
    if fused is not None:
        from ..ops import pallas_kernels as pk

        kind, lik_name, p0, p1, c_key = fused
        rho = state.rho
        xs, zs, ls = _fused_scaled_inputs(model, x)
        s1, S2, c, theta, mf, vf = pk.fused_cavi_stats(
            xs,
            y,
            zs,
            kmat_l_inv(kmat)[0].T,
            state.mu[0],
            state.Sigma[0],
            ls,
            jnp.ravel(model.kernel.variance)[0],
            jitter(x.dtype),
            rho,
            lik_p0=p0,
            lik_p1=p1,
            kind=kind,
            lik=lik_name,
        )
        s1 = s1.astype(x.dtype)[None]
        S2 = S2.astype(x.dtype)[None]
        c = c.astype(x.dtype)
        theta = theta.astype(x.dtype)
        local = dict(state.local_vars)
        local["theta"] = theta
        if c_key is not None and c_key in local:
            local[c_key] = c
        if lik_name == "poisson":
            # epilogue of the Poisson E-step on the kernel's latent moments:
            # gamma (the in-kernel formula, for local_vars/ELBO terms) and
            # the closed-form rate MLE lam <- sum y / sum E[sigmoid(f)]
            # (likelihoods/event.py::_local_updates)
            from ..ops.quadrature import expectation
            from ..ops.special import safe_expcosh

            mf = mf.astype(x.dtype)
            vf = vf.astype(x.dtype)
            local["gamma"] = (
                model.likelihood.lam * safe_expcosh(-mf / 2.0, c / 2.0) / 2.0
            )
            new_lam = jnp.sum(y) / jnp.sum(expectation(jax.nn.sigmoid, mf, vf))
            model = model.replace(likelihood=model.likelihood.replace(lam=new_lam))
        state = _nat_update_from_stats(
            model, state.replace(local_vars=local), s1, S2, x
        )
        return model, state

    fused_mc = _pallas_fused_mc_spec(model) if w is None else None
    if fused_mc is not None:
        from ..ops import pallas_kernels as pk

        L, D = model.n_latent, x.shape[-1]
        ls2d = jnp.broadcast_to(
            jnp.reshape(model.kernel.lengthscale, (L, -1)), (L, D)
        )
        s1, S2, c, theta, gamma, alpha = pk.fused_cavi_stats_multiclass(
            x,
            y,
            model.Z,
            jnp.swapaxes(kmat_l_inv(kmat), -1, -2),
            state.mu,
            state.Sigma,
            ls2d,
            jnp.ravel(model.kernel.variance),
            jitter(x.dtype),
            state.rho,
            state.local_vars["alpha"],
            state.local_vars["beta"],
            kind=fused_mc,
        )
        local = dict(state.local_vars)
        local.update(
            c=c.astype(x.dtype),
            theta=theta.astype(x.dtype),
            gamma=gamma.astype(x.dtype),
            alpha=alpha.astype(x.dtype),
        )
        state = _nat_update_from_stats(
            model,
            state.replace(local_vars=local),
            s1.astype(x.dtype),
            S2.astype(x.dtype),
            x,
        )
        return model, state

    fused_het = _pallas_fused_het_spec(model) if w is None else None
    if fused_het is not None:
        from ..ops import pallas_kernels as pk

        L, D = 2, x.shape[-1]
        ls2d = jnp.broadcast_to(
            jnp.reshape(model.kernel.lengthscale, (L, -1)), (L, D)
        )
        lik = model.likelihood
        s1, S2, c, phi, gamma, theta, sigg = pk.fused_cavi_stats_het(
            x,
            y,
            model.Z,
            jnp.swapaxes(kmat_l_inv(kmat), -1, -2),
            state.mu,
            state.Sigma,
            ls2d,
            jnp.ravel(model.kernel.variance),
            jitter(x.dtype),
            state.rho,
            lik.lam,
            kind=fused_het,
        )
        phi = phi.astype(x.dtype)
        sigg = sigg.astype(x.dtype)
        local = dict(state.local_vars)
        local.update(
            c=c.astype(x.dtype),
            phi=phi,
            gamma=gamma.astype(x.dtype),
            theta=theta.astype(x.dtype),
            sigg=sigg,
        )
        # closed-form lambda MLE epilogue (likelihoods/heteroscedastic.py::
        # local_updates).  gamma/theta in-kernel used the OLD lam exactly
        # like local_updates; the f-latent gradients use the NEW lam
        # (grad_e_mu reads the post-update likelihood), which enters them
        # as a scalar factor -- the kernel accumulated the f statistics
        # without it, so scale s1[0]/S2[0] here.
        n = x.shape[0]
        new_lam = jnp.maximum(n / (2.0 * jnp.sum(phi * (1.0 - sigg))), lik.lam)
        model = model.replace(likelihood=lik.replace(lam=new_lam))
        scale = jnp.stack(
            [new_lam.astype(x.dtype), jnp.asarray(1.0, x.dtype)]
        )
        s1 = s1.astype(x.dtype) * scale[:, None]
        S2 = S2.astype(x.dtype) * scale[:, None, None]
        state = _nat_update_from_stats(
            model, state.replace(local_vars=local), s1, S2, x
        )
        return model, state

    mu_f, var_f, kappa = latent_moments(model, state, x, kmat)

    # E-step: closed-form update of q(omega)
    lik, local = model.likelihood.local_updates(y, mu_f, var_f, state.local_vars, w=w)
    model = model.replace(likelihood=lik)

    gmu = lik.grad_e_mu(y, local)  # [L, B]
    gs = lik.grad_e_sigma(y, local)  # [L, B]
    if w is not None:
        gmu = gmu * w
        gs = gs * w

    state = apply_natural_gradient(model, state.replace(local_vars=local), kappa, gmu, gs, x)
    return model, state


def apply_natural_gradient(model, state: TrainState, kappa, gmu, gs, x) -> TrainState:
    """Shared natural-gradient + global update given the latent-axis
    gradient expectations gmu/gs [L, B] (used by both single-likelihood and
    multi-output paths).  `kappa` is always kappa (latent_moments is
    basis-transparent since round 4), so the Pallas branches differ from
    the XLA einsums only in their one-HBM-pass accumulation."""
    if model.is_sparse:
        rho = state.rho
        kind = (
            _pallas_kind_kappa_only(model)
            if not getattr(model, "is_online", False)
            else None
        )
        if kind is not None:
            from ..ops import pallas_kernels as pk

            s1, stat2 = pk.cavi_stats(kappa[0], rho * gmu[0], rho * gs[0])
            s1 = s1.astype(kappa.dtype)[None]
            stat2 = stat2.astype(kappa.dtype)[None]
        elif model.n_latent == 1 and not getattr(model, "is_online", False):
            k1 = kappa[0]
            s1 = (k1.T @ (rho * gmu[0]))[None]
            stat2 = ((k1 * (rho * gs[0])[:, None]).T @ k1)[None]
        elif _pallas_kind_batched(model) is not None:
            from ..ops import pallas_kernels as pk

            s1, stat2 = pk.cavi_stats_batched(kappa, rho * gmu, rho * gs)
            s1 = s1.astype(kappa.dtype)
            stat2 = stat2.astype(kappa.dtype)
        else:
            s1 = jnp.einsum("lbm,lb->lm", kappa, rho * gmu)
            stat2 = jnp.einsum(
                "lbm,lb,lbn->lmn",
                kappa,
                rho * gs,
                kappa,
                preferred_element_type=kappa.dtype,
            )
        return _nat_update_from_stats(model, state, s1, stat2, x)

    mu0 = prior_mean_stack(model, x)  # [L, M]
    K_inv = state.kmat["K_inv"]
    if getattr(model, "is_tprior", False):
        # Student-t prior: effective precision chi K^-1 (see models/vstp.py)
        K_inv = state.prior_state["chi"][:, None, None] * K_inv
    Kinv_mu0 = jnp.einsum("lmn,ln->lm", K_inv, mu0)
    eta1 = gmu + Kinv_mu0
    eta2 = linalg.symmetrize(-(jax.vmap(jnp.diag)(gs) + 0.5 * K_inv))
    return state.replace(
        eta1=eta1, eta2=eta2, **_moments_kw(model, eta1, eta2, state.Sigma)
    )


def _nat_update_from_stats(model, state: TrainState, s1, stat2, x) -> TrainState:
    """Sparse natural-gradient global update given the two cross-data
    statistics s1 = kappa^T (rho gmu) [L, M] and
    stat2 = kappa^T diag(rho gs) kappa [L, M, M]."""
    kmat = state.kmat
    mu0 = prior_mean_stack(model, x)
    K_inv = kmat["K_inv"]
    if getattr(model, "is_tprior", False):
        K_inv = state.prior_state["chi"][:, None, None] * K_inv
    Kinv_mu0 = jnp.einsum("lmn,ln->lm", K_inv, mu0)

    nat1_target = s1 + Kinv_mu0
    nat2_target = -(stat2 + 0.5 * K_inv)
    if model.inference.stochastic:
        d_eta1 = nat1_target - state.eta1
        d_eta2 = nat2_target - state.eta2
        opt_state, (u1, u2) = ascent_update(
            model.inference.optimiser,
            state.opt_state,
            (state.eta1, state.eta2),
            (d_eta1, d_eta2),
        )
        eta1 = state.eta1 + u1
        eta2 = linalg.symmetrize(state.eta2 + u2)
        state = state.replace(opt_state=opt_state)
    else:
        eta1 = nat1_target
        eta2 = linalg.symmetrize(nat2_target)
    return state.replace(
        eta1=eta1, eta2=eta2, **_moments_kw(model, eta1, eta2, state.Sigma)
    )


def _fast_moments_enabled(dim: int | None = None) -> bool:
    """Warm-started Newton-Schulz eta->moments conversion
    (ops/linalg.py::nat_to_moments_warm): matmul-only on the MXU instead of
    the sequential small-M Cholesky.  Default ON for TPU backends when the
    matrix dim is small (measured v5e: 1.45x at M=64 flagship, 4.1x on
    batched [10,64,64] multiclass, ~neutral at M=512, 0.88x at N=2048 dense
    where Schulz's ~10 N^3 FLOPs exceed the ~2.4 N^3 of chol+solve) -- it
    is a small-matrix LATENCY win, so the auto gate requires dim <= 512.
    Exact to f32 roundoff with a Cholesky fallback when the warm start is
    far.  AGP_TPU_FAST_MOMENTS=0 forces the exact path, =1 forces fast."""
    import os

    flag = os.environ.get("AGP_TPU_FAST_MOMENTS")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from ..ops import pallas_kernels as pk

    return pk.available() and (dim is None or dim <= 512)


def _moments_kw(model, eta1, eta2, Sigma_prev=None):
    fast = Sigma_prev is not None and _fast_moments_enabled(eta1.shape[-1])
    if model.n_latent == 1:
        # unbatched 64x64 Cholesky/solves: batch-1 vmapped linalg lowers
        # poorly on TPU
        if fast:
            mu1, Sigma1 = linalg.nat_to_moments_warm(eta1[0], eta2[0], Sigma_prev[0])
        else:
            mu1, Sigma1 = linalg.nat_to_moments(eta1[0], eta2[0])
        return dict(mu=mu1[None], Sigma=Sigma1[None])
    if fast:
        mu, Sigma = linalg.nat_to_moments_warm_batched(eta1, eta2, Sigma_prev)
    else:
        mu, Sigma = jax.vmap(linalg.nat_to_moments)(eta1, eta2)
    return dict(mu=mu, Sigma=Sigma)


def prior_mean_stack(model, x):
    """[L, M] prior mean over the inducing inputs (Z for sparse, x for full)."""
    if model.is_sparse:
        mu0 = batch_call(model.mean, model.Z, model.n_latent)
        if getattr(model, "is_online", False):
            mu0 = mu0 * model.z_mask
        return mu0
    return batch_call(model.mean, x, model.n_latent)


# ---------------------------------------------------------------------- ELBO
def elbo(model, state: TrainState, x, y, kmat=None) -> jnp.ndarray:
    """ELBO = rho E[log p(y|f,omega)] - GaussianKL - rho AugmentedKL
    (reference: analyticVI.jl:255-297).  The augmented KL is excluded from
    hyperparameter gradients exactly as the reference does with
    `ChainRulesCore.ignore_derivatives` (analyticVI.jl:269-271)."""
    kmat = state.kmat if kmat is None else kmat
    mu_f, var_f, _ = latent_moments(model, state, x, kmat)
    rho = state.rho if model.is_sparse else jnp.asarray(1.0, mu_f.dtype)
    tot = rho * model.likelihood.expec_loglik(y, mu_f, var_f, state.local_vars)
    mu0 = prior_mean_stack(model, x)
    L_K = kmat["L_K"]
    if getattr(model, "is_tprior", False) and state.prior_state is not None:
        # prior covariance K / chi: scale the Cholesky factor
        L_K = L_K / jnp.sqrt(state.prior_state["chi"])[:, None, None]
    kl = jax.vmap(gaussian_kl)(state.mu, mu0, state.Sigma, L_K)
    tot -= jnp.sum(kl)
    tot -= jax.lax.stop_gradient(
        rho * model.likelihood.aug_kl(state.local_vars, y)
    )
    tot -= extra_kl(model, state, kmat)
    return tot


def extra_kl(model, state, kmat=None):
    """Online-model extra KL (zero otherwise); see models/online_svgp.py.

    `kmat` must be the same kernel matrices the rest of the ELBO uses so
    that hyperparameter gradients through the streaming extraKL term are
    consistent (the hyper step recomputes kmat with the candidate kernel;
    reading state.kmat here would mix the new gram with stale factors)."""
    if getattr(model, "is_online", False) and state.previous is not None:
        from ..models.online_svgp import online_extra_kl

        return online_extra_kl(model, state, kmat)
    return jnp.asarray(0.0, state.mu.dtype)
