"""Kernel-design sweep for the fused CAVI tier on the real chip.

The round-4 kappa-basis kernels are CORRECT on hardware (23/23 acceptance)
but the fresh PALLAS_BENCH shows they are now SLOWER than the XLA path at
every shape (0.22x-0.87x): the two-factor kappa = (Knm L^-T) L^-1 pays two
3-pass [B,M]@[M,M] dots where XLA's direct Knm K^-1 (HIGH) pays one.

This script measures candidate redesigns per (B, M) shape on the chip:

  v0_two_factor  -- the committed kernel (fused_cavi_stats)
  v1_direct      -- kappa = _dot3(knm, Kinv) in one 3-pass dot (exactly the
                    XLA twin's precision: HIGH kappa + DEFAULT stats),
                    ktilde = var + jitt - sum(kappa*knm) like the XLA path;
                    5 MXU passes vs v0's 8
  v2_direct_nt   -- v1 + no-transpose S2 (dot_general contracting dim 0 of
                    both operands instead of an explicit in-kernel .T)
  v3_direct_packed - v2 + mf folded into the kS dot ([Sigma | mu] packed
                    operand, one DEFAULT dot instead of dot + 3-pass matvec)
  tile_b in {512, 1024} for the winner

plus the XLA production-equivalent stats chain as the bar.  Writes
FUSED_VARIANTS.json.  Run: python benchmarks/fused_variants.py
"""
from __future__ import annotations

import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
import functools
import json
import time

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agp_tpu.ops.pallas_kernels import (
    _dot1,
    _dot3,
    _gram,
    _round_up,
    fused_cavi_stats,
)


def _kappa_tile_two_factor(x, z, linvt, var, jitt, kind):
    """The round-4a two-factor form (W = Knm L^-T, kappa = W L^-1), kept
    here for the historical A/B after the production `_kappa_tile` moved to
    the direct Knm K^-1 form this sweep selected."""
    knm = _gram(x, z, var, kind)
    w = _dot3(knm, linvt)
    ktilde = jnp.maximum(
        var + jitt - jnp.sum(w * w, axis=1, keepdims=True), 1e-12
    )
    kappa = _dot3(w, linvt, dims=(((1,), (1,)), ((), ())))
    return kappa, ktilde


def _sync(out):
    """Host readback: on the axon remote backend jax.block_until_ready does
    NOT synchronize execution (RESULTS.md, round-2 measurement-discipline
    fix); reading one scalar back to the host does."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


# --------------------------------------------------------------- variants
def _estep_logistic(mf, vf, yb):
    c = jnp.sqrt(mf * mf + vf)
    theta = jnp.tanh(c / 2.0) / (2.0 * c)
    return c, theta, yb / 2.0, theta / 2.0


def _v1_kernel(x_ref, y_ref, z_ref, kinv_ref, mu_ref, sigma_ref, params_ref,
               s1_ref, s2_ref, c_ref, theta_ref, mf_ref, vf_ref, *, variant):
    i = pl.program_id(0)
    ls, var, jitt, rho = (params_ref[0], params_ref[1], params_ref[2], params_ref[3])
    knm = _gram(x_ref[:] / ls, z_ref[:] / ls, var, "rbf")
    kappa = _dot3(knm, kinv_ref[:])
    ktilde = jnp.maximum(
        var + jitt - jnp.sum(kappa * knm, axis=1, keepdims=True), 1e-12
    )
    if variant == "packed":
        # sigma_ref is [M, M+128] = [Sigma | mu 0...]; one DEFAULT dot gives
        # kS (first M cols) and mf (col M)
        kSm = _dot1(kappa, sigma_ref[:])
        kS = kSm[:, : kappa.shape[1]]
        mf = kSm[:, kappa.shape[1]:kappa.shape[1] + 1]
    else:
        mf = _dot3(kappa, mu_ref[:])
        kS = _dot1(kappa, sigma_ref[:])
    vf = jnp.maximum(ktilde + jnp.sum(kS * kappa, axis=1, keepdims=True), 1e-12)
    c, theta, gmu, gs = _estep_logistic(mf, vf, y_ref[:])
    c_ref[:] = c
    theta_ref[:] = theta
    mf_ref[:] = mf
    vf_ref[:] = vf

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += jnp.sum(kappa * (rho * gmu), axis=0, keepdims=True)
    kg = kappa * (rho * gs)
    if variant == "transpose":
        s2_ref[:] += _dot1(kg.T, kappa)
    else:  # no-transpose: contract dim 0 of both operands
        s2_ref[:] += jax.lax.dot_general(
            kg, kappa, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("variant", "tile_b"))
def direct_stats(xb, yb, Z, L_invT, mu, Sigma, ls, var, jitt, rho,
                 variant="nt", tile_b=1024):
    B, D = xb.shape
    M = Z.shape[0]
    Bp = _round_up(B, tile_b)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
        yb = jnp.pad(yb, (0, Bp - B))
    kinv = jnp.dot(L_invT, L_invT.T, precision=jax.lax.Precision.HIGHEST)
    if variant == "packed":
        sig_in = jnp.concatenate(
            [Sigma, mu[:, None], jnp.zeros((M, 127), jnp.float32)], axis=1
        )
        sig_spec = pl.BlockSpec((M, M + 128), lambda i: (0, 0))
    else:
        sig_in = Sigma
        sig_spec = pl.BlockSpec((M, M), lambda i: (0, 0))
    params = jnp.stack([jnp.asarray(v, jnp.float32).reshape(())
                        for v in (ls, var, jitt, rho)])
    outs = pl.pallas_call(
        functools.partial(_v1_kernel, variant=variant),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec((M, 1), lambda i: (0, 0)),
            sig_spec,
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
    )(xb, yb[:, None], Z, kinv, mu[:, None], sig_in, params)
    s1, s2, c, th, mf, vf = outs
    return s1[0], s2, c[:B, 0], th[:B, 0], mf[:B, 0], vf[:B, 0]


# two-factor with no-transpose S2 + DEFAULT mf (keep accuracy, shave passes)
def _v5_kernel(x_ref, y_ref, z_ref, linvt_ref, mu_ref, sigma_ref, params_ref,
               s1_ref, s2_ref, c_ref, theta_ref, mf_ref, vf_ref):
    i = pl.program_id(0)
    ls, var, jitt, rho = (params_ref[0], params_ref[1], params_ref[2], params_ref[3])
    kappa, ktilde = _kappa_tile_two_factor(
        x_ref[:] / ls, z_ref[:] / ls, linvt_ref[:], var, jitt, "rbf"
    )
    mf = _dot3(kappa, mu_ref[:])
    kS = _dot1(kappa, sigma_ref[:])
    vf = jnp.maximum(ktilde + jnp.sum(kS * kappa, axis=1, keepdims=True), 1e-12)
    c, theta, gmu, gs = _estep_logistic(mf, vf, y_ref[:])
    c_ref[:] = c
    theta_ref[:] = theta
    mf_ref[:] = mf
    vf_ref[:] = vf

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += jnp.sum(kappa * (rho * gmu), axis=0, keepdims=True)
    s2_ref[:] += jax.lax.dot_general(
        kappa * (rho * gs), kappa, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("tile_b",))
def two_factor_nt(xb, yb, Z, L_invT, mu, Sigma, ls, var, jitt, rho, tile_b=1024):
    B, D = xb.shape
    M = Z.shape[0]
    Bp = _round_up(B, tile_b)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
        yb = jnp.pad(yb, (0, Bp - B))
    params = jnp.stack([jnp.asarray(v, jnp.float32).reshape(())
                        for v in (ls, var, jitt, rho)])
    outs = pl.pallas_call(
        _v5_kernel,
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0)),
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
    )(xb, yb[:, None], Z, L_invT, mu[:, None], Sigma, params)
    s1, s2, c, th, mf, vf = outs
    return s1[0], s2, c[:B, 0], th[:B, 0], mf[:B, 0], vf[:B, 0]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    HIGH = jax.lax.Precision.HIGH
    key = jax.random.PRNGKey(0)
    rows = []

    @jax.jit
    def xla_stats(X, y, Z, Kinv, mu, Sigma, ls, var, rho):
        x = X / ls
        z = Z / ls
        r2 = jnp.maximum(
            jnp.sum(x * x, 1)[:, None] + jnp.sum(z * z, 1)[None, :] - 2.0 * x @ z.T,
            0.0,
        )
        knm = var * jnp.exp(-0.5 * r2)
        kappa = jnp.dot(knm, Kinv, precision=HIGH)
        ktilde = jnp.maximum(var + 1e-4 - jnp.sum(kappa * knm, 1), 1e-12)
        mf = kappa @ mu
        vf = ktilde + jnp.sum((kappa @ Sigma) * kappa, 1)
        c = jnp.sqrt(mf * mf + vf)
        theta = jnp.tanh(c / 2.0) / (2.0 * c)
        s1 = kappa.T @ (rho * (y / 2.0))
        S2 = (kappa * (rho * theta / 2.0)[:, None]).T @ kappa
        return s1, S2

    for B, M in [(8192, 512), (65536, 256), (65536, 512), (262144, 128)]:
        D = 8
        X = jax.random.normal(key, (B, D), jnp.float32)
        y = jnp.where(jax.random.normal(jax.random.fold_in(key, 1), (B,)) > 0, 1.0, -1.0)
        Z = jax.random.normal(jax.random.fold_in(key, 2), (M, D), jnp.float32)
        ls = jnp.asarray(1.3)
        var = jnp.asarray(1.1)
        rho = jnp.asarray(4.0)
        jitt = 1e-4
        zs = Z / ls
        Kzz = var * jnp.exp(
            -0.5 * jnp.maximum(
                jnp.sum(zs * zs, 1)[:, None] + jnp.sum(zs * zs, 1)[None, :]
                - 2.0 * zs @ zs.T, 0.0)
        ) + 1e-3 * jnp.eye(M)
        L = jnp.linalg.cholesky(Kzz)
        Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(M), lower=True)
        LinvT = Linv.T
        Kinv = Linv.T @ Linv
        mu = jax.random.normal(jax.random.fold_in(key, 4), (M,))
        Sigma = jnp.eye(M, dtype=jnp.float32)

        t_xla = timeit(lambda: xla_stats(X, y, Z, Kinv, mu, Sigma, ls, var, rho))
        t_v0 = timeit(lambda: fused_cavi_stats(
            X, y, Z, LinvT, mu, Sigma, ls, var, jitt, rho, kind="rbf", lik="logistic"))
        cands = {
            "v1_direct_t1024": ("transpose", 1024, direct_stats),
            "v2_direct_nt1024": ("nt", 1024, direct_stats),
            "v2_direct_nt512": ("nt", 512, direct_stats),
            "v3_direct_packed1024": ("packed", 1024, direct_stats),
            "v5_twofactor_nt1024": (None, 1024, two_factor_nt),
        }
        row = dict(B=B, M=M, xla_ms=t_xla * 1e3, v0_two_factor_ms=t_v0 * 1e3)
        s1x, S2x = xla_stats(X, y, Z, Kinv, mu, Sigma, ls, var, rho)
        for name, (variant, tb, fn) in cands.items():
            try:
                if fn is direct_stats:
                    call = lambda: fn(X, y, Z, LinvT, mu, Sigma, ls, var, jitt, rho,
                                      variant=variant, tile_b=tb)
                else:
                    call = lambda: fn(X, y, Z, LinvT, mu, Sigma, ls, var, jitt, rho,
                                      tile_b=tb)
                t = timeit(call)
                s1p, S2p = call()[:2]
                err = float(jnp.max(jnp.abs(s1p - s1x)) / (jnp.max(jnp.abs(s1x)) + 1e-12))
                err2 = float(jnp.max(jnp.abs(S2p - S2x)) / (jnp.max(jnp.abs(S2x)) + 1e-12))
                row[name + "_ms"] = t * 1e3
                row[name + "_err"] = max(err, err2)
            except Exception as e:  # noqa: BLE001 - lowering failures are data
                row[name + "_ms"] = None
                row[name + "_err"] = repr(e)[:120]
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("FUSED_VARIANTS.json", "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": rows}, fh, indent=1)


if __name__ == "__main__":
    main()
