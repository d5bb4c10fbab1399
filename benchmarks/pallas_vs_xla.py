"""Pallas-vs-XLA measurement for the sparse-CAVI hot path on real TPU.

Measures, per (B, M) shape:
  * xla_stats:    the production XLA path (gram -> kappa -> Ktilde ->
                  moments -> logistic E-step -> s1/S2 contractions)
  * pallas_stats: ops/pallas_kernels.fused_cavi_stats (one HBM pass)
  * xla_kappa / pallas_kappa: the (kappa, Ktilde) sub-chain alone

Writes PALLAS_BENCH.json.  Run on the real chip:  python benchmarks/pallas_vs_xla.py
(first compile over the axon tunnel is slow; results cached in .jax_cache).

CAVEAT: per-call dispatch over the axon tunnel adds a ~1-2 ms floor with
high run-to-run variance, so sub-~2 ms rows are dispatch-dominated and
noisy.  The authoritative fused-vs-XLA comparison is the scan-fused
production A/B (benchmarks/gate_ab.py -> GATE_AB.json), which amortizes
dispatch and reproduces to ~0.1% across runs; the auto gate is derived
from THAT, not from this file.
"""
from __future__ import annotations

import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
import json
import time

import jax
import jax.numpy as jnp


def _sync(out):
    """Host readback: on the axon remote backend jax.block_until_ready does
    NOT synchronize execution (RESULTS.md, round-2 measurement-discipline
    fix); reading one scalar back to the host does."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from agp_tpu.ops import pallas_kernels as pk

    print("backend:", jax.default_backend(), jax.devices()[0])
    rows = []
    key = jax.random.PRNGKey(0)

    HIGH = jax.lax.Precision.HIGH  # production _kappa_precision default

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
        gmu = y / 2.0
        gs = theta / 2.0
        s1 = kappa.T @ (rho * gmu)
        S2 = (kappa * (rho * gs)[:, None]).T @ kappa
        return s1, S2

    @jax.jit
    def xla_kappa(X, Z, Kinv, ls, var):
        x = X / ls
        z = Z / ls
        r2 = jnp.maximum(
            jnp.sum(x * x, 1)[:, None] + jnp.sum(z * z, 1)[None, :] - 2.0 * x @ z.T,
            0.0,
        )
        knm = var * jnp.exp(-0.5 * r2)
        kappa = jnp.dot(knm, Kinv, precision=HIGH)
        ktilde = jnp.maximum(var + 1e-4 - jnp.sum(kappa * knm, 1), 1e-12)
        return kappa, ktilde

    # includes the auto-gate break-even shapes quoted in
    # inference/analytic_vi.py::_pallas_kind/_pallas_kind_batched
    for B, M in [(4096, 64), (8192, 256), (8192, 512), (32768, 256),
                 (65536, 64), (65536, 256), (65536, 512), (262144, 128)]:
        D = 8
        X = jax.random.normal(key, (B, D), jnp.float32)
        y = jnp.where(jax.random.normal(jax.random.fold_in(key, 1), (B,)) > 0, 1.0, -1.0)
        Z = jax.random.normal(jax.random.fold_in(key, 2), (M, D), jnp.float32)
        ls = jnp.asarray(1.3)
        var = jnp.asarray(1.1)
        rho = jnp.asarray(4.0)
        zs = Z / ls
        Kzz = var * jnp.exp(
            -0.5 * jnp.maximum(
                jnp.sum(zs * zs, 1)[:, None] + jnp.sum(zs * zs, 1)[None, :]
                - 2.0 * zs @ zs.T, 0.0)
        ) + 1e-3 * jnp.eye(M)
        L = jnp.linalg.cholesky(Kzz)
        Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(M), lower=True)
        Kinv = Linv.T @ Linv
        mu = jax.random.normal(jax.random.fold_in(key, 4), (M,))
        Sigma = jnp.eye(M, dtype=jnp.float32)

        t_x = timeit(xla_stats, X, y, Z, Kinv, mu, Sigma, ls, var, rho)

        def pallas_stats():
            s1, S2, c, th, mf, vf = pk.fused_cavi_stats(
                X, y, Z, Linv.T, mu, Sigma, ls, var, 1e-4, rho,
                kind="rbf", lik="logistic",
            )
            return s1, S2, c, th

        t_p = timeit(pallas_stats)
        t_xk = timeit(xla_kappa, X, Z, Kinv, ls, var)
        t_pk = timeit(lambda: pk.fused_kappa(X, Z, Linv.T, ls, var, 1e-4, kind="rbf"))

        # numerical agreement
        s1x, S2x = xla_stats(X, y, Z, Kinv, mu, Sigma, ls, var, rho)
        s1p, S2p, _, _ = pallas_stats()
        import numpy as np

        err = float(
            jnp.max(jnp.abs(s1x - s1p)) / (jnp.max(jnp.abs(s1x)) + 1e-12)
        )
        err2 = float(
            jnp.max(jnp.abs(S2x - S2p)) / (jnp.max(jnp.abs(S2x)) + 1e-12)
        )
        row = dict(
            B=B, M=M,
            xla_stats_ms=t_x * 1e3, pallas_stats_ms=t_p * 1e3,
            stats_speedup=t_x / t_p,
            xla_kappa_ms=t_xk * 1e3, pallas_kappa_ms=t_pk * 1e3,
            kappa_speedup=t_xk / t_pk,
            rel_err_s1=err, rel_err_S2=err2,
        )
        rows.append(row)
        print(
            f"B={B:6d} M={M:3d}  stats xla {t_x*1e3:7.3f}ms pallas {t_p*1e3:7.3f}ms "
            f"({t_x/t_p:4.2f}x)   kappa xla {t_xk*1e3:7.3f}ms pallas {t_pk*1e3:7.3f}ms "
            f"({t_xk/t_pk:4.2f}x)  err {err:.1e}/{err2:.1e}"
        )

    with open("PALLAS_BENCH.json", "w") as fh:
        json.dump(
            {
                "backend": jax.default_backend(),
                "caveat": (
                    "per-call timings below ~2 ms are DISPATCH-DOMINATED in "
                    "this tunneled axon environment -- do NOT derive "
                    "production gates from rows whose *_ms < 2.0; the "
                    "authoritative end-to-end gating measurements are "
                    "GATE_AB.json (host-readback production A/B over full "
                    "scans)"
                ),
                "rows": rows,
            },
            fh,
            indent=1,
        )


if __name__ == "__main__":
    main()
