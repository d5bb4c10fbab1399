"""Benchmark: natural-gradient CAVI iterations/s/chip (SVGP M=64).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
speedup over a faithful single-core numpy/BLAS implementation of the same
CAVI iteration -- the closest stand-in for the reference's Julia/OpenBLAS
execution model, measured on this machine.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np


def build_workload(dtype, sampling="block"):
    """Flagship workload.  Default sampling is "block" (64-row block
    bootstrap): BOTH the statistically honest minibatching mode (tiles of
    pre-shuffled rows are iid 64-row samples; the round-1..4 headline's
    "slice" mode drew correlated contiguous windows) AND the fastest
    measured draw at this shape (40.4k vs slice 35.7k vs iid gather 13.6k
    iters/s -- GATHER_MODES.json round 5); slice is tracked in BENCH_EXTRA
    for cross-round continuity."""
    import jax
    import jax.numpy as jnp

    import agp_tpu as agp
    from agp_tpu.training.train import init_state

    N, D, M, B = 200_000, 20, 64, 4096
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    X = jax.random.normal(kx, (N, D), dtype=dtype)
    w = jax.random.normal(kw, (D,), dtype=dtype)
    y = jnp.where(X @ w > 0, 1.0, -1.0).astype(dtype)

    kern = agp.SqExponentialKernel(
        lengthscale=jnp.asarray(2.0, dtype), variance=jnp.asarray(1.0, dtype)
    )
    lik = agp.LogisticLikelihood.create()
    model = agp.SVGP.create(
        kern, lik, agp.AnalyticSVI(B, minibatch_sampling=sampling), X[:M],
        optimiser=None,
    )
    y2, tl = model.likelihood.treat_labels(y)
    model = model.replace(likelihood=tl)
    state = init_state(model, X, y2)
    return model, state, X, y2


def bench_jax(iters=8000, chunk=2000):
    import jax

    from agp_tpu.training.train import _vi_steps

    dtype = jax.numpy.float32
    model, state, X, y = build_workload(dtype)
    # TWO warmup calls: call 1 compiles; call 2 absorbs the weak->strong
    # dtype recompile that models with updating scalar leaves trigger.
    # Timing ends with a HOST READBACK: on the axon remote backend
    # block_until_ready does not synchronize remote execution.
    for _ in range(2):
        model, state = _vi_steps(model, state, X, y, chunk)
    float(jax.numpy.sum(state.mu))
    t0 = time.perf_counter()
    for _ in range(iters // chunk):
        model, state = _vi_steps(model, state, X, y, chunk)
    float(jax.numpy.sum(state.mu))
    dt = time.perf_counter() - t0
    assert bool(jax.numpy.all(jax.numpy.isfinite(state.mu))), "non-finite posterior"
    return iters / dt


def bench_numpy_baseline(iters=20):
    """Same CAVI iteration in single-thread-ish numpy/BLAS: the stand-in for
    the reference's per-iteration cost model (kernel matrices recomputed per
    minibatch, closed-form logistic E-step, natural-gradient update)."""
    rng = np.random.RandomState(0)
    N, D, M, B = 200_000, 20, 64, 4096
    X = rng.randn(N, D)
    w = rng.randn(D)
    y = np.where(X @ w > 0, 1.0, -1.0)
    Z = X[:M]
    ls, var = 2.0, 1.0

    def gram(A, C):
        d2 = (
            (A * A).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * A @ C.T
        ) / ls**2
        return var * np.exp(-0.5 * np.maximum(d2, 0))

    Kmm = gram(Z, Z) + 1e-4 * np.eye(M)
    Kinv = np.linalg.inv(Kmm)
    eta1 = np.zeros(M)
    eta2 = -0.5 * np.eye(M)
    mu = np.zeros(M)
    Sig = np.eye(M)
    rho = N / B
    lr = 0.05
    t0 = time.perf_counter()
    for it in range(iters):
        idx = rng.randint(0, N, B)
        xb, yb = X[idx], y[idx]
        Knm = gram(xb, Z)
        kap = Knm @ Kinv
        Ktl = var + 1e-4 - np.einsum("bm,bm->b", kap, Knm)
        mf = kap @ mu
        vf = Ktl + np.einsum("bm,mn,bn->b", kap, Sig, kap)
        c = np.sqrt(mf**2 + vf)
        th = np.tanh(c / 2) / (2 * c)
        g1 = kap.T @ (rho * yb / 2) + 0 - eta1
        g2 = -((rho * 0.5 * th)[:, None] * kap).T @ kap - 0.5 * Kinv - eta2
        eta1 = eta1 + lr * g1
        eta2 = eta2 + lr * g2
        Sig = np.linalg.inv(-2 * eta2)
        mu = Sig @ eta1
    return iters / (time.perf_counter() - t0)


def _bench_config(model, X, y, iters, chunk):
    import jax

    from agp_tpu.training.train import _vi_steps, init_state

    state = init_state(model, X, y)
    # two warmups (compile + weak->strong recompile) then host-readback
    # timing; see _bench-loop comment in bench_jax
    for _ in range(2):
        model, state = _vi_steps(model, state, X, y, chunk)
    float(jax.numpy.sum(state.mu))
    t0 = time.perf_counter()
    for _ in range(max(iters // chunk, 1)):
        model, state = _vi_steps(model, state, X, y, chunk)
    float(jax.numpy.sum(state.mu))
    dt = time.perf_counter() - t0
    assert bool(jax.numpy.all(jax.numpy.isfinite(state.mu)))
    return max(iters // chunk, 1) * chunk / dt


def bench_extra():
    """Secondary tracked configs (multiclass K=10, heteroscedastic 2-GP,
    large-M/large-B) -> BENCH_EXTRA.json, so round-over-round regressions
    in these regimes are visible from BENCH files alone."""
    import jax
    import jax.numpy as jnp

    import agp_tpu as agp

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    rows = {}

    # flagship shape with "slice" sampling (the round-1..4 headline mode):
    # tracked so the mode switch to "block" stays comparable across rounds.
    # CAVEAT: slice draws correlated contiguous windows -- an upper bound,
    # not an honest iid estimator; see GATHER_MODES.json.
    model_sl, _, X_f, y_f = build_workload(dtype, sampling="slice")
    rows["flagship_slice_iters_per_s"] = _bench_config(model_sl, X_f, y_f, 8000, 2000)

    # multiclass logistic-softmax, K = 10 latents
    N, D, M, B, K = 50_000, 10, 64, 2048, 10
    X = jax.random.normal(key, (N, D), dtype)
    logits = X @ jax.random.normal(jax.random.fold_in(key, 1), (D, K), dtype)
    y = jnp.argmax(logits, axis=1)
    m = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(2.0, dtype)),
        agp.LogisticSoftMaxLikelihood.create(K),
        agp.AnalyticSVI(B, minibatch_sampling="slice"),
        X[:M],
        optimiser=None,
    )
    y2, tl = m.likelihood.treat_labels(y)
    m = m.replace(likelihood=tl)
    rows["multiclass_k10_m64_b2048"] = _bench_config(m, X, y2.astype(dtype), 4000, 2000)

    # heteroscedastic two-GP regression
    N, D, M, B = 50_000, 10, 64, 2048
    X = jax.random.normal(jax.random.fold_in(key, 2), (N, D), dtype)
    yr = jnp.sin(X[:, 0]) + 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (N,), dtype)
    m = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(2.0, dtype)),
        agp.HeteroscedasticLikelihood.create(),
        agp.AnalyticSVI(B, minibatch_sampling="slice"),
        X[:M],
        optimiser=None,
    )
    y2, tl = m.likelihood.treat_labels(yr)
    m = m.replace(likelihood=tl)
    rows["heteroscedastic_m64_b2048"] = _bench_config(m, X, y2.astype(dtype), 4000, 2000)

    # large-M / large-B logistic (the MXU-bound regime)
    N, D, M, B = 500_000, 20, 512, 65_536
    X = jax.random.normal(jax.random.fold_in(key, 4), (N, D), dtype)
    w = jax.random.normal(jax.random.fold_in(key, 5), (D,), dtype)
    y = jnp.where(X @ w > 0, 1.0, -1.0).astype(dtype)
    m = agp.SVGP.create(
        agp.SqExponentialKernel(lengthscale=jnp.asarray(2.0, dtype)),
        agp.LogisticLikelihood.create(),
        agp.AnalyticSVI(B, minibatch_sampling="slice"),
        X[:M],
        optimiser=None,
    )
    y2, tl = m.likelihood.treat_labels(y)
    m = m.replace(likelihood=tl)
    v = _bench_config(m, X, y2.astype(dtype), 300, 50)
    rows["logistic_m512_b65536"] = v
    # data throughput in the large regime
    rows["logistic_m512_b65536_pts_per_s"] = v * B

    # exact augmented Gibbs (PSW Polya-Gamma draws + CG perturb-and-solve
    # global resample), MCGP + Logistic, N=2048, 4 chains
    import time as _time

    from agp_tpu.models.mcgp import sample as mc_sample

    N = 2048
    Xg = jax.random.normal(jax.random.fold_in(key, 6), (N, 8), dtype)
    yg = jnp.sign(Xg[:, 0] + 0.5 * Xg[:, 1])
    mg = agp.MCGP.create(
        Xg,
        yg,
        agp.SqExponentialKernel(lengthscale=jnp.asarray(2.0, dtype)),
        agp.LogisticLikelihood.create(),
        agp.GibbsSampling(n_burnin=50),
    )
    S, C = 400, 4
    for _ in range(2):  # compile + weak->strong warmups
        s = mc_sample(mg, S, key=jax.random.PRNGKey(1), n_chains=C)
    float(jnp.sum(s))
    t0 = _time.perf_counter()
    s = mc_sample(mg, S, key=jax.random.PRNGKey(2), n_chains=C)
    float(jnp.sum(s))
    dt = _time.perf_counter() - t0
    rows["gibbs_logistic_n2048_4chains_steps_per_s"] = (S + 50) * C / dt

    # streaming OnlineSVGP (fused one-dispatch batch: save-old -> OIPS
    # update_Z -> masked kmat -> 20 CAVI iters), Gaussian, B=256, cap=128
    Bo, ITERS = 256, 20
    Xo = jax.random.uniform(jax.random.fold_in(key, 7), (4096, 2), dtype) * 4 - 2
    fo = jnp.sin(2 * Xo[:, 0]) + 0.5 * Xo[:, 1]
    yo = fo + 0.05 * jax.random.normal(jax.random.fold_in(key, 8), fo.shape, dtype)

    def stream_once(m, s):
        for i in range(8):
            m, s = agp.online_train(
                m, Xo[i * Bo : (i + 1) * Bo], yo[i * Bo : (i + 1) * Bo],
                state=s, iterations=ITERS,
            )
        return m, s

    mo = agp.OnlineSVGP.create(
        agp.SqExponentialKernel(), agp.GaussianLikelihood.create(0.05, opt_noise=False),
        agp.AnalyticVI(), n_dim=2, capacity=128, optimiser=None,
    )
    mo, so = agp.online_train(mo, Xo[:Bo], yo[:Bo], iterations=ITERS)
    for _ in range(2):  # compile + cache warmups
        stream_once(mo, so)
    t0 = _time.perf_counter()
    m2, s2 = stream_once(mo, so)
    float(jnp.sum(s2.mu))
    dt = _time.perf_counter() - t0
    # CAVEAT: per-batch-dispatch path; on the tunneled axon backend this is
    # dispatch-latency-bound (measured 11-95 ms/batch across sessions vs
    # 3.7 ms of device work) -- see STREAMING.json for the attribution
    rows["online_stream_b256_cap128_pts_per_s"] = 8 * Bo / dt

    # scan-fused stream (one lax.scan device program over all batches):
    # the device-work streaming number, robust to tunnel latency
    Xs_st = Xo[: 8 * Bo].reshape(8, Bo, 2)
    ys_st = yo[: 8 * Bo].reshape(8, Bo)
    for _ in range(2):
        m3, s3 = agp.online_train_stream(mo, Xs_st[1:], ys_st[1:], state=so,
                                         iterations=ITERS)
    float(jnp.sum(s3.mu))
    t0 = _time.perf_counter()
    m3, s3 = agp.online_train_stream(mo, Xs_st[1:], ys_st[1:], state=so,
                                     iterations=ITERS)
    float(jnp.sum(s3.mu))
    dt = _time.perf_counter() - t0
    rows["online_stream_fused_b256_cap128_pts_per_s"] = 7 * Bo / dt
    return rows


def main():
    import jax

    value = bench_jax()
    try:
        base = bench_numpy_baseline()
    except Exception:
        base = float("nan")
    # primary line FIRST (the driver records stdout)
    print(
        json.dumps(
            {
                "metric": "cavi_iters_per_sec_svgp_m64_logistic_b4096",
                "value": round(value, 2),
                "unit": "iters/s/chip",
                "vs_baseline": round(value / base, 2) if base == base else None,
            }
        ),
        flush=True,
    )
    if os.environ.get("AGP_BENCH_EXTRA", "1") != "0":
        try:
            rows = bench_extra()
            rows = {k: round(v, 2) for k, v in rows.items()}
            rows["backend"] = jax.default_backend()
            rows["primary_iters_per_s"] = round(value, 2)
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "BENCH_EXTRA.json"), "w") as fh:
                json.dump(rows, fh, indent=1)
        except Exception as e:  # extras must never break the primary metric
            import traceback

            traceback.print_exc()


if __name__ == "__main__":
    main()
