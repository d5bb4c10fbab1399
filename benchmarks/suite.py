"""Phase-timed benchmark suite mirroring the reference's BenchmarkTools
harness (/root/reference/benchmark/models.jl:21-57): times the 7 phases

  init | elbo | computematrices | updatevariational | updatehyperparam |
  predict | predictproba

over (model x likelihood x inference) on the reference workload
N=3000, D=20, M=50, batch=50.  Run: python benchmarks/suite.py [--cpu]
"""
from __future__ import annotations

import argparse
import json
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import agp_tpu as agp
    from agp_tpu.inference.analytic_vi import compute_kmat, variational_update
    from agp_tpu.training.autotuning import hyper_step
    from agp_tpu.training.train import init_state

    N, D, M, B = args.n, 20, 50, 50
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (N, D))
    w = jax.random.normal(jax.random.PRNGKey(1), (D,))
    f = X @ w / np.sqrt(D)
    data = {
        "Gaussian": (agp.GaussianLikelihood.create(0.1), np.asarray(f)),
        "StudentT": (agp.StudentTLikelihood.create(3.0), np.asarray(f)),
        "Logistic": (agp.LogisticLikelihood.create(), np.sign(np.asarray(f))),
        "BayesianSVM": (agp.BayesianSVM.create(), np.sign(np.asarray(f))),
        "LogisticSoftMax": (
            agp.LogisticSoftMaxLikelihood.create(3),
            np.digitize(np.asarray(f), [-0.5, 0.5]),
        ),
    }
    results = {}
    for lik_name, (lik, y) in data.items():
        for inf_name, inf in (
            ("AnalyticVI", agp.AnalyticVI()),
            ("AnalyticSVI", agp.AnalyticSVI(B)),
        ):
            if inf.name not in type(lik).implemented():
                continue
            tag = f"SVGP-{lik_name}-{inf_name}"
            times = {}

            def timed(name, fn, *a, reps=args.reps, **kw):
                out = fn(*a, **kw)  # compile
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn(*a, **kw)
                jax.block_until_ready(out)
                times[name] = (time.perf_counter() - t0) / reps * 1e3
                return out

            t0 = time.perf_counter()
            model = agp.SVGP.create(agp.SqExponentialKernel(), lik, inf, X[:M])
            y2, tl = model.likelihood.treat_labels(y)
            model = model.replace(likelihood=tl)
            state = init_state(model, X, y2)
            times["init"] = (time.perf_counter() - t0) * 1e3

            xb, yb = (X[:B], y2[:B]) if inf.stochastic else (X, y2)
            step = jax.jit(variational_update)
            timed("updatevariational", lambda: step(model, state, xb, yb))
            timed("computematrices", jax.jit(compute_kmat), model, X)
            elbo_fn = jax.jit(lambda m, s: __import__("agp_tpu").elbo(m, s, xb, yb))
            timed("elbo", elbo_fn, model, state)
            hstep = jax.jit(hyper_step)
            timed("updatehyperparam", lambda: hstep(model, state, xb, yb))
            timed("predict", lambda: agp.predict_f(model, state, X[:500]))
            timed("predictproba", lambda: agp.proba_y(model, state, X[:500]))
            results[tag] = {k: round(v, 3) for k, v in times.items()}
            print(tag, json.dumps(results[tag]))
    print(json.dumps({"workload": {"N": N, "D": D, "M": M, "batch": B}, "unit": "ms", "results": results}))


if __name__ == "__main__":
    main()
