"""Data-parallel scaling measurement for the sharded CAVI step.

Strong scaling: fixed global batch, growing device count; reports step time
and parallel efficiency.  On real multi-chip TPU hardware run as-is; on a
single-chip/dev box use --cpu to measure over the 8 virtual CPU devices
(mechanics + collective overhead only -- not TPU bandwidth numbers).

python benchmarks/scaling.py --cpu --global-batch 65536
"""
from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--global-batch", type=int, default=65536)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--d", type=int, default=20)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import agp_tpu as agp
    from agp_tpu.parallel.mesh import data_parallel_step, make_mesh, replicate, shard_batch
    from agp_tpu.training.train import init_state

    if jax.default_backend() == "cpu":
        print(
            "NOTE: virtual CPU devices share one physical CPU -- this mode "
            "validates the sharded program + collectives, not efficiency; "
            "run on a real multi-chip slice for scaling numbers."
        )
    n_avail = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_avail]
    B, M, D = args.global_batch, args.m, args.d
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, D), dtype=jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (D,), dtype=jnp.float32)
    y = jnp.where(X @ w > 0, 1.0, -1.0)

    base_t = None
    for c in counts:
        mesh = make_mesh(c)
        model = agp.SVGP.create(
            agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
            agp.AnalyticVI(), X[:M], optimiser=None,
        )
        y2, tl = model.likelihood.treat_labels(y)
        model = model.replace(likelihood=tl)
        Xs, ys = shard_batch(mesh, X, y2)
        state = init_state(model, Xs, ys)
        model_r, state_r = replicate(mesh, (model, state))
        step = data_parallel_step(mesh)
        model_r, state_r = step(model_r, state_r, Xs, ys)  # compile
        jax.block_until_ready(state_r.mu)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            model_r, state_r = step(model_r, state_r, Xs, ys)
        jax.block_until_ready(state_r.mu)
        dt = (time.perf_counter() - t0) / args.steps
        if base_t is None:
            base_t = dt
        eff = base_t / (dt * 1)  # strong scaling: ideal time is constant/c
        speedup = base_t / dt
        print(
            f"devices={c:3d}  step={dt*1e3:8.3f} ms  speedup={speedup:5.2f}x  "
            f"efficiency={speedup / c * 100:5.1f}%"
        )


if __name__ == "__main__":
    main()
