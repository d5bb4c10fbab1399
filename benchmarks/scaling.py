"""Data-parallel scaling measurement for the sharded CAVI step.

Strong scaling: fixed global batch, growing device count; reports step time
and parallel efficiency, and writes a machine-readable table in the
BASELINE.json metric format (nat-grad CAVI iters/s/chip at 1 chip / 1 host
/ N hosts, >=80% efficiency target).

Single host (real chips or virtual CPU devices):
    python benchmarks/scaling.py --cpu --global-batch 65536

Multi-host (run the SAME command on every host; rows are written by
process 0 with hosts = process_count):
    python benchmarks/scaling.py --coordinator host0:1234 \
        --num-processes 2 --process-id $RANK
"""
from __future__ import annotations

import argparse
import json
import time


def measure(step, model_r, state_r, Xs, ys, steps):
    import jax

    model_r, state_r = step(model_r, state_r, Xs, ys)  # compile
    jax.block_until_ready(state_r.mu)
    t0 = time.perf_counter()
    for _ in range(steps):
        model_r, state_r = step(model_r, state_r, Xs, ys)
    jax.block_until_ready(state_r.mu)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--global-batch", type=int, default=65536)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--d", type=int, default=20)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--coordinator", default=None, help="host:port for multi-host")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator is not None:
        from agp_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import agp_tpu as agp
    from agp_tpu.parallel.mesh import data_parallel_step, make_mesh, replicate, shard_batch
    from agp_tpu.training.train import init_state

    multihost = jax.process_count() > 1
    if jax.default_backend() == "cpu" and jax.process_count() == 1:
        print(
            "NOTE: virtual CPU devices share one physical CPU -- this mode "
            "validates the sharded program + collectives, not efficiency; "
            "run on a real multi-chip slice for scaling numbers."
        )
    n_avail = len(jax.devices())
    if multihost:
        counts = [n_avail]  # the global mesh; per-count sweeps are single-host
    else:
        counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_avail]
    B, M, D = args.global_batch, args.m, args.d
    rng = np.random.default_rng(0)
    X = rng.standard_normal((B, D)).astype(np.float32)
    w = rng.standard_normal(D).astype(np.float32)
    y = np.where(X @ w > 0, 1.0, -1.0).astype(np.float32)

    rows = []
    base_t = None
    for c in counts:
        mesh = make_mesh(None if multihost else c)
        n_dev = mesh.devices.size
        model = agp.SVGP.create(
            agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
            agp.AnalyticVI(), jnp.asarray(X[:M]), optimiser=None,
        )
        y2, tl = model.likelihood.treat_labels(y)
        model = model.replace(likelihood=tl)
        y2 = np.asarray(y2, np.float32)
        if multihost:
            def globalize(arr, spec):
                return jax.make_array_from_callback(
                    arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
                )

            Xs = globalize(X, P("data", None))
            ys = globalize(y2, P("data"))
            state = init_state(model, jnp.asarray(X), jnp.asarray(y2))
            model_r, state_r = jax.tree_util.tree_map(
                lambda x: globalize(np.asarray(x), P()), (model, state)
            )
        else:
            Xs, ys = shard_batch(mesh, X, y2)
            state = init_state(model, Xs, ys)
            model_r, state_r = replicate(mesh, (model, state))
        step = data_parallel_step(mesh)
        dt = measure(step, model_r, state_r, Xs, ys, args.steps)
        if base_t is None:
            base_t = dt * n_dev if multihost else dt
        speedup = base_t / dt
        eff = speedup / n_dev * 100.0
        row = {
            "devices": int(n_dev),
            "hosts": int(jax.process_count()),
            "step_ms": dt * 1e3,
            "iters_per_s": 1.0 / dt,
            "iters_per_s_per_chip": 1.0 / dt / n_dev,
            "efficiency_pct": eff,
        }
        rows.append(row)
        if jax.process_index() == 0:
            print(
                f"devices={n_dev:3d} hosts={jax.process_count()}  step={dt*1e3:8.3f} ms  "
                f"speedup={speedup:5.2f}x  efficiency={eff:5.1f}%"
            )

    if jax.process_index() == 0:
        out = {
            "metric": "nat-grad CAVI iters/s/chip (SVGP M=%d, global B=%d) scaling"
            % (M, B),
            "target_efficiency_pct": 80.0,
            "backend": jax.default_backend(),
            "rows": rows,
        }
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({"scaling_rows": len(rows), "out": args.out}))


if __name__ == "__main__":
    main()
