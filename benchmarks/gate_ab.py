"""Production-path A/B for the fused-tier auto gate: full CAVI training
steps (agp.train scan fast path) with the Pallas tier forced ON vs OFF,
host-readback timing, on the real chip.

The microbench (pallas_vs_xla.py / fused_variants.py) compares hand-inlined
stat chains; the gate must be derived from what users actually run --
variational_update end-to-end, including the latent-axis einsum machinery,
nat-grad update and moment recovery.  Writes GATE_AB.json.
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
import numpy as np

import agp_tpu as agp
from agp_tpu.inference.analytic_vi import pallas_override
from agp_tpu.training.train import _vi_steps, init_state


def run(mode, model, state, X, y, iters, chunk):
    # pallas_override is TRACE-time state and not part of the jit cache key:
    # without this, the "on" run silently reuses the "off" compilation (the
    # first version of this script measured exactly 1.00x everywhere).
    jax.clear_caches()
    with pallas_override(mode):
        m, s = model, state
        for _ in range(2):  # compile + weak->strong recompile absorb
            m, s = _vi_steps(m, s, X, y, chunk)
        float(jnp.sum(s.mu))
        t0 = time.perf_counter()
        for _ in range(iters // chunk):
            m, s = _vi_steps(m, s, X, y, chunk)
        float(jnp.sum(s.mu))
        dt = time.perf_counter() - t0
        assert bool(jnp.all(jnp.isfinite(s.mu)))
    return iters / dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rows = []
    import sys

    configs = [
        ("logistic", 512, 65536, 600, 200),
        ("logistic", 512, 32768, 1200, 400),
        ("logistic", 512, 8192, 2000, 500),
        ("logistic", 256, 65536, 600, 200),
        ("logistic", 256, 32768, 1200, 400),
        ("logistic", 256, 8192, 2000, 500),
        ("logistic", 128, 32768, 1200, 400),
        ("logistic", 64, 4096, 8000, 2000),
        ("studentt", 512, 65536, 600, 200),
        ("multiclass", 512, 8192, 1200, 400),
        ("multiclass", 512, 32768, 600, 200),
        # small-M multiclass rows exercise the FULLY-fused megakernel
        # (fused_cavi_stats_multiclass; K=3, K*M <= 2560) -- the two-kernel
        # batched tier applies at M=512 only
        ("multiclass", 64, 4096, 4000, 2000),
        ("multiclass", 256, 32768, 1200, 400),
        # heteroscedastic megakernel rows (fused_cavi_stats_het, M <= 256)
        ("hetero", 64, 2048, 4000, 2000),
        ("hetero", 256, 8192, 2000, 500),
    ]
    # argv filter, e.g. `gate_ab.py logistic:512:32768` runs one config
    if len(sys.argv) > 1:
        want = {tuple(a.split(":")) for a in sys.argv[1:]}
        configs = [c for c in configs if (c[0], str(c[1]), str(c[2])) in want]
    for lik_name, M, B, iters, chunk in configs:
        N, D = max(B * 3, 100_000), 8
        key = jax.random.PRNGKey(0)
        X = jax.random.normal(key, (N, D), jnp.float32)
        f = jnp.sin(2 * X[:, 0]) + 0.5 * X[:, 1]
        if lik_name == "logistic":
            y = np.asarray(jnp.sign(f))
            lik = agp.LogisticLikelihood.create()
        elif lik_name == "studentt":
            y = np.asarray(f + 0.1 * jax.random.t(jax.random.PRNGKey(1), 4.0, f.shape))
            lik = agp.StudentTLikelihood.create(4.0)
        elif lik_name == "hetero":
            y = np.asarray(
                f + 0.1 * jax.random.normal(jax.random.PRNGKey(1), f.shape)
            )
            lik = agp.HeteroscedasticLikelihood.create()
        else:
            y = np.asarray((f > 0.5).astype(np.int32) + (f > -0.5).astype(np.int32))
            lik = agp.LogisticSoftMaxLikelihood.create(3)
        model = agp.SVGP.create(
            agp.SqExponentialKernel(), lik,
            agp.AnalyticSVI(B, minibatch_sampling="slice"), Z=X[:M], optimiser=None,
        )
        y2, tl = model.likelihood.treat_labels(y)
        model = model.replace(likelihood=tl)
        state = init_state(model, X, y2)

        r_off = run("off", model, state, X, y2, iters, chunk)
        r_on = run("on", model, state, X, y2, iters, chunk)
        row = dict(lik=lik_name, M=M, B=B, xla_iters_s=r_off,
                   pallas_iters_s=r_on, speedup=r_on / r_off)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out_rows = rows
    if len(sys.argv) > 1:
        # filtered re-measurement: MERGE into the existing artifact (replace
        # matching rows) instead of clobbering the full sweep
        try:
            with open("GATE_AB.json") as fh:
                old = json.load(fh)["rows"]
        except Exception:
            old = []
        keyed = {(r["lik"], r["M"], r["B"]): r for r in old}
        for r in rows:
            keyed[(r["lik"], r["M"], r["B"])] = r
        out_rows = list(keyed.values())
    with open("GATE_AB.json", "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": out_rows}, fh, indent=1)


if __name__ == "__main__":
    main()
