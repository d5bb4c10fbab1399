"""Minibatch-sampling mode microbenchmark on the real chip (VERDICT r3
Weak #6 / round-2 ask #5: the iid-gather mode pays ~2.2x vs slice at the
flagship shape).

Times the FULL jitted CAVI scan (200 steps) at the flagship shape for:
  slice    -- contiguous window at a random offset (dynamic-slice)
  gather   -- iid row gather (jnp.take of B random rows)
  block8   -- gather of B/8 random ALIGNED 8-row tiles: same HBM bytes in
              8x fewer, 8x larger transactions; statistically a block
              bootstrap (rows pre-shuffled once => tiles are iid samples
              of 8 exchangeable rows)
  reshuffle -- slice + a full on-device permutation of (X, y) every epoch,
              amortized over N/B steps: exact iid minibatches at slice cost
              plus the amortized shuffle

plus the raw sampling ops alone (no CAVI) to separate sampling cost from
step cost.  Writes GATHER_MODES.json.
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


def timeit(fn, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import agp_tpu as agp
    from agp_tpu.inference.analytic_vi import variational_update
    from agp_tpu.training.train import init_state

    print("backend:", jax.default_backend(), flush=True)
    N, D, M, B, STEPS = 1_000_000, 8, 64, 256, 200
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (N, D), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (D,), jnp.float32)
    y = jnp.where(X @ w > 0, 1.0, -1.0)

    model = agp.SVGP.create(
        agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
        agp.AnalyticSVI(B), Z=X[:M], optimiser=None,
    )
    y2, lik = model.likelihood.treat_labels(jax.device_get(y))
    model = model.replace(likelihood=lik)
    y2 = jnp.asarray(y2, jnp.float32)
    state0 = init_state(model, X, y2)

    def draw(mode, k, Xa, ya, step):
        sub = jax.random.fold_in(k, step)
        if mode == "slice":
            start = jax.random.randint(sub, (), 0, N - B + 1)
            return (jax.lax.dynamic_slice_in_dim(Xa, start, B, 0),
                    jax.lax.dynamic_slice_in_dim(ya, start, B, 0))
        if mode == "gather":
            idx = jax.random.randint(sub, (B,), 0, N)
            return jnp.take(Xa, idx, axis=0), jnp.take(ya, idx, axis=0)
        if mode == "block8":
            tidx = jax.random.randint(sub, (B // 8,), 0, N // 8)
            xt = jnp.take(Xa.reshape(N // 8, 8, D), tidx, axis=0).reshape(B, D)
            yt = jnp.take(ya.reshape(N // 8, 8), tidx, axis=0).reshape(B)
            return xt, yt
        raise ValueError(mode)

    def make_scan(mode):
        @jax.jit
        def scan(model, state, Xa, ya):
            def body(carry, _):
                m, s = carry
                xb, yb = draw(mode, s.key, Xa, ya, s.step)
                m, s = variational_update(m, s, xb, yb)
                return (m, s.replace(step=s.step + 1)), None

            (model2, state2), _ = jax.lax.scan(body, (model, state), None, length=STEPS)
            return state2.mu

        return scan

    rows = {}
    for mode in ("slice", "gather", "block8"):
        scan = make_scan(mode)
        t = timeit(lambda: scan(model, state0, X, y2))
        rows[mode] = {"steps_per_s": STEPS / t, "ms_per_step": t / STEPS * 1e3}
        print(f"{mode:9s}: {STEPS/t:10.0f} iters/s  ({t/STEPS*1e6:.1f} us/step)", flush=True)

    # reshuffle: slice scans + one full permutation every epoch (N/B steps)
    @jax.jit
    def reshuffle(k, Xa, ya):
        perm = jax.random.permutation(k, N)
        return jnp.take(Xa, perm, axis=0), jnp.take(ya, perm, axis=0)

    t_shuf = timeit(lambda: reshuffle(jax.random.PRNGKey(2), X, y2))
    slice_t = 1e-3 * rows["slice"]["ms_per_step"]
    amort = t_shuf / (N // B)
    rows["reshuffle"] = {
        "steps_per_s": 1.0 / (slice_t + amort),
        "ms_per_step": (slice_t + amort) * 1e3,
        "full_shuffle_ms": t_shuf * 1e3,
    }
    print(f"reshuffle: {rows['reshuffle']['steps_per_s']:10.0f} iters/s  "
          f"(slice + {amort*1e6:.2f} us amortized shuffle; full shuffle "
          f"{t_shuf*1e3:.1f} ms per {N//B} steps)", flush=True)

    # raw sampling op cost (isolate from the CAVI step)
    for mode in ("slice", "gather", "block8"):
        @jax.jit
        def raw(k, Xa, ya, mode=mode):
            def body(carry, i):
                xb, yb = draw(mode, k, Xa, ya, i)
                return carry + jnp.sum(xb[0]) + yb[0], None

            out, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
            return out

        t = timeit(lambda: raw(jax.random.PRNGKey(3), X, y2))
        rows[f"raw_{mode}"] = {"us_per_draw": t / STEPS * 1e6}
        print(f"raw {mode:9s}: {t/STEPS*1e6:8.2f} us/draw", flush=True)

    with open("GATHER_MODES.json", "w") as fh:
        json.dump({"backend": jax.default_backend(),
                   "shape": {"N": N, "D": D, "M": M, "B": B}, "rows": rows}, fh, indent=1)


if __name__ == "__main__":
    main()
