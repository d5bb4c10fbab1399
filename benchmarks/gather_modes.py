"""Minibatch-sampling mode microbenchmark on the real chip (VERDICT r3
Weak #6 / round-2 ask #5: the iid-gather mode pays ~2.2x vs slice at the
flagship shape).

Times the FULL jitted CAVI scan (200 steps) at the flagship shape for:
  slice    -- contiguous window at a random offset (dynamic-slice)
  gather   -- iid row gather (jnp.take of B random rows)
  block<n> -- gather of B/n random ALIGNED n-row tiles (n in 8/16/32/64):
              same HBM bytes in n-times fewer, larger transactions;
              statistically a block bootstrap (rows pre-shuffled once =>
              tiles are iid samples of n exchangeable rows).  n=32 is the
              production "block" mode default (training/train.py)
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

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = pltpu = None


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
    # the flagship/bench.py shape (RESULTS.md headline: slice 37,966 vs
    # gather 15,001 iters/s at M=64/B=4096/N=200k)
    N, D, M, B, STEPS = 200_000, 20, 64, 4096, 2000
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
        """Xa/ya are PRE-VIEWED tile arrays for block modes (the views are
        hoisted out of the scan, matching production train.py::_vi_steps --
        the in-body [N,D]->[T,tile,D] relayout is NOT hoisted by XLA and
        costs up to 196 us/step at tile=32; see _tile_views)."""
        sub = jax.random.fold_in(k, step)
        if mode == "slice":
            start = jax.random.randint(sub, (), 0, N - B + 1)
            return (jax.lax.dynamic_slice_in_dim(Xa, start, B, 0),
                    jax.lax.dynamic_slice_in_dim(ya, start, B, 0))
        if mode == "gather":
            idx = jax.random.randint(sub, (B,), 0, N)
            return jnp.take(Xa, idx, axis=0), jnp.take(ya, idx, axis=0)
        if mode.startswith("block"):
            n = int(mode[5:])
            tidx = jax.random.randint(sub, (B // n,), 0, Xa.shape[0])
            xt = jnp.take(Xa, tidx, axis=0).reshape(B, D)
            yt = jnp.take(ya, tidx, axis=0).reshape(B)
            return xt, yt
        raise ValueError(mode)

    def run_mode(mode):
        """Measure the PRODUCTION driver (train.py::_vi_steps -- tile views
        AND draw RNG hoisted out of the scan, round 5) with the given
        minibatch_sampling mode.  Earlier revisions of this script measured
        a hand-rolled scan with per-step in-body RNG; those numbers are
        ~7.5 us/step slower across every mode and no longer describe
        production."""
        import dataclasses

        from agp_tpu.training.train import _vi_steps

        sampling = mode if not mode.startswith("block") else f"block:{mode[5:]}"
        m = model.replace(
            inference=dataclasses.replace(
                model.inference, minibatch_sampling=sampling
            )
        )
        jax.clear_caches()
        return timeit(lambda: _vi_steps(m, state0, X, y2, STEPS)[1].mu)

    rows = {}
    for mode in ("slice", "gather", "block8", "block16", "block32", "block64",
                 "block128"):
        t = run_mode(mode)
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
    for mode in ("slice", "gather", "block32", "block64", "block128"):
        @jax.jit
        def raw(k, Xa, ya, mode=mode):
            if mode.startswith("block"):
                n = int(mode[5:])
                Xa = Xa[: N // n * n].reshape(N // n, n, D)
                ya = ya[: N // n * n].reshape(N // n, n)

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


# ------------------------------------------------------- DMA tile gather
# MEASURED NEGATIVE RESULT, kept here as the floor analysis for VERDICT r3
# Weak #6: a scalar-prefetch + async-DMA tile gather (the "hand-rolled
# engine" alternative to XLA's gather op).  On v5e at the flagship shape it
# ties jnp.take at the same tile granularity (27.5 vs 26.0 us/draw at
# tr=32) -- XLA's gather lowering is already at the DMA-engine floor once
# transactions are >= ~2.5 KB.  The real lever is tile granularity (see
# the block:<n> sampling mode); per-ROW DMAs (80 B) would pay ~100 ns of
# issue/management per descriptor (~410 us for B=4096), strictly worse
# than XLA's vectorized gather (47.8 us).  Not a production path.
def _gather_tiles_kernel(tidx_ref, x_ref, out_ref, sems, *, C, rows):
    g = pl.program_id(0)
    dmas = []
    for j in range(C):
        t = tidx_ref[g * C + j]
        d = pltpu.make_async_copy(
            x_ref.at[pl.ds(t * rows, rows), :],
            out_ref.at[pl.ds(j * rows, rows), :],
            sems.at[j],
        )
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()


def gather_tile_rows(D, lanes=128):
    """Smallest tile height (in logical rows of width D) whose flat f32
    size is a whole number of 128-lane rows -- the DMA slice-alignment
    requirement of `gather_row_tiles` (Mosaic: slices along the lane dim
    must be 128-aligned, so tiles are expressed as whole rows of the
    [N*D/128, 128] flat view).  D=20 -> 32 rows (2560 B); D=8 -> 16 rows."""
    import math

    return lanes // math.gcd(D, lanes)


@functools.partial(jax.jit, static_argnames=("tile_rows", "tiles_per_step"))
def gather_row_tiles(X, tidx, tile_rows=None, tiles_per_step=64):
    """iid minibatch gather as tile-granular async DMAs (TPU).

    out[j*tr:(j+1)*tr, :] = X[tidx[j]*tr:(tidx[j]+1)*tr, :] for each of the
    T tile indices: the "block" minibatch-sampling mode's transfer, done as
    T contiguous `tr`-row HBM->VMEM copies with `tiles_per_step` DMAs in
    flight per grid step and the indices scalar-prefetched to SMEM.  XLA's
    gather op lowers an iid-row draw to ~7 GB/s effective on v5e (measured
    47.8 us for 4096x20 f32, GATHER_MODES.json); scattered reads belong on
    the row-DMA engine.

    Mosaic requires DMA slices 128-aligned along the lane dim, so X is
    viewed as [N*D/128, 128] and tiles are whole flat rows: tile_rows
    defaults to `gather_tile_rows(D)` (D=20 -> 32 logical rows = 2560 B
    per DMA) and must keep tile_rows*D % 128 == 0.  Requires
    N % tile_rows == 0 over the indexed prefix (callers draw tidx from
    N // tile_rows tiles).  Portable fallback: jnp.take on the
    [N//tr, tr, D] view (training/train.py block mode)."""
    N, D = X.shape
    tr = gather_tile_rows(D) if tile_rows is None else tile_rows
    if (tr * D) % 128:
        raise ValueError(f"tile_rows*D must be a multiple of 128, got {tr}*{D}")
    T = tidx.shape[0]
    C = min(tiles_per_step, T)
    while T % C:
        C //= 2
    rows = tr * D // 128  # flat 128-lane rows per tile
    X128 = X.reshape(N * D // 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // C,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((C * rows, 128), lambda g, tref: (g, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((C,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_tiles_kernel, C=C, rows=rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * rows, 128), X.dtype),
    )(tidx.astype(jnp.int32), X128)
    return out.reshape(T * tr, D)
