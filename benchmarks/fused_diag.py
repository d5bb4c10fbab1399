"""On-chip diagnostic: decompose the fused Pallas CAVI kernel and diff every
intermediate against a HIGHEST-precision XLA oracle on identical state.

Round-4 localization tool (VERDICT r3 Weak #1).  History it captured:
  * round-3 kernel: gram cross-dot and U2 at Mosaic DEFAULT (1-pass bf16,
    2.3e-3) -> vf rel error ~1e2, theta 0.22; unwhitening amplified U2's
    error by ~7e2 -> S2 rel error 5e3.  Six likelihoods silently wrong.
  * round-4 kernel (kappa basis, module docstring of ops/pallas_kernels.py):
    every intermediate within ~1e-3 of the oracle and at or below the XLA
    production path's own error.

Run: python benchmarks/fused_diag.py [studentt|laplace|logistic]
"""
from __future__ import annotations

import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
import sys

import jax
import jax.numpy as jnp
import numpy as np

import agp_tpu as agp
from agp_tpu.config import jitter
from agp_tpu.inference.analytic_vi import (
    kmat_l_inv,
    pallas_override,
)
from agp_tpu.ops import pallas_kernels as pk

DTYPE = jnp.float32
HI = jax.lax.Precision.HIGHEST


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = np.abs(a - b)
    denom = max(np.max(np.abs(b)), 1e-30)
    return float(np.max(d) / denom)


def main():
    lik_name = sys.argv[1] if len(sys.argv) > 1 else "studentt"
    M, B, D = 512, 8192, 2
    key = jax.random.PRNGKey(30)
    X = jax.random.uniform(key, (30_000, D), dtype=DTYPE) * 4 - 2
    f = jnp.sin(2 * X[:, 0]) + 0.5 * X[:, 1]
    e = 0.1 * jax.random.t(jax.random.PRNGKey(31), 4.0, f.shape, DTYPE)
    y = np.asarray(f + e)

    liks = {
        "studentt": (agp.StudentTLikelihood.create(4.0), "studentt"),
        "laplace": (agp.LaplaceLikelihood.create(0.1), "laplace"),
        "logistic": (agp.LogisticLikelihood.create(), "logistic"),
    }
    lik, kern_lik = liks[lik_name]
    if lik_name == "logistic":
        y = np.asarray(jnp.sign(f))

    m = agp.SVGP.create(
        agp.SqExponentialKernel(), lik,
        agp.AnalyticSVI(B, minibatch_sampling="slice"), Z=X[:M], optimiser=None,
    )
    # warm up the state with the XLA (correct) path so we diff at a
    # representative point of the trajectory, not at init
    with pallas_override("off"):
        m1, s1 = agp.train(m, X, y, iterations=30)

    xb, yb = X[:B], jnp.asarray(y[:B])
    kmat = s1.kmat
    L_inv = kmat_l_inv(kmat)[0]
    jitt = jitter(DTYPE)
    var = jnp.ravel(m1.kernel.variance)[0]
    ls = jnp.ravel(m1.kernel.lengthscale)[0]
    mu, Sigma = s1.mu[0], s1.Sigma[0]

    # conditioning of Kmm
    K = jnp.matmul(kmat["L_K"][0], kmat["L_K"][0].T)
    ev = jnp.linalg.eigvalsh(K)
    print(f"Kmm cond ~ {float(ev[-1]/ev[0]):.3e}  lam_min {float(ev[0]):.3e}")

    # ---- oracle (XLA HIGHEST, same two-factor kappa math) ----
    def oracle():
        kernel1 = jax.tree_util.tree_map(lambda l: l[0], m1.kernel)
        knm = kernel1.gram(xb, m1.Z[0])
        w = jnp.dot(knm, L_inv.T, precision=HI)
        ktilde = jnp.maximum(var + jitt - jnp.sum(w * w, axis=1), 1e-12)
        kappa = jnp.dot(w, L_inv, precision=HI)
        mf = jnp.dot(kappa, mu, precision=HI)
        kS = jnp.dot(kappa, Sigma, precision=HI)
        vf = jnp.maximum(ktilde + jnp.sum(kS * kappa, axis=1), 1e-12)
        return kappa, ktilde, mf, vf

    kap_o, kt_o, mf_o, vf_o = jax.jit(oracle)()

    # ---- fused_kappa kernel ----
    kap_p, kt_p = pk.fused_kappa(xb, m1.Z[0], L_inv.T, ls, var, jitt, kind="rbf")
    print(f"fused_kappa:  kappa rel {rel(kap_p, kap_o):.3e}   "
          f"ktilde rel {rel(kt_p, kt_o):.3e}")

    # ---- full fused kernel ----
    if lik_name == "studentt":
        p0, p1 = m1.likelihood.nu, m1.likelihood.sigma ** 2
    elif lik_name == "laplace":
        p0, p1 = m1.likelihood.a, 0.0
    else:
        p0, p1 = 0.0, 0.0
    rho = s1.rho
    s1p, S2p, c_p, th_p, mf_p, vf_p = pk.fused_cavi_stats(
        xb, yb, m1.Z[0], L_inv.T, mu, Sigma, ls, var, jitt, rho,
        lik_p0=p0, lik_p1=p1, kind="rbf", lik=kern_lik,
    )
    print(f"fused kernel: mf rel {rel(mf_p, mf_o):.3e}   vf rel {rel(vf_p, vf_o):.3e}")
    print(f"   vf_o range [{float(jnp.min(vf_o)):.3e}, {float(jnp.max(vf_o)):.3e}]   "
          f"ktilde_o range [{float(jnp.min(kt_o)):.3e}, {float(jnp.max(kt_o)):.3e}]")

    # oracle E-step + stats from oracle moments
    def estep(mf, vf):
        if kern_lik == "studentt":
            c = ((mf - yb) ** 2 + vf + p1 * p0) / 2.0
            th = ((p0 + 1.0) / 2.0) / c
            gmu, gs = th * yb, th / 2.0
        elif kern_lik == "laplace":
            c = jnp.sqrt(jnp.maximum((mf - yb) ** 2 + vf, 1e-30))
            th = jnp.sqrt(p0) / c
            gmu, gs = th * yb, th / 2.0
        else:
            c = jnp.sqrt(mf * mf + vf)
            th = jnp.tanh(c / 2.0) / (2.0 * c)
            gmu, gs = yb / 2.0, th / 2.0
        return c, th, gmu, gs

    c_o, th_o, gmu_o, gs_o = jax.jit(estep)(mf_o, vf_o)
    print(f"fused kernel: c rel {rel(c_p, c_o):.3e}   theta rel {rel(th_p, th_o):.3e}")

    s1_o = jnp.dot(kap_o.T, rho * gmu_o, precision=HI)
    S2_o = jnp.dot((kap_o * (rho * gs_o)[:, None]).T, kap_o, precision=HI)
    print(f"fused kernel: s1 rel {rel(s1p, s1_o):.3e}   S2 rel {rel(S2p, S2_o):.3e}")

    # XLA production path statistics for the same state
    with pallas_override("off"):
        from agp_tpu.inference.analytic_vi import compute_kappa

        def xla_stats():
            _, kappa, ktilde = compute_kappa(m1, xb, kmat)
            mf = jnp.einsum("lbm,lm->lb", kappa, s1.mu)
            kS = jnp.einsum("lbm,lmn->lbn", kappa, s1.Sigma)
            vf = ktilde + jnp.sum(kS * kappa, axis=-1)
            c, th, gmu, gs = estep(mf[0], vf[0])
            st1 = kappa[0].T @ (rho * gmu)
            st2 = (kappa[0] * (rho * gs)[:, None]).T @ kappa[0]
            return st1, st2, mf[0], vf[0]

        st1_x, st2_x, mf_x, vf_x = jax.jit(xla_stats)()
    print(f"xla-vs-oracle: mf rel {rel(mf_x, mf_o):.3e}  vf rel {rel(vf_x, vf_o):.3e}  "
          f"s1 rel {rel(st1_x, s1_o):.3e}  S2 rel {rel(st2_x, S2_o):.3e}")
    print(f"fused-vs-xla:  s1 rel {rel(s1p, st1_x):.3e}  S2 rel {rel(S2p, st2_x):.3e}")


if __name__ == "__main__":
    main()
