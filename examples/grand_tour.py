import jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax.numpy as jnp, numpy as np, agp_tpu as agp, tempfile

ok = []
key = jax.random.PRNGKey(0)
X = jax.random.uniform(key, (120, 2), dtype=jnp.float64) * 4 - 2
f = jnp.sin(2 * X[:, 0]) + 0.5 * X[:, 1]
yb = np.asarray((np.asarray(f) > 0).astype(int))
yr = np.asarray(f) + 0.05 * np.random.RandomState(0).randn(120)

# 1 exact GP + noise learning + hyperopt
g = agp.GP.create(X, yr, agp.Matern52Kernel())
g, gs = agp.train(g, iterations=20)
ok.append(("GP", float(jnp.mean(jnp.abs(agp.predict_f(g, gs, X) - f))) < 0.2))
# 2 SVGP logistic SVI slice
m = agp.SVGP.create(agp.SqExponentialKernel(), agp.LogisticLikelihood.create(),
                    agp.AnalyticSVI(32, minibatch_sampling="slice"), X[:16])
m, s = agp.train(m, X, yb, iterations=150)
ok.append(("SVGP-SVI", float(jnp.mean((agp.predict_y(m, s, X) > 0) == (jnp.asarray(yb) > 0))) > 0.85))
# 3 VGP StudentT quadrature
import optax
v = agp.VGP.create(X, yr, agp.SqExponentialKernel(), agp.StudentTLikelihood.create(4.0),
                   agp.QuadratureVI(n_points=20, optimiser=optax.sgd(1e-4, momentum=0.9)), optimiser=None)
v, vs = agp.train(v, iterations=200)
ok.append(("VGP-quad", float(jnp.mean(jnp.abs(agp.predict_f(v, vs, X) - f))) < 0.5))
# 4 VStP
vt = agp.VStP.create(X, yr, agp.SqExponentialKernel(), agp.StudentTLikelihood.create(4.0), agp.AnalyticVI(), nu=4.0, optimiser=None)
vt, vts = agp.train(vt, iterations=20)
ok.append(("VStP", bool(jnp.isfinite(agp.elbo(vt, vts)))))
# 5 multiclass
ym = np.asarray(np.digitize(np.asarray(f), [-0.5, 0.5]))
mc = agp.SVGP.create(agp.SqExponentialKernel(), agp.LogisticSoftMaxLikelihood.create(3), agp.AnalyticVI(), X[:16], optimiser=None)
mc, mcs = agp.train(mc, X, ym, iterations=30)
ok.append(("multiclass", float(jnp.mean(agp.predict_y(mc, mcs, X) == jnp.asarray(ym))) > 0.55))
# 6 MCGP gibbs + nuts + hmc + smc
mg = agp.MCGP.create(X[:40], yb[:40], agp.SqExponentialKernel(), agp.LogisticLikelihood.create(), agp.GibbsSampling(n_burnin=50))
sg = agp.sample(mg, 100)
fs_, lz = agp.smc_sample(mg, n_particles=64, n_temps=8)
sh = agp.sample_hmc(mg, 80)
mn = agp.MCGP.create(X[:40], yb[:40], agp.SqExponentialKernel(), agp.LogisticLikelihood.create(), agp.HMCSampling(n_burnin=60))
sn = agp.sample(mn, 80)  # NUTS by default
ok.append(("sampling", bool(jnp.all(jnp.isfinite(sg)) and jnp.isfinite(lz)
                            and jnp.all(jnp.isfinite(sh)) and jnp.all(jnp.isfinite(sn)))))
# 6b Matern-3/2 likelihood: true augmented ELBO + exact GIG(3/2) Gibbs
mt = agp.VGP.create(X, yr, agp.SqExponentialKernel(), agp.Matern32Likelihood.create(0.5), agp.AnalyticVI(), optimiser=None)
mt, mts = agp.train(mt, iterations=30)
mtg = agp.MCGP.create(X[:40], yr[:40], agp.SqExponentialKernel(), agp.Matern32Likelihood.create(0.5), agp.GibbsSampling(n_burnin=50))
smt = agp.sample(mtg, 60)
ok.append(("matern32", bool(jnp.isfinite(agp.elbo(mt, mts)) and jnp.all(jnp.isfinite(smt))
                            and float(jnp.mean(jnp.abs(agp.predict_f(mt, mts, X) - f))) < 0.5)))
# 7 multi-output, with hyperparameter autotuning
mo = agp.MOSVGP.create(agp.SqExponentialKernel(), [agp.LogisticLikelihood.create(), agp.LaplaceLikelihood.create()], agp.AnalyticVI(), X[:12], n_latent=2, optimiser=optax.adam(0.01), atfrequency=3)
mo, mos = agp.mo_train(mo, X, (np.sign(np.asarray(f)), yr), iterations=20)
py = agp.mo_predict_y(mo, mos, X)
ls_moved = not np.allclose(np.asarray(mo.kernel.lengthscale), 1.0)
ok.append(("multioutput", len(py) == 2 and ls_moved))
# 8 online
om = agp.OnlineSVGP.create(agp.SqExponentialKernel(), agp.GaussianLikelihood.create(0.05, opt_noise=False), agp.AnalyticVI(), n_dim=2, capacity=32)
ost = None
for i in range(3):
    om, ost = agp.online_train(om, X[i*40:(i+1)*40], yr[i*40:(i+1)*40], state=ost, iterations=6)
ok.append(("online", float(jnp.mean(jnp.abs(agp.predict_f(om, ost, X) - f))) < 0.5))
# 9 augmodel + gibbs
Gen = agp.make_augmented_likelihood("T","Regression", C=0.5, g=lambda y: 0*y, alpha=lambda y: y**2, beta=lambda y: 2*y, gamma=lambda y: 1+0*y, phi=lambda r: jnp.exp(-jnp.sqrt(jnp.maximum(r,1e-12))))
gm = agp.VGP.create(X, yr, agp.SqExponentialKernel(), Gen.create(), agp.AnalyticVI(), optimiser=None)
gm, gms = agp.train(gm, iterations=20)
ok.append(("augmodel", float(jnp.mean(jnp.abs(agp.predict_f(gm, gms, X) - f))) < 0.5))
# 10 checkpoint + AR + sample_f
d = tempfile.mkdtemp(); agp.checkpoint.save(d, m, s); m2, s2 = agp.checkpoint.load(d, allow_pickle=True)
series = jnp.sin(jnp.linspace(0, 12*jnp.pi, 300, dtype=jnp.float64))
Xl = jnp.stack([series[i:i+4] for i in range(296)]); yl = series[4:]
ar = agp.SVGP.create(agp.SqExponentialKernel(), agp.GaussianLikelihood.create(1e-3, opt_noise=False), agp.AnalyticVI(), Xl[:16], optimiser=None)
ar, ars = agp.train(ar, Xl, yl, iterations=10)
preds = agp.predict_ar(ar, ars, series[-4:], 10)
fsamp = agp.sample_f(m2, s2, X[:10], n_samples=8)
ok.append(("ckpt/ar/sample_f", bool(jnp.all(jnp.isfinite(preds)) and fsamp.shape == (8, 10))))
# 11 sharded
from agp_tpu.parallel.mesh import make_mesh, sharded_train
sm = agp.SVGP.create(agp.SqExponentialKernel(), agp.LogisticLikelihood.create(), agp.AnalyticVI(), X[:12], optimiser=None)
sm, sms = sharded_train(sm, X, yb, iterations=10, mesh=make_mesh(8))
ok.append(("sharded", bool(jnp.all(jnp.isfinite(sms.mu)))))

for name, passed in ok:
    print(f"{'PASS' if passed else 'FAIL'} {name}")
assert all(p for _, p in ok), "GRAND TOUR FAILURES"
print("GRAND TOUR: ALL PASS")
