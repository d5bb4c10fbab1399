"""Training objective dispatch (reference: `objective`/`ELBO` methods)."""
from __future__ import annotations


def objective(model, state, x, y, kmat=None):
    if getattr(model, "is_multioutput", False):
        from ..models.multioutput import mo_elbo

        return mo_elbo(model, state, x, y, kmat=kmat)
    name = model.inference.name
    if name in ("QuadratureVI", "MCIntegrationVI"):
        from . import numerical_vi

        return numerical_vi.elbo(model, state, x, y, kmat=kmat)
    from . import analytic_vi

    return analytic_vi.elbo(model, state, x, y, kmat=kmat)
