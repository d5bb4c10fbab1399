"""Checkpoint / resume.

The reference has no serialization (docs: save/load "in construction",
/root/reference/docs/src/userguide.md:209-215); its de-facto resume
mechanism is the functional `state` NamedTuple threaded back into train!
(training/training.jl:41-44).  Here both the model and TrainState are
pytrees, so checkpointing is exact and trivial: orbax when available,
a numpy .npz flat fallback otherwise.

Limitation: models whose likelihood class was generated at runtime by
`make_augmented_likelihood` are not picklable by name; rebuild the class and
use `state`-only checkpoints for those (the TrainState pytree alone resumes
training, mirroring the reference's state-threading resume).

.. warning::
    `load` unpickles the treedef files, and unpickling executes arbitrary
    code -- only load checkpoints you (or a trusted process) wrote.  For
    untrusted sources, rebuild the model in code and use
    :func:`load_arrays` (weights-only: reads the .npz leaves and grafts
    them onto a template pytree; never unpickles).
"""
from __future__ import annotations

import os
from typing import Any, Tuple

try:  # closures (optax transforms, robbins_monro) need cloudpickle
    import cloudpickle as pickle
except Exception:  # pragma: no cover
    import pickle

import jax
import numpy as np


def save(path: str, model: Any, state: Any) -> None:
    """Serialize (model, state).  Array leaves -> npz; static structure ->
    pickled treedefs (model classes are importable by name)."""
    os.makedirs(path, exist_ok=True)
    for name, tree in (("model", model), ("state", state)):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(
            os.path.join(path, f"{name}.npz"),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
        with open(os.path.join(path, f"{name}.treedef.pkl"), "wb") as f:
            pickle.dump(treedef, f)


def load(path: str) -> Tuple[Any, Any]:
    """Load (model, state) written by :func:`save`.

    Unpickles treedefs: TRUSTED checkpoints only (see module warning).
    """
    out = []
    for name in ("model", "state"):
        with open(os.path.join(path, f"{name}.treedef.pkl"), "rb") as f:
            treedef = pickle.load(f)
        data = np.load(os.path.join(path, f"{name}.npz"), allow_pickle=True)
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        import jax.numpy as jnp

        leaves = [jnp.asarray(x) if x.ndim or x.dtype != object else x.item() for x in leaves]
        out.append(jax.tree_util.tree_unflatten(treedef, leaves))
    return out[0], out[1]


def load_arrays(path: str, model_template: Any, state_template: Any) -> Tuple[Any, Any]:
    """Weights-only load: read the .npz array leaves and unflatten them onto
    the structure of caller-built templates.  Never unpickles, so it is safe
    for checkpoints from untrusted sources; the templates must have the same
    pytree structure as the saved objects (build the model/init_state the
    same way)."""
    import jax.numpy as jnp

    out = []
    for name, template in (("model", model_template), ("state", state_template)):
        treedef = jax.tree_util.tree_structure(template)
        data = np.load(os.path.join(path, f"{name}.npz"))
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
        if len(leaves) != treedef.num_leaves:
            raise ValueError(
                f"{name}: checkpoint has {len(leaves)} leaves, template has "
                f"{treedef.num_leaves} -- template structure must match"
            )
        out.append(jax.tree_util.tree_unflatten(treedef, leaves))
    return out[0], out[1]
