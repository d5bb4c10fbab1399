"""Checkpoint / resume.

The reference has no serialization (docs: save/load "in construction",
/root/reference/docs/src/userguide.md:209-215); its de-facto resume
mechanism is the functional `state` NamedTuple threaded back into train!
(training/training.jl:13-44).  Here both the model and TrainState are
pytrees, so checkpointing is exact: array leaves go into .npz files plus a
JSON manifest (shapes/dtypes), and the pytree STRUCTURE is restored onto
caller-built templates (the orbax restore-with-template idiom) -- the
default load path never unpickles anything.

A pickled treedef is also written so `load(path, allow_pickle=True)` can
restore without templates; unpickling executes arbitrary code, so that
mode is opt-in and for checkpoints you (or a trusted process) wrote only.

Limitation: models whose likelihood class was generated at runtime by
`make_augmented_likelihood` are not picklable by name; rebuild the class
in code and use the template path for those.
"""
from __future__ import annotations

import json
import os
from typing import Any, Tuple

try:  # closures (optax transforms, robbins_monro) need cloudpickle
    import cloudpickle as pickle
except Exception:  # pragma: no cover
    import pickle

import jax
import numpy as np


def save(path: str, model: Any, state: Any) -> None:
    """Serialize (model, state): array leaves -> npz + JSON manifest;
    static structure -> pickled treedefs (used only by the opt-in
    `allow_pickle=True` load mode)."""
    os.makedirs(path, exist_ok=True)
    manifest = {}
    for name, tree in (("model", model), ("state", state)):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        arrs = [np.asarray(x) for x in leaves]
        np.savez(
            os.path.join(path, f"{name}.npz"),
            **{f"leaf_{i}": a for i, a in enumerate(arrs)},
        )
        manifest[name] = [
            {"shape": list(a.shape), "dtype": str(a.dtype)} for a in arrs
        ]
        with open(os.path.join(path, f"{name}.treedef.pkl"), "wb") as f:
            pickle.dump(treedef, f)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def _load_leaves(path: str, name: str):
    import jax.numpy as jnp

    data = np.load(os.path.join(path, f"{name}.npz"))  # allow_pickle=False
    return [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]


def load(
    path: str,
    model_template: Any = None,
    state_template: Any = None,
    allow_pickle: bool = False,
) -> Tuple[Any, Any]:
    """Load (model, state) written by :func:`save`.

    Default (safe) mode: pass templates with the same pytree structure as
    the saved objects -- build the model the same way in code and
    `init_state` it; the checkpoint's array leaves are grafted onto them.
    Nothing is unpickled, so this is safe for untrusted checkpoints.

    `allow_pickle=True` restores without templates by unpickling the saved
    treedefs.  Unpickling executes arbitrary code: use only on checkpoints
    you (or a trusted process) wrote.
    """
    if allow_pickle:
        out = []
        for name in ("model", "state"):
            with open(os.path.join(path, f"{name}.treedef.pkl"), "rb") as f:
                treedef = pickle.load(f)
            data = np.load(os.path.join(path, f"{name}.npz"), allow_pickle=True)
            import jax.numpy as jnp

            leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
            leaves = [
                jnp.asarray(x) if x.ndim or x.dtype != object else x.item()
                for x in leaves
            ]
            out.append(jax.tree_util.tree_unflatten(treedef, leaves))
        return out[0], out[1]
    if model_template is None or state_template is None:
        raise ValueError(
            "load() is weights-only by default: pass model_template and "
            "state_template (build the model the same way and init_state "
            "it), or opt into allow_pickle=True for TRUSTED checkpoints"
        )
    return load_arrays(path, model_template, state_template)


def load_arrays(path: str, model_template: Any, state_template: Any) -> Tuple[Any, Any]:
    """Weights-only load: read the .npz array leaves and unflatten them onto
    the structure of caller-built templates.  Never unpickles.  The
    templates must have the same pytree structure as the saved objects;
    leaf count and shapes are validated against the JSON manifest."""
    manifest = None
    mpath = os.path.join(path, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    out = []
    for name, template in (("model", model_template), ("state", state_template)):
        treedef = jax.tree_util.tree_structure(template)
        leaves = _load_leaves(path, name)
        if len(leaves) != treedef.num_leaves:
            raise ValueError(
                f"{name}: checkpoint has {len(leaves)} leaves, template has "
                f"{treedef.num_leaves} -- template structure must match"
            )
        if manifest is not None:
            t_leaves = jax.tree_util.tree_leaves(template)
            for i, (saved, tl) in enumerate(zip(manifest[name], t_leaves)):
                if list(np.shape(tl)) != saved["shape"]:
                    raise ValueError(
                        f"{name} leaf {i}: checkpoint shape {saved['shape']} "
                        f"!= template shape {list(np.shape(tl))}"
                    )
        out.append(jax.tree_util.tree_unflatten(treedef, leaves))
    return out[0], out[1]
