"""Checkpoint / resume for param + optimizer pytrees.

The reference has no checkpointing (weights live only in memory; SURVEY.md
§5) — this is a capability upgrade. Format: a single ``.npz`` holding the
flattened leaves; restore requires a template pytree with the same structure
(the natural fit for a framework whose model is defined by a static config).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str | os.PathLike, tree: Any) -> None:
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    path = os.fspath(path)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str | os.PathLike, template: Any) -> Any:
    leaves, treedef = jax.tree.flatten(template)
    with np.load(os.fspath(path)) as data:
        if len(data.files) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(data.files)} leaves, template expects "
                f"{len(leaves)}"
            )
        new_leaves = []
        for i, ref in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            ref_np = np.asarray(ref)
            if arr.shape != ref_np.shape:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != template "
                    f"shape {ref_np.shape}"
                )
            new_leaves.append(jax.numpy.asarray(arr.astype(ref_np.dtype)))
    return jax.tree.unflatten(treedef, new_leaves)
