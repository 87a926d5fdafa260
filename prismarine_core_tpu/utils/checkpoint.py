"""Checkpoint / resume.

The reference has no state checkpointing at all (SURVEY.md §5 — only a
manual EXR snapshot, ``Application.hpp:324-343``).  Here both long
progressive renders and inverse-rendering optimizations are resumable:
any pytree (scene params, optimizer state, the progressive accumulator)
round-trips through orbax, with a numpy .npz fallback when orbax is
unavailable.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree.flatten(tree)
    return flat, treedef


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree checkpoint at ``path`` (directory for orbax,
    .npz file for the fallback)."""
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    flat, _ = _flatten_with_paths(tree)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_pytree(path: str, like: Any) -> Any:
    """Load a checkpoint saved by save_pytree; ``like`` provides the
    pytree structure (and shapes/dtypes for orbax)."""
    try:
        import orbax.checkpoint as ocp
        if os.path.isdir(path):
            ckptr = ocp.StandardCheckpointer()
            target = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                               np.asarray(x).dtype), like)
            return ckptr.restore(os.path.abspath(path), target)
    except Exception:
        pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    flat, treedef = _flatten_with_paths(like)
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"])
              for i in range(len(flat))]
    return jax.tree.unflatten(treedef, leaves)


# -- progressive renderer state --------------------------------------------

def save_renderer(path: str, renderer) -> None:
    """Persist a ProgressiveRenderer's accumulation state."""
    state = {
        "accum": renderer._accum,
        "weight": renderer._weight,
        "n_frames": np.int64(renderer._n_frames),
        "key": jax.random.key_data(renderer._key),
    }
    save_pytree(path, state)


def load_renderer(path: str, renderer) -> None:
    """Restore accumulation state saved by save_renderer (in place)."""
    like = {
        "accum": renderer._accum,
        "weight": renderer._weight,
        "n_frames": np.int64(0),
        "key": jax.random.key_data(renderer._key),
    }
    state = load_pytree(path, like)
    renderer._accum = jax.numpy.asarray(state["accum"])
    renderer._weight = jax.numpy.asarray(state["weight"])
    renderer._n_frames = int(state["n_frames"])
    renderer._key = jax.random.wrap_key_data(
        jax.numpy.asarray(state["key"]))
