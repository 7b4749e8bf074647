"""Training checkpoint/resume via orbax.

The reference's only checkpoint notion is the inference model file
(SURVEY.md §5 "Checkpoint / resume: N/A — inference only"); this repo adds
fine-tuning (parallel/train.py), so it also needs a resumable training
state. Orbax handles the sharded pytree (params + optimizer state + step)
natively; models/export.py remains the path from a finished TrainState to
a servable model file.

    save_train_state(dir, state)
    state = restore_train_state(dir, state_like)   # template for shapes
"""

from __future__ import annotations

import os
from typing import Any

import jax

from vit_cpp_tpu.parallel.train import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, state: TrainState) -> None:
    """Write the TrainState under `path` (overwriting).

    Leaves are stored under explicit positional keys so restore order is
    independent of orbax's container traversal (tuples round-trip as
    lists, dict key order differs from pytree order)."""
    path = os.path.abspath(path)
    leaves = jax.tree.leaves(state)
    _checkpointer().save(
        path, {f"leaf_{i:05d}": v for i, v in enumerate(leaves)}, force=True
    )


def restore_train_state(path: str, like: TrainState) -> TrainState:
    """Restore a TrainState saved by save_train_state.

    `like` provides the pytree structure and shardings to restore into
    (build it the same way as before saving — create_train_state on the
    same mesh). Values are restored then device_put onto `like`'s
    shardings, so the resumed state is laid out exactly as the original.
    """
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    like_leaves, treedef = jax.tree.flatten(like)
    if len(restored) != len(like_leaves):
        raise ValueError(
            f"checkpoint at {path} has {len(restored)} leaves, "
            f"template has {len(like_leaves)}"
        )
    placed = [
        jax.device_put(restored[f"leaf_{i:05d}"], l.sharding)
        if hasattr(l, "sharding")
        else restored[f"leaf_{i:05d}"]
        for i, l in enumerate(like_leaves)
    ]
    return jax.tree.unflatten(treedef, placed)
