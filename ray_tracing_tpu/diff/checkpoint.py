"""Checkpoint / resume for inverse rendering and accumulation state.

The reference has no checkpointing at all — its only persistent artifact
is the PNG screenshot (SURVEY.md §5). The TPU framework checkpoints:

  * inverse-rendering optimization state (params pytree + optax state +
    step counter + loss history) via orbax, so a fit can resume after
    preemption;
  * Film accumulation state (render/film.py), so long progressive renders
    survive restarts.

Orbax is the primary backend; a pickle fallback keeps the feature alive
in minimal environments.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, state: dict, step: int) -> str:
    """Write `state` (arbitrary pytree dict) for `step`. Returns the path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step:08d}")
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), _to_host(state), force=True)
    except Exception:
        with open(path + ".pkl", "wb") as f:
            pickle.dump(_to_host(state), f)
    return path


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("ckpt_"):
            steps.append(int(name[5:13]))
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: int | None = None):
    """Load the checkpoint at `step` (default: latest). Returns the state
    pytree (numpy leaves) or None if nothing exists."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    path = os.path.join(directory, f"ckpt_{step:08d}")
    if os.path.exists(path + ".pkl"):
        with open(path + ".pkl", "rb") as f:
            return pickle.load(f)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    except Exception:
        return None
