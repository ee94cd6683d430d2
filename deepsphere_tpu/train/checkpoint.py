"""Checkpointing: orbax for full train state, msgpack for bare weights.

The reference only has Keras ``save_weights``/``load_weights`` (HDF5,
``tests/test_healpy_networks.py:133-152``); here we additionally checkpoint
optimizer state and step for true resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint"]


def save_checkpoint(path, state, keep=3):
    """Save a pytree (e.g. Trainer.TrainState fields as a dict) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mngr:
        step = int(getattr(state, "step", 0)) if not isinstance(state, dict) else int(state.get("step", 0))
        payload = state if isinstance(state, dict) else {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        mngr.save(step, args=ocp.args.StandardSave(payload))
        mngr.wait_until_finished()
    return path


def restore_checkpoint(path, target=None, step=None):
    """Restore the latest (or given) step; ``target`` provides the pytree
    structure/shardings when available."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mngr:
        step = mngr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"No checkpoint found under {path}")
        if target is not None:
            payload = {
                "params": target.params,
                "batch_stats": target.batch_stats,
                "opt_state": target.opt_state,
                "step": target.step,
            } if not isinstance(target, dict) else target
            restored = mngr.restore(step, args=ocp.args.StandardRestore(payload))
        else:
            restored = mngr.restore(step)
    return restored
