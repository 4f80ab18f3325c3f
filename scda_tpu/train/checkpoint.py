"""Orbax checkpointing: step-granular save/resume.

Rebuild of ref ``save_checkpoint`` (lib/model/utils/net_utils.py) +
``--r --checksession/checkepoch/checkpoint`` resume (trainval_net.py:~250).
The reference saves per-epoch torch pickles of
``{session, epoch, model, optimizer, pooling_mode, class_agnostic}``;
here the full train state (params, optimizer state, step) checkpoints
atomically with Orbax at any step granularity, exceeding the reference's
epoch-granular resume (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, state: Any, step: int,
                    keep: int = 5) -> str:
    """Save ``state`` (any pytree) under ``directory/ckpt_{step:08d}``."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step:08d}")
    ckptr = _checkpointer()
    state = jax.device_get(state)
    ckptr.save(path, state, force=True)
    _prune(directory, keep)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(directory)
        if d.startswith("ckpt_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, template: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of ``template`` (a freshly built state).

    Non-array static fields (e.g. the optax transform held as a
    non-pytree field) are taken from the template; arrays come from disk.
    """
    if step is None:
        step = latest_step(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"ckpt_{step:08d}")
    ckptr = _checkpointer()

    import orbax.checkpoint as ocp

    target = jax.device_get(template)
    restored = ckptr.restore(path, item=target)
    return jax.tree_util.tree_map(np.asarray, restored)


def _prune(directory: str, keep: int) -> None:
    if keep <= 0:
        return
    steps = sorted(
        int(d.split("_")[1])
        for d in os.listdir(directory)
        if d.startswith("ckpt_") and d.split("_")[1].isdigit()
    )
    for s in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(directory, f"ckpt_{s:08d}"),
                      ignore_errors=True)
