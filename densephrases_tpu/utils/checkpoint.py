"""Checkpoint / resume via orbax.

Parity with the reference's checkpoint contract (ref: train_rc.py:277-294
save_pretrained + optimizer.pt + scheduler.pt every save_steps; resume
restores optimizer state and step, ref: train_rc.py:99-110,147-189). Here a
checkpoint is one orbax PyTree save of the whole TrainState (params, opt
state, step, pre-batch buffer), so resume is exact — including the
pre-batch negative queue, which the reference silently loses on restart.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    """Save a pytree (TrainState or bare params) to `path/step_N`."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    step = int(step if step is not None else _get_step(state))
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(path, f"step_{step}")
    ckptr.save(target, state, force=True)
    ckptr.wait_until_finished()
    return target


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(path, f"step_{max(steps)}")


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore the latest checkpoint under `path` into `template`'s structure.

    `template` is a pytree of arrays with the right shapes/dtypes (e.g. a
    freshly-initialized TrainState)."""
    target = path if os.path.basename(path).startswith("step_") \
        else latest_checkpoint(path)
    if target is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(target, target=template)


def _get_step(state) -> int:
    step = getattr(state, "step", None)
    if step is None:
        return 0
    return int(np.asarray(step))
