"""Checkpoint / resume.

The reference has only an unused ``save_on_master → torch.save`` helper and
no load path (SURVEY.md §5.4). Designed in from the start here: the full
TrainState pytree (params + optimizer state + step) plus metadata is written
with orbax, host-0-gated for multi-host runs, with retention and a resume
path — preemption recovery is free.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Any, step: int,
                    keep: Optional[int] = 3) -> str:
    """Write ``state`` under ckpt_dir/step_N (host 0 only). Returns path."""
    if jax.process_index() != 0:
        return ""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    _checkpointer().save(path, jax.device_get(state), force=True)
    if keep:
        steps = sorted(available_checkpoints(ckpt_dir))
        for old in steps[:-keep]:
            import shutil

            shutil.rmtree(
                os.path.join(ckpt_dir, f"step_{old}"), ignore_errors=True
            )
    return path


def available_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_"):
            try:
                out.append(int(d.split("_", 1)[1]))
            except ValueError:
                pass
    return sorted(out)


def restore_checkpoint(ckpt_dir: str, target: Any, step: Optional[int] = None):
    """Restore the given (or latest) step into the structure of ``target``."""
    steps = available_checkpoints(ckpt_dir)
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir!r}")
    step = step if step is not None else steps[-1]
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    import orbax.checkpoint as ocp

    restored = _checkpointer().restore(path, item=jax.device_get(target))
    return restored
