"""Multi-host initialization and host-side collectives.

Replaces the reference's env/SLURM NCCL rendezvous
(utils/coco/util/misc.py:407-429) with the JAX runtime: a single
``jax.distributed.initialize()`` on each host handles coordination over DCN;
in-step collectives are XLA ops over ICI; host-side object gathers (eval
metric merge, COCO result assembly — misc.py:89-129's pickle all_gather) use
multihost_utils.
"""

from __future__ import annotations

import jax


def init_distributed_mode(**kwargs) -> dict:
    """Initialize multi-host JAX if running under a multi-process launcher.

    Safe to call single-host (no-op). Returns rank info mirroring the
    reference's args mutation (misc.py:415-421).
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # single-process run: coordinator env vars absent
    return {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "distributed": jax.process_count() > 1,
    }


def is_main_process() -> bool:
    return jax.process_index() == 0


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def all_gather_objects(obj):
    """Gather arbitrary pytrees of arrays from every host (the TPU analogue
    of the reference's pickle-based all_gather, misc.py:89-129)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(obj)
    n = jax.process_count()
    return [jax.tree_util.tree_map(lambda x: x[i], gathered) for i in range(n)]


def save_on_master(save_fn, *args, **kwargs):
    """Run a save callback on host 0 only (misc.py:402-404 parity)."""
    if is_main_process():
        save_fn(*args, **kwargs)
