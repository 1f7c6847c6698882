"""Pipeline parallelism: GPipe-style microbatched stages over a mesh axis.

For models whose parameters exceed one chip's HBM, split the layer stack
into ``n_stages`` contiguous stages, one per device along a ``stage``
mesh axis, and stream microbatches through the ring: each schedule step,
every device applies its stage to its current activation and passes the
result to the right neighbor via ``ppermute`` (ICI), while stage 0 feeds
the next microbatch in. After ``n_micro + n_stages - 1`` steps every
microbatch has crossed every stage — the classic GPipe schedule with its
(n_stages - 1)-step fill/drain bubble.

The reference has no pipeline (or any non-DP) parallelism
(SURVEY.md §2.7); this and ring attention (parallel/sequence.py) complete
the DP/TP/SP/PP axis set natively — each is a sharding annotation plus a
collective schedule, not a wrapper framework.

Design constraint worth knowing: ``stage_fn`` must be shape-uniform
across stages (same activation shape in/out — true of transformer
encoder stacks), so per-stage params stack to one leading-``n_stages``
array sharded over the stage axis.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_local(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    microbatches: jax.Array,
    axis_name: str,
) -> jax.Array:
    """GPipe schedule body; call inside shard_map.

    stage_params: this device's stage parameters.
    microbatches: (n_micro, mb, ...) — the full input on EVERY device
    (replicated); only stage 0 reads it. Returns (n_micro, mb, ...)
    outputs, valid on the LAST stage (zeros elsewhere) — psum over the
    stage axis (or read the last shard) to collect.
    """
    n_stages = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    n_micro = microbatches.shape[0]
    steps = n_micro + n_stages - 1

    act0 = jnp.zeros_like(microbatches[0])
    out0 = jnp.zeros_like(microbatches)

    def step(carry, t):
        act, outs = carry
        # stage 0 ingests microbatch t (when any remain); others use the
        # activation received from the left neighbor last step
        feed = microbatches[jnp.minimum(t, n_micro - 1)]
        act = jnp.where(idx == 0, feed, act)
        y = stage_fn(stage_params, act)
        # the last stage completes microbatch (t - n_stages + 1) at step t
        done = t - (n_stages - 1)
        is_last = idx == n_stages - 1
        valid = jnp.logical_and(is_last, done >= 0)
        slot = jnp.clip(done, 0, n_micro - 1)
        outs = jax.lax.cond(
            valid,
            lambda o: jax.lax.dynamic_update_index_in_dim(o, y, slot, 0),
            lambda o: o,
            outs,
        )
        # pass activations right around the ring (last→0 wraps; stage 0
        # overwrites whatever it receives with the next microbatch)
        act = jax.lax.ppermute(y, axis_name, perm)
        return (act, outs), None

    (_, outs), _ = jax.lax.scan(
        step, (act0, out0), jnp.arange(steps))
    return outs


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh: Mesh,
    stage_axis: str = "stage",
    n_micro: Optional[int] = None,
) -> jax.Array:
    """Run ``x`` through an ``n_stages``-deep pipeline over ``mesh``.

    stacked_params: pytree whose leaves have a leading ``n_stages`` dim
    (stage i's params at index i) — sharded over ``stage_axis``.
    x: (B, ...) global batch; split into ``n_micro`` microbatches
    (default: one per stage). Returns (B, ...) outputs (replicated).
    """
    n_stages = mesh.shape[stage_axis]
    n_micro = n_micro or n_stages
    b = x.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    micro = x.reshape((n_micro, b // n_micro) + x.shape[1:])

    from vision_transformers_tpu.parallel.mesh import shard_map_compat

    def body(params, mb):
        # params arrive with the leading stage dim sharded to size 1
        local = jax.tree_util.tree_map(lambda a: a[0], params)
        outs = pipeline_local(
            partial(stage_fn), local, mb, axis_name=stage_axis)
        # only the last stage holds real outputs; psum broadcasts them
        # (all other stages contribute zeros)
        return jax.lax.psum(outs, stage_axis)

    param_specs = jax.tree_util.tree_map(
        lambda _: P(stage_axis), stacked_params)
    fn = shard_map_compat(
        body, mesh, (param_specs, P(*([None] * micro.ndim))),
        P(*([None] * micro.ndim)))
    outs = fn(stacked_params, micro)
    return outs.reshape((b,) + x.shape[1:])
