"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's NCCL/DDP scaffolding
(utils/coco/util/misc.py:363-429, main.ipynb cell 12): parallelism is a
sharding annotation, not a wrapper class. A 2-axis ('data', 'model') mesh
covers DP (batch over 'data') and Megatron-style TP (attention heads and MLP
hidden width over 'model'); XLA inserts the psum/all-gather collectives over
ICI when the jitted train step consumes sharded operands.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over available devices. Default: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


# Megatron-style TP rules for the transformer params: column-parallel QKV and
# MLP fc1 (output dim sharded), row-parallel out-proj and fc2 (input dim
# sharded). Biases follow their kernel's output sharding. Everything else —
# embeddings, layernorms, heads — is replicated.
_TP_RULES = (
    (re.compile(r".*/(qkv|q_proj|k_proj|v_proj|kv)/kernel$"), P(None, "model")),
    (re.compile(r".*/(qkv|q_proj|k_proj|v_proj|kv)/bias$"), P("model")),
    (re.compile(r".*/(out|out_proj)/kernel$"), P("model", None)),
    (re.compile(r".*/(fc1)/kernel$"), P(None, "model")),
    (re.compile(r".*/(fc1)/bias$"), P("model")),
    (re.compile(r".*/(fc2)/kernel$"), P("model", None)),
)


def param_partition_spec(path: str) -> P:
    for rule, spec in _TP_RULES:
        if rule.match(path):
            return spec
    return P()


def tree_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for path, _ in flat
    ]


def shard_params(params, mesh: Mesh):
    """Apply TP partition specs to a param pytree (replicates non-matching).

    When the mesh has no 'model' axis (or size 1), everything is effectively
    replicated and this is plain DP.
    """
    def spec_for(path, leaf):
        p = param_partition_spec(path)
        # Guard: don't shard dims the leaf doesn't have or that don't divide.
        if any(a is not None for a in p):
            if len(p) > leaf.ndim:
                return P()
            for dim, axis in enumerate(p):
                if axis is not None:
                    axis_size = mesh.shape[axis]
                    if leaf.shape[dim] % axis_size != 0:
                        return P()
        return p

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = tree_paths(params)
    shardings = [
        NamedSharding(mesh, spec_for(path, leaf))
        for path, (_, leaf) in zip(paths, flat)
    ]
    leaves = [
        jax.device_put(leaf, s) for (_, leaf), s in zip(flat, shardings)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_map_compat(f, mesh, in_specs, out_specs):
    """shard_map across jax versions: the new ``jax.shard_map`` takes
    ``check_vma``; the pre-0.8 ``jax.experimental.shard_map`` took
    ``check_rep``. Both checks are disabled — ring/pipeline bodies carry
    scan state whose varying-axis types the checker can't infer."""
    try:
        from jax import shard_map

        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)
