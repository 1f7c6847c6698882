"""Expert parallelism: MoE MLP with experts sharded over a mesh axis.

No model in the reference's zoo (or ours) uses mixture-of-experts — EP is
capability surplus like ring attention (sequence.py) and the GPipe
schedule (pipeline.py), completing the DP/TP/SP/PP/EP axis set. The op
here is a top-1 (Switch-style) routed MLP with **dense dispatch**: every
expert's MLP runs on the full token set and a one-hot gate selects each
token's expert output. Under ``shard_map`` each device holds and computes
only its ``E/n`` experts (the EP memory + compute split) and a ``psum``
over the expert axis combines the per-token winners.

Dense dispatch is the TPU-friendly baseline (static shapes, no
capacity-overflow bookkeeping); capacity-based ``all_to_all`` dispatch —
the production schedule when E is large — drops into the same
``moe_mlp_local`` slot if a future MoE model family needs it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def moe_mlp_reference(x, router_kernel, w1, b1, w2, b2):
    """Dense single-device oracle. x: (T, D); router_kernel: (D, E);
    w1: (E, D, H), b1: (E, H), w2: (E, H, D), b2: (E, D).
    Top-1 routing; the winning expert's output is scaled by its softmax
    gate probability (Switch Transformer semantics)."""
    logits = x @ router_kernel                          # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)                 # (T,)
    gate = jnp.take_along_axis(probs, expert[:, None], axis=-1)  # (T, 1)

    e = w1.shape[0]
    onehot = jax.nn.one_hot(expert, e, dtype=x.dtype)   # (T, E)
    out = jnp.zeros_like(x)
    for j in range(e):
        y = jax.nn.gelu(x @ w1[j] + b1[j]) @ w2[j] + b2[j]
        out = out + onehot[:, j:j + 1] * y
    return out * gate


def moe_mlp_local(x, router_kernel, w1, b1, w2, b2, axis_name: str):
    """EP body; call inside shard_map.

    x and router params are replicated; w1/b1/w2/b2 are the LOCAL expert
    shards (E_local = E/n leading dim). Routing is computed (redundantly,
    it's a (T, E) matmul) on every device; each device evaluates only its
    own experts on the tokens routed to them; psum combines."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    e_local = w1.shape[0]

    logits = x @ router_kernel
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)
    gate = jnp.take_along_axis(probs, expert[:, None], axis=-1)

    first = idx * e_local
    out = jnp.zeros_like(x)
    for j in range(e_local):
        sel = (expert == first + j)[:, None].astype(x.dtype)
        y = jax.nn.gelu(x @ w1[j] + b1[j]) @ w2[j] + b2[j]
        out = out + sel * y
    out = out * gate
    return jax.lax.psum(out, axis_name)


def expert_parallel_mlp(
    x: jax.Array,
    router_kernel: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    mesh: Mesh,
    expert_axis: str = "expert",
) -> jax.Array:
    """Standalone EP wrapper: experts sharded over ``expert_axis``; the
    ``expert_axis`` size must divide E. x: (T, D) replicated tokens."""
    from vision_transformers_tpu.parallel.mesh import shard_map_compat

    rep = P(*([None] * x.ndim))
    expert_spec = P(expert_axis)
    fn = shard_map_compat(
        lambda x, rk, w1, b1, w2, b2: moe_mlp_local(
            x, rk, w1, b1, w2, b2, axis_name=expert_axis),
        mesh,
        (rep, P(None, None), expert_spec, expert_spec, expert_spec,
         expert_spec),
        rep)
    return fn(x, router_kernel, w1, b1, w2, b2)
