"""Sequence parallelism: ring attention over a mesh axis.

The reference scales sequence cost only architecturally (windows/SRA/
Performer — SURVEY.md §5.7); it has no sequence sharding of any kind.
This module adds the TPU-native capability the architecture hints at but
can't reach: when one chip's HBM can't hold a sequence's S² score matrix
(COCO-scale DETR encoders, 1333px → S≈4200, or anything longer), shard
the sequence over a mesh axis and rotate K/V blocks around the ICI ring
with online-softmax accumulation — compute on block j overlaps the
ppermute of block j+1, the classic TPU ring-attention schedule
(jax-ml.github.io/scaling-book pattern; no reference counterpart).

Two entry points:
- ``ring_attention_local``: the per-device body, for use inside an
  existing ``shard_map`` (e.g. a fully sharded train step).
- ``sequence_parallel_attention``: standalone wrapper that shard_maps
  q/k/v over ``(batch 'data'?, seq)`` axes of a mesh and returns the
  sequence-sharded result.

Semantics match ``ops.attention.mha_reference`` (full bidirectional
attention, optional key-padding mask) to fp32 tolerance — asserted in
tests/test_sequence_parallel.py on an 8-device CPU mesh.
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


class SequenceShardingCtx(NamedTuple):
    mesh: Mesh
    seq_axis: str
    data_axis: Optional[str]


_SEQ_CTX: list = []


@contextlib.contextmanager
def sequence_sharding(mesh: Mesh, seq_axis: str = "seq",
                      data_axis: Optional[str] = None):
    """Route self-attention of SP-aware modules (the DETR encoder) through
    ring attention over ``mesh[seq_axis]`` while active.

    Trace-time switch: wrap the ``jit``/``apply`` call so the flag is seen
    when the model traces. Modules fall back to single-device attention
    when the sequence doesn't divide the axis or dropout is active.

        with sequence_sharding(mesh, "seq"):
            out = detr.apply(params, images, masks)
    """
    _SEQ_CTX.append(SequenceShardingCtx(mesh, seq_axis, data_axis))
    try:
        yield
    finally:
        _SEQ_CTX.pop()


def current_sequence_sharding() -> Optional[SequenceShardingCtx]:
    return _SEQ_CTX[-1] if _SEQ_CTX else None


def ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Ring attention body; call inside shard_map.

    q, k, v: (B, H, S_local, D) — the local sequence shards.
    kv_mask: optional (B, S_local) bool, True = key attendable (the local
    shard of a key-padding mask).
    Returns (B, H, S_local, D): exact softmax(QKᵀ)V rows for the local
    queries, accumulated online over all n ring steps.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    b, h, s_loc, d = q.shape
    qf = q.astype(jnp.float32)

    def step(carry, _):
        k_blk, v_blk, mask_blk, m, l, acc = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32)) * scale
        if mask_blk is not None:
            s = jnp.where(mask_blk[:, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if mask_blk is not None:
            # exp(NEG_INF - NEG_INF) = 1 when a whole row is masked so
            # far; masked keys must contribute exactly zero mass
            p = jnp.where(mask_blk[:, None, None, :], p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32))
        # rotate the K/V (and mask) blocks one hop around the ring; XLA
        # overlaps this ppermute with the next step's einsums over ICI
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if mask_blk is not None:
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return (k_blk, v_blk, mask_blk, m_new, l, acc), None

    m0 = jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)
    (_, _, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, kv_mask, m0, l0, acc0), None, length=n)
    # all-padding rows (fully masked) have l == 0; emit zeros, not NaN
    out = acc / jnp.maximum(l, 1e-37)
    return out.astype(q.dtype)


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    seq_axis: str = "seq",
    data_axis: Optional[str] = None,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Standalone sequence-parallel attention over ``mesh``.

    q, k, v: (B, H, S, D) global arrays; the ``seq_axis`` size must
    divide S (pad + kv_mask for ragged). ``data_axis`` additionally shards
    the batch. Output is (B, H, S, D), sequence-sharded like the inputs.
    """
    d_ax = data_axis if data_axis is not None else None
    qkv_spec = P(d_ax, None, seq_axis, None)
    mask_spec = P(d_ax, seq_axis) if kv_mask is not None else None

    from vision_transformers_tpu.parallel.mesh import shard_map_compat

    body = partial(ring_attention_local, axis_name=seq_axis, scale=scale)
    if kv_mask is not None:
        fn = shard_map_compat(
            lambda q, k, v, mk: body(q, k, v, kv_mask=mk),
            mesh, (qkv_spec,) * 3 + (mask_spec,), qkv_spec)
        return fn(q, k, v, kv_mask)
    fn = shard_map_compat(
        lambda q, k, v: body(q, k, v, kv_mask=None),
        mesh, (qkv_spec,) * 3, qkv_spec)
    return fn(q, k, v)
