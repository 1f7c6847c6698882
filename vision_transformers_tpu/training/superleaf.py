"""Superleaf Adam: the whole optimizer state as ONE flat fp32 buffer.

Round-3 measurement (PERFORMANCE.md): the per-leaf fused-Adam kernel
(ops/fused_adam.py) was honestly rejected — ~50 per-leaf dispatches beat
its memory-pass savings at ViT-B scale. The analysis named the follow-up:
"few-large-leaf param layouts flip the arithmetic". This module IS that
layout, without touching any model code:

- the master params, Adam mu, and Adam nu each live as a single flat
  fp32 vector (padded to a block multiple);
- the train step unflattens the master into the model's param pytree by
  static slice+reshape (XLA lowers a contiguous slice of a flat buffer
  feeding a matmul to a view — no copy for row-major layouts);
- gradients are flattened with one concatenation (one extra read+write
  of grad bytes, ~0.4 ms at ViT-B/819 GB/s);
- the Adam update runs as ONE Pallas dispatch over the flat buffers
  (7 streams at the HBM roofline, ops/fused_adam.py kernel).

Whether slice-view + concat + 1 dispatch beats XLA's fused optax update
is an empirical question — benchmarks/adam_superleaf.py measures it on
the chip and PERFORMANCE.md records the keep-or-kill. Reference baseline:
the torch repo pays this inside ``optimizer.step()`` per tensor
(reference vanilla_vit.py:239).

Scope: single-chip / DP-replicated training only. A single flat buffer
cannot carry per-leaf TP partition specs — under a 'model' mesh axis use
the per-leaf paths (optax or ops/fused_adam), whose leaves inherit the
param shardings (parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.ops.fused_adam import _fused_leaf

_ROW = 1024  # flat buffers are viewed as (n_rows, _ROW) by the kernel
# pad the total so n_rows is a multiple of the kernel's 128-row block —
# otherwise _fused_leaf degrades to tiny ragged row blocks (huge grids)
_PAD_MULTIPLE = _ROW * 128


class SuperleafMeta(NamedTuple):
    treedef: Any
    shapes: tuple            # per-leaf shapes
    offsets: tuple           # per-leaf start offsets into the flat buffer
    sizes: tuple
    total_padded: int


class SuperleafState(NamedTuple):
    step: jax.Array          # int32 scalar
    flat: jax.Array          # fp32[total_padded] master params
    mu: jax.Array
    nu: jax.Array


def build_meta(params) -> SuperleafMeta:
    leaves, treedef = jax.tree.flatten(params)
    for l in leaves:
        if l.dtype != jnp.float32:
            raise ValueError(
                f"superleaf Adam requires fp32 param leaves, got {l.dtype}")
    shapes = tuple(l.shape for l in leaves)
    sizes = tuple(int(np.prod(s)) if s else 1 for s in shapes)
    offsets, off = [], 0
    for s in sizes:
        offsets.append(off)
        off += s
    total_padded = -(-off // _PAD_MULTIPLE) * _PAD_MULTIPLE
    return SuperleafMeta(treedef, shapes, tuple(offsets), sizes, total_padded)


def flatten_tree(tree, meta: SuperleafMeta) -> jax.Array:
    leaves = meta.treedef.flatten_up_to(tree)
    flat = jnp.concatenate(
        [l.reshape(-1).astype(jnp.float32) for l in leaves])
    pad = meta.total_padded - flat.shape[0]
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat


def unflatten_tree(flat: jax.Array, meta: SuperleafMeta):
    leaves = [
        jax.lax.slice(flat, (o,), (o + s,)).reshape(shape)
        for o, s, shape in zip(meta.offsets, meta.sizes, meta.shapes)
    ]
    return meta.treedef.unflatten(leaves)


def init_state(params, meta: SuperleafMeta | None = None):
    meta = meta or build_meta(params)
    flat = flatten_tree(params, meta)
    zeros = jnp.zeros_like(flat)
    return SuperleafState(jnp.zeros([], jnp.int32), flat, zeros,
                          jnp.copy(zeros)), meta


def adam_flat(state: SuperleafState, g_flat: jax.Array, lr,
              b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0):
    """One Adam(W) step on the flat buffers — a single kernel dispatch."""
    count_inc = (state.step + 1).astype(jnp.float32)
    c1 = 1.0 / (1.0 - jnp.power(b1, count_inc))
    c2 = 1.0 / (1.0 - jnp.power(b2, count_inc))
    scalars = jnp.stack([
        jnp.float32(b1), jnp.float32(b2), c1, c2,
        -jnp.asarray(lr, jnp.float32),
        jnp.float32(weight_decay), jnp.float32(eps),
    ])
    interpret = jax.default_backend() != "tpu"
    view = (state.flat.shape[0] // _ROW, _ROW)
    p, m, v = (a.reshape(view) for a in (state.flat, state.mu, state.nu))
    po, mo, vo = _fused_leaf(p, m, v, g_flat.reshape(view), scalars,
                             interpret)
    return SuperleafState(state.step + 1, po.reshape(-1), mo.reshape(-1),
                          vo.reshape(-1))


def superleaf_train_step_fn(model, meta: SuperleafMeta, lr,
                            normalize=None, b1=0.9, b2=0.999, eps=1e-8,
                            weight_decay=0.0):
    """Train step over a SuperleafState; loss math mirrors
    trainer.train_step_fn (CE with padding weights)."""
    from vision_transformers_tpu.training.trainer import (
        _default_preprocess, cross_entropy_with_weights,
    )

    def step(state: SuperleafState, images, labels, weights, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        x = _default_preprocess(images, normalize)

        def compute_loss(flat):
            params = unflatten_tree(flat, meta)
            logits = model.apply(
                {"params": params}, x,
                deterministic=False, rngs={"dropout": dropout_rng},
            )
            loss = cross_entropy_with_weights(logits, labels, weights)
            return loss, logits

        (loss, logits), g_flat = jax.value_and_grad(
            compute_loss, has_aux=True)(state.flat)
        state = adam_flat(state, g_flat, lr, b1=b1, b2=b2, eps=eps,
                          weight_decay=weight_decay)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == labels) * weights)
        n = jnp.sum(weights)
        return state, loss * n, correct, n

    return step
