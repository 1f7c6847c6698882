"""Bounding-box math for the detection stack (jnp, jit-safe).

Same capability surface as the reference's box utilities
(utils/coco/util/box_ops.py:9-88): cxcywh↔xyxy conversion, IoU with union,
generalized IoU (the DETR box-loss core), masks→boxes. Differences for the
TPU compute path: everything is batched jnp with no data-dependent asserts
inside jit (degenerate boxes are clamped rather than asserted —
``generalized_box_iou`` is called inside the jitted criterion); an optional
``check`` flag restores the eager-mode validation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_cxcywh_to_xyxy(x: jax.Array) -> jax.Array:
    xc, yc, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jax.Array) -> jax.Array:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jax.Array, boxes2: jax.Array):
    """Pairwise IoU and union for xyxy boxes: (N,4),(M,4) → (N,M),(N,M)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / jnp.maximum(union, 1e-9), union


def generalized_box_iou(boxes1: jax.Array, boxes2: jax.Array,
                        check: bool = False) -> jax.Array:
    """Pairwise GIoU for xyxy boxes (giou.stanford.edu)."""
    if check:  # eager-mode validation only — not usable under jit
        assert bool(jnp.all(boxes1[:, 2:] >= boxes1[:, :2]))
        assert bool(jnp.all(boxes2[:, 2:] >= boxes2[:, :2]))
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def masks_to_boxes(masks: jax.Array) -> jax.Array:
    """(N, H, W) boolean/0-1 masks → (N, 4) xyxy boxes."""
    if masks.size == 0:
        return jnp.zeros((0, 4), jnp.float32)
    h, w = masks.shape[-2:]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    m = masks.astype(jnp.float32)

    x_max = jnp.max((m * xs).reshape(m.shape[0], -1), axis=-1)
    x_min = jnp.min(
        jnp.where(m > 0, xs, 1e8).reshape(m.shape[0], -1), axis=-1)
    y_max = jnp.max((m * ys).reshape(m.shape[0], -1), axis=-1)
    y_min = jnp.min(
        jnp.where(m > 0, ys, 1e8).reshape(m.shape[0], -1), axis=-1)
    return jnp.stack([x_min, y_min, x_max, y_max], axis=1)
