"""Hungarian matcher for DETR set prediction.

The reference repo has NO matcher or set criterion anywhere (SURVEY.md
§2.9.2) — DETR parity requires authoring them. TPU design (SURVEY.md §7
hard parts, "host callback vs on-device trade-off"): the (B, Q, T) cost
matrix — class, L1, GIoU terms — is computed on device inside the jitted
step where it fuses with the forward; only the tiny cost tensor crosses to
the host where ``scipy.optimize.linear_sum_assignment`` runs per batch
element via ``jax.pure_callback``. Targets are padded to a static
``max_targets`` with a validity mask so every shape stays static.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.utils.coco.util.box_ops import (
    box_cxcywh_to_xyxy,
    generalized_box_iou,
)


def prepare_targets(targets: Sequence[Dict], max_targets: int,
                    num_classes: int):
    """List of per-image target dicts → padded arrays.

    Returns (labels (B, T) int32, boxes (B, T, 4) cxcywh-rel float32,
    valid (B, T) bool). Labels of padded slots are ``num_classes``
    (no-object)."""
    b = len(targets)
    labels = np.full((b, max_targets), num_classes, np.int32)
    boxes = np.zeros((b, max_targets, 4), np.float32)
    valid = np.zeros((b, max_targets), bool)
    for i, t in enumerate(targets):
        n = min(len(t["labels"]), max_targets)
        labels[i, :n] = np.asarray(t["labels"])[:n]
        boxes[i, :n] = np.asarray(t["boxes"])[:n]
        valid[i, :n] = True
    return jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid)


def _host_assign(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Per-batch linear sum assignment. cost (B, Q, T); returns (B, T)
    query index per target, -1 on padded slots."""
    from scipy.optimize import linear_sum_assignment

    b, q, t = cost.shape
    out = np.full((b, t), -1, np.int64)
    for i in range(b):
        n = int(valid[i].sum())
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        out[i, cols] = rows
    return out.astype(np.int32)


@dataclass(frozen=True)
class HungarianMatcher:
    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0

    def __call__(self, outputs: Dict, labels: jax.Array, boxes: jax.Array,
                 valid: jax.Array) -> jax.Array:
        """outputs: pred_logits (B,Q,C+1), pred_boxes (B,Q,4 cxcywh).
        Returns src_idx (B, T): matched query per target (-1 invalid)."""
        logits = outputs["pred_logits"].astype(jnp.float32)
        pred_boxes = outputs["pred_boxes"].astype(jnp.float32)
        b, q, _ = logits.shape
        t = labels.shape[1]

        prob = jax.nn.softmax(logits, axis=-1)           # (B, Q, C+1)
        cost_class = -jnp.take_along_axis(
            prob, labels[:, None, :].astype(jnp.int32), axis=2
        )                                                # (B, Q, T)
        cost_bbox = jnp.sum(
            jnp.abs(pred_boxes[:, :, None, :] - boxes[:, None, :, :]), axis=-1
        )
        giou = jax.vmap(
            lambda pb, tb: generalized_box_iou(
                box_cxcywh_to_xyxy(pb), box_cxcywh_to_xyxy(tb))
        )(pred_boxes, boxes)
        cost = (
            self.cost_class * cost_class
            + self.cost_bbox * cost_bbox
            + self.cost_giou * (-giou)
        )
        cost = jnp.where(jnp.isfinite(cost), cost, 1e6)
        # Matching is not differentiated (standard DETR): cut the tangent
        # path before the host callback.
        cost = jax.lax.stop_gradient(cost)

        src_idx = jax.pure_callback(
            _host_assign,
            jax.ShapeDtypeStruct((b, t), jnp.int32),
            cost, valid,
            vmap_method="sequential",
        )
        return jnp.where(valid, src_idx, -1)
