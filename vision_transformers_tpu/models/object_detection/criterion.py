"""DETR set criterion (authored — absent from the reference, SURVEY.md §2.9.2).

Standard DETR losses over the Hungarian matching, all jit-safe on padded
targets:
- ``loss_labels``: CE over every query against matched class / no-object,
  with the no-object class down-weighted by ``eos_coef`` (0.1) and the
  torch-style weighted-mean normalization.
- ``loss_boxes``: L1 on cxcywh + (1 − diag GIoU) on matched pairs,
  normalized by the (cross-host, pmean-able) number of target boxes.
- ``loss_cardinality``: |#non-empty predictions − #targets| (logging only,
  no gradient).
- aux losses: same terms per intermediate decoder layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import optax

from vision_transformers_tpu.models.object_detection.matcher import (
    HungarianMatcher,
)
from vision_transformers_tpu.utils.coco.util.box_ops import (
    box_cxcywh_to_xyxy,
    generalized_box_iou,
)


def _gather_matched(arr: jax.Array, src_idx: jax.Array) -> jax.Array:
    """arr (B, Q, ...), src_idx (B, T) → (B, T, ...) (invalid rows
    gather query 0; callers mask them)."""
    safe = jnp.maximum(src_idx, 0)
    return jax.vmap(lambda a, i: a[i])(arr, safe)


@dataclass(frozen=True)
class SetCriterion:
    num_classes: int
    matcher: HungarianMatcher = field(default_factory=HungarianMatcher)
    eos_coef: float = 0.1
    weight_ce: float = 1.0
    weight_bbox: float = 5.0
    weight_giou: float = 2.0

    def _losses_one(self, outputs: Dict, labels, boxes, valid,
                    num_boxes) -> Dict[str, jax.Array]:
        src_idx = self.matcher(outputs, labels, boxes, valid)
        logits = outputs["pred_logits"].astype(jnp.float32)
        pred_boxes = outputs["pred_boxes"].astype(jnp.float32)
        b, q, _ = logits.shape

        # ---- labels: scatter matched classes into a (B, Q) target map
        target_classes = jnp.full((b, q), self.num_classes, jnp.int32)
        scatter_idx = jnp.where(valid & (src_idx >= 0), src_idx, q)  # q=drop
        target_classes = jax.vmap(
            lambda tc, si, lb: tc.at[si].set(lb, mode="drop")
        )(target_classes, scatter_idx, labels)

        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, target_classes)
        w = jnp.where(target_classes == self.num_classes, self.eos_coef, 1.0)
        loss_ce = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-9)

        # ---- boxes: matched pairs only
        matched_pred = _gather_matched(pred_boxes, src_idx)  # (B, T, 4)
        vmask = (valid & (src_idx >= 0)).astype(jnp.float32)
        l1 = jnp.sum(jnp.abs(matched_pred - boxes), axis=-1)
        loss_bbox = jnp.sum(l1 * vmask) / num_boxes

        giou_diag = jax.vmap(
            lambda pb, tb: jnp.diagonal(generalized_box_iou(
                box_cxcywh_to_xyxy(pb), box_cxcywh_to_xyxy(tb)))
        )(matched_pred, boxes)
        loss_giou = jnp.sum((1.0 - giou_diag) * vmask) / num_boxes

        # ---- cardinality (no gradient; logging parity)
        pred_nonempty = jnp.sum(
            jnp.argmax(logits, axis=-1) != self.num_classes, axis=1)
        tgt_count = jnp.sum(valid, axis=1)
        card = jnp.mean(jnp.abs(
            pred_nonempty.astype(jnp.float32) - tgt_count.astype(jnp.float32)))

        return {
            "loss_ce": loss_ce,
            "loss_bbox": loss_bbox,
            "loss_giou": loss_giou,
            "cardinality_error": jax.lax.stop_gradient(card),
        }

    def __call__(self, outputs: Dict, labels, boxes, valid,
                 num_boxes=None) -> Dict[str, jax.Array]:
        """outputs from Detr; (labels, boxes, valid) from prepare_targets.
        ``num_boxes`` overrides the normalizer (pass the cross-host pmean
        for multi-host parity with reference reduce_dict semantics)."""
        if num_boxes is None:
            num_boxes = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        losses = self._losses_one(outputs, labels, boxes, valid, num_boxes)
        if "aux_outputs" in outputs:
            for i, aux in enumerate(outputs["aux_outputs"]):
                for k, v in self._losses_one(
                        aux, labels, boxes, valid, num_boxes).items():
                    losses[f"{k}_{i}"] = v
        return losses

    def total_loss(self, losses: Dict[str, jax.Array]) -> jax.Array:
        weights = {
            "loss_ce": self.weight_ce,
            "loss_bbox": self.weight_bbox,
            "loss_giou": self.weight_giou,
        }
        total = jnp.float32(0)
        for k, v in losses.items():
            base = k.rsplit("_", 1)[0] if k[-1].isdigit() else k
            if base in weights:
                total = total + weights[base] * v
        return total
