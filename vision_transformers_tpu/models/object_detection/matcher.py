"""Hungarian matcher for DETR set prediction.

The reference repo has NO matcher or set criterion anywhere (SURVEY.md
§2.9.2) — DETR parity requires authoring them. TPU design (SURVEY.md §7
hard parts, "host callback vs on-device trade-off"): the (B, Q, T) cost
matrix — class, L1, GIoU terms — is computed on device inside the jitted
step where it fuses with the forward. The assignment itself has two
backends:

- ``auction``: a fully on-device Bertsekas auction (Jacobi bidding rounds
  under ``lax.while_loop``, ε-scaled bids, greedy completion bound) —
  vmapped over the batch. This is the default on TPU: some TPU runtimes
  (including the axon PJRT used here) do not support host callbacks at
  all, and an on-device solver keeps the whole train step one XLA program.
- ``scipy``: exact ``linear_sum_assignment`` through ``jax.pure_callback``
  (used on CPU, and as the test oracle for the auction).

Targets are padded to a static ``max_targets`` with a validity mask so
every shape stays static.
"""

from __future__ import annotations

from dataclasses import dataclass
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


def auction_assign(cost: jax.Array, valid: jax.Array,
                   eps_scale: float = 1e-3,
                   max_rounds: int = 512) -> jax.Array:
    """On-device near-optimal assignment for one (Q, T) cost matrix.

    Bertsekas auction, Jacobi variant: every unassigned valid target bids
    for its best query simultaneously; per query, the highest bid wins.
    ε below cost-resolution/T gives optimal assignments for well-separated
    costs; ``max_rounds`` bounds the loop, after which any stragglers take
    their best *free* query greedily (always yields a valid matching).

    Returns (T,) query index per target, -1 on invalid targets.
    """
    q, t = cost.shape
    benefit = -cost.astype(jnp.float32)          # maximize benefit
    spread = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-6)
    eps = spread * eps_scale / max(t, 1)
    NEG = jnp.float32(-1e30)

    def round_body(state):
        prices, owner, assign, it = state
        unassigned = valid & (assign < 0)        # (T,)

        # each unassigned target's best and second-best query value
        values = benefit.T - prices[None, :]      # (T, Q)
        best_q = jnp.argmax(values, axis=1)       # (T,)
        best_v = jnp.max(values, axis=1)
        second_v = jnp.max(
            jnp.where(
                jax.nn.one_hot(best_q, q, dtype=bool), NEG, values),
            axis=1)
        bid = best_v - second_v + eps              # (T,)
        bid = jnp.where(unassigned, bid, NEG)

        # per query: the highest bidder among unassigned targets wins
        bid_matrix = jnp.where(
            unassigned[:, None] & jax.nn.one_hot(best_q, q, dtype=bool),
            bid[:, None], NEG)                     # (T, Q)
        win_bid = jnp.max(bid_matrix, axis=0)      # (Q,)
        winner = jnp.argmax(bid_matrix, axis=0)    # (Q,)
        contested = win_bid > NEG / 2

        # dethrone previous owners of contested queries
        dethroned = contested[jnp.maximum(assign, 0)] & (assign >= 0) & (
            winner[jnp.maximum(assign, 0)] != jnp.arange(t))
        assign = jnp.where(dethroned, -1, assign)

        # crown winners
        new_owner = jnp.where(contested, winner, owner)
        prices = jnp.where(contested, prices + win_bid, prices)
        assign = jnp.where(
            contested[best_q] & (winner[best_q] == jnp.arange(t))
            & unassigned,
            best_q, assign)
        return prices, new_owner, assign, it + 1

    def cond(state):
        _, _, assign, it = state
        return jnp.any(valid & (assign < 0)) & (it < max_rounds)

    prices0 = jnp.zeros((q,), jnp.float32)
    owner0 = jnp.full((q,), -1, jnp.int32)
    assign0 = jnp.where(valid, -1, -2).astype(jnp.int32)  # -2: never assign
    _, _, assign, _ = jax.lax.while_loop(
        cond, round_body, (prices0, owner0, assign0, jnp.int32(0)))

    # greedy completion for any stragglers (bounded unrolled passes)
    def fill(i, assign):
        taken = jnp.any(
            jax.nn.one_hot(assign, q, dtype=bool), axis=0)  # -1 rows → zero
        free_benefit = jnp.where(taken[None, :], NEG, benefit.T)  # (T, Q)
        need = valid & (assign < 0)
        pick_t = jnp.argmax(need)  # first unfilled target
        choice = jnp.argmax(free_benefit[pick_t])
        return jnp.where(
            need & (jnp.arange(t) == pick_t), choice, assign)

    assign = jax.lax.fori_loop(0, t, fill, assign)
    return jnp.where(valid, assign, -1).astype(jnp.int32)


@dataclass(frozen=True)
class HungarianMatcher:
    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    method: str = "auto"  # 'auto' | 'auction' | 'scipy'

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
        # Matching is not differentiated (standard DETR).
        cost = jax.lax.stop_gradient(cost)

        method = self.method
        if method == "auto":
            # host callbacks are unsupported on some TPU runtimes (axon
            # PJRT); the on-device auction keeps the step one XLA program
            method = "auction" if jax.default_backend() == "tpu" else "scipy"

        if method == "auction":
            src_idx = jax.vmap(auction_assign)(cost, valid)
        else:
            src_idx = jax.pure_callback(
                _host_assign,
                jax.ShapeDtypeStruct((b, t), jnp.int32),
                cost, valid,
                vmap_method="sequential",
            )
        return jnp.where(valid, src_idx, -1)
