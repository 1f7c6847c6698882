"""DETR assembly (completed — the reference stops mid-forward).

Reference surface (models/object_detection/detr.py): ``Joiner``
(backbone ⊕ positional encoding over padded batches, detr.py:16-30),
``AbsolutePositionalEncoding`` (learned row/col embeddings, detr.py:33-63),
``build_backbone`` (detr.py:66-91), box ``MLP`` head (detr.py:94-105) and
the ``Detr`` model (1×1 input projection, class Linear(num_classes+1),
3-layer box MLP → 4 sigmoid coords, learned query embeddings,
detr.py:108-127). The reference's forward prints shapes and the file ends in
a syntax error (detr.py:129-134,155 — SURVEY.md §2.9.2); here the model is
complete: backbone → pos-enc → input-proj → transformer → heads, returning
{'pred_logits', 'pred_boxes', 'aux_outputs'}.

Also provides ``SinePositionalEncoding`` (the DETR paper default) and a
``PostProcess`` converting outputs to COCO-style scored xyxy boxes.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import xavier_uniform_init, zeros_init
from vision_transformers_tpu.models.object_detection.backbone import build_backbone
from vision_transformers_tpu.models.object_detection.transformer import Transformer
from vision_transformers_tpu.utils.coco.util.box_ops import box_cxcywh_to_xyxy


class AbsolutePositionalEncoding(nn.Module):
    """Learned row/col embeddings, uniform init (detr.py:33-63). Emits
    (B, H, W, 2·positional_features) NHWC."""

    positional_features: int = 256
    max_size: int = 50

    @nn.compact
    def __call__(self, feature_map: jax.Array, mask=None) -> jax.Array:
        b, h, w, _ = feature_map.shape
        row = self.param(
            "row_embed", nn.initializers.uniform(1.0),
            (self.max_size, self.positional_features))
        col = self.param(
            "col_embed", nn.initializers.uniform(1.0),
            (self.max_size, self.positional_features))
        x_emb = jnp.broadcast_to(
            col[None, :w, :], (h, w, self.positional_features))
        y_emb = jnp.broadcast_to(
            row[:h, None, :], (h, w, self.positional_features))
        pos = jnp.concatenate([x_emb, y_emb], axis=-1)
        return jnp.broadcast_to(pos[None], (b, h, w, pos.shape[-1]))


class SinePositionalEncoding(nn.Module):
    """Fixed sine pos-enc normalized by the unpadded extent (DETR default);
    mask-aware so padded regions get no phantom positions."""

    num_pos_feats: int = 128
    temperature: float = 10000.0

    @nn.compact
    def __call__(self, feature_map: jax.Array, mask=None) -> jax.Array:
        b, h, w, _ = feature_map.shape
        if mask is None:
            not_mask = jnp.ones((b, h, w), jnp.float32)
        else:
            not_mask = (~mask).astype(jnp.float32)
        y_embed = jnp.cumsum(not_mask, axis=1)
        x_embed = jnp.cumsum(not_mask, axis=2)
        eps = 1e-6
        scale = 2 * math.pi
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)
        pos_x = x_embed[..., None] / dim_t
        pos_y = y_embed[..., None] / dim_t
        pos_x = jnp.stack(
            [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
        ).reshape(b, h, w, -1)
        pos_y = jnp.stack(
            [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
        ).reshape(b, h, w, -1)
        return jnp.concatenate([pos_y, pos_x], axis=-1)


class Joiner(nn.Module):
    """backbone ⊕ positional encoding (detr.py:16-30): returns per-level
    ((features, mask), pos) with masks downsampled to each feature map."""

    backbone: nn.Module
    position_embedding: nn.Module

    def __call__(self, images: jax.Array, mask=None):
        xs = self.backbone(images)
        out, pos = [], []
        for name in sorted(xs):
            x = xs[name]
            if mask is not None:
                m = jax.image.resize(
                    mask.astype(jnp.float32),
                    (mask.shape[0], x.shape[1], x.shape[2]), "nearest",
                ).astype(bool)
            else:
                m = jnp.zeros((x.shape[0], x.shape[1], x.shape[2]), bool)
            out.append((x, m))
            pos.append(self.position_embedding(x, m).astype(x.dtype))
        return out, pos


class MLP(nn.Module):
    """ReLU MLP head (detr.py:94-105)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(
                self.output_dim if last else self.hidden_dim,
                kernel_init=xavier_uniform_init(), bias_init=zeros_init,
                dtype=self.dtype, name=f"layer{i}",
            )(x)
            if not last:
                x = nn.relu(x)
        return x


class Detr(nn.Module):
    """Complete DETR (detr.py:108-134 intent).

    ``__call__(images NHWC, pixel_mask (B,H,W) True=pad)`` →
    {'pred_logits' (B, Q, num_classes+1), 'pred_boxes' (B, Q, 4) cxcywh in
    [0,1], 'aux_outputs': [...]}.
    """

    num_classes: int
    num_queries: int = 100
    hidden_dim: int = 256
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    aux_loss: bool = False
    backbone_arch: str = "resnet50"  # 'resnet50' (reference) | 'vit'
    backbone_norm: str = "frozen_bn"
    position_embedding: str = "sine"  # 'sine' | 'learned'
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        backbone, num_channels = build_backbone(
            arch=self.backbone_arch,
            norm=self.backbone_norm, return_interm_layers=True,
            dtype=self.dtype)
        if self.position_embedding == "learned":
            pos = AbsolutePositionalEncoding(self.hidden_dim // 2)
        else:
            pos = SinePositionalEncoding(self.hidden_dim // 2)
        self.joiner = Joiner(backbone, pos)
        self.num_channels = num_channels
        self.input_proj = nn.Conv(
            self.hidden_dim, (1, 1), dtype=self.dtype, name="input_proj")
        self.transformer = Transformer(
            d_model=self.hidden_dim, nhead=self.nheads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            return_intermediate_dec=self.aux_loss, dtype=self.dtype)
        self.class_embed = nn.Dense(
            self.num_classes + 1, kernel_init=xavier_uniform_init(),
            bias_init=zeros_init, dtype=self.dtype)
        self.bbox_embed = MLP(self.hidden_dim, 4, 3, dtype=self.dtype)
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))

    def __call__(self, images, pixel_mask=None, *, deterministic: bool = True):
        features, pos = self.joiner(images, pixel_mask)
        src, mask = features[-1]          # C5 (dilated stride-16) level
        hs, _ = self.transformer(
            self.input_proj(src), mask, self.query_embed, pos[-1],
            deterministic=deterministic)
        logits = self.class_embed(hs)      # (L|1, B, Q, C+1)
        boxes = nn.sigmoid(self.bbox_embed(hs))
        out = {"pred_logits": logits[-1], "pred_boxes": boxes[-1]}
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[i], "pred_boxes": boxes[i]}
                for i in range(logits.shape[0] - 1)
            ]
        return out


class PostProcess:
    """Outputs → per-image COCO-style {scores, labels, boxes xyxy abs}."""

    def __call__(self, outputs: Dict, target_sizes: jnp.ndarray):
        logits = outputs["pred_logits"]
        boxes = outputs["pred_boxes"]
        prob = jax.nn.softmax(logits, axis=-1)
        scores = jnp.max(prob[..., :-1], axis=-1)
        labels = jnp.argmax(prob[..., :-1], axis=-1)
        xyxy = box_cxcywh_to_xyxy(boxes)
        h, w = target_sizes[:, 0], target_sizes[:, 1]
        scale = jnp.stack([w, h, w, h], axis=1)[:, None, :]
        xyxy = xyxy * scale
        return [
            {"scores": scores[i], "labels": labels[i], "boxes": xyxy[i]}
            for i in range(logits.shape[0])
        ]


def set_model_and_positional_embeddings(num_classes: int, num_queries: int = 100,
                                        **kwargs) -> Detr:
    """Reference-surface factory (detr.py:138-155 intent, completed)."""
    return Detr(num_classes=num_classes, num_queries=num_queries, **kwargs)
