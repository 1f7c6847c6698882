"""DeiT: Data-efficient image Transformer with knowledge distillation.

The reference outsources the distilled architecture to timm's
``VisionTransformerDistilled`` and uses a pretrained regnety_160 teacher
(deit.py:32-45); there is no timm (and no pretrained-weight egress) on TPU,
so the distilled ViT is implemented natively (SURVEY.md §7 step 7): class
token + distillation token, dual heads, ``set_distilled_training(True)``
semantics — training forward returns (cls_logits, dist_logits), eval forward
returns their mean (timm's deit eval behavior).

``train_model_with_distillation`` mirrors the reference loop (deit.py:36-137):
hard distillation by default (α=0.5, τ=5, deit.py:48-49), per-batch teacher
forward under stop-gradient, val/test phases with plain CE on the fused
logits. The teacher is injected — any (model, variables) pair or callable
images→logits — replacing the unavailable pretrained regnety
(SURVEY.md §7 hard parts: "checkpoint-injected teachers").
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import (
    trunc_normal_init,
    zeros_init,
)
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.models.image_classification.vanilla_vit import EncoderBlock
from vision_transformers_tpu.ops.patch_embed import PatchEmbed


class DeiT(nn.Module, TrainableModel):
    """Distilled ViT. With ``distilled_training=True`` the forward returns
    (cls_logits, dist_logits); otherwise the averaged logits."""

    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    embed_dim: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 100
    distilled_training: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # DeiT pads indivisible inputs up to the next patch multiple (the
        # reference feeds 32px into patch 16 via timm's dynamic padding).
        grid = -(-self.image_size // self.patch_size)
        self.num_patches = grid * grid
        self.patch_embed = PatchEmbed(
            self.embed_dim, self.patch_size, dtype=self.dtype
        )
        self.cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.embed_dim)
        )
        self.dist_token = self.param(
            "dist_token", trunc_normal_init(0.02), (1, 1, self.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_init(0.02),
            (1, self.num_patches + 2, self.embed_dim),
        )
        self.pos_drop = nn.Dropout(self.dropout)
        self.blocks = [
            EncoderBlock(
                self.num_heads, self.embed_dim,
                int(self.embed_dim * self.mlp_ratio),
                self.dropout, self.attention_dropout,
                dtype=self.dtype, name=f"block{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_f")
        self.head = nn.Dense(
            self.num_classes, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="head",
        )
        self.head_dist = nn.Dense(
            self.num_classes, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="head_dist",
        )

    def forward_features(self, images, *, deterministic: bool = True):
        n, h, w, c = images.shape
        p = self.patch_size
        if h % p or w % p:
            images = jnp.pad(
                images, ((0, 0), (0, (-h) % p), (0, (-w) % p), (0, 0))
            )
        tokens, _ = self.patch_embed(images)
        cls = jnp.broadcast_to(
            self.cls_token.astype(tokens.dtype), (n, 1, self.embed_dim))
        dist = jnp.broadcast_to(
            self.dist_token.astype(tokens.dtype), (n, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, dist, tokens], axis=1)
        tokens = tokens + self.pos_embed.astype(tokens.dtype)
        tokens = self.pos_drop(tokens, deterministic=deterministic)
        for block in self.blocks:
            tokens = block(tokens, deterministic=deterministic)
        return self.norm(tokens)

    def __call__(self, images, *, deterministic: bool = True):
        feats = self.forward_features(images, deterministic=deterministic)
        cls_logits = self.head(feats[:, 0])
        dist_logits = self.head_dist(feats[:, 1])
        if self.distilled_training and not deterministic:
            return cls_logits, dist_logits
        return (cls_logits + dist_logits) / 2.0

    # ------------------------------------------------------------------
    def train_model_with_distillation(
        self,
        train_loader,
        test_loader,
        epochs: int,
        val_loader=None,
        *,
        teacher: Union[Tuple, Callable, None] = None,
        distillation_type: str = "hard",
        alpha: float = 0.5,
        tau: float = 5.0,
        **fit_kwargs,
    ):
        """Reference-parity distillation surface (deit.py:36-137) as a thin
        wrapper over the shared trainer — it inherits steps_per_call
        chunking, mesh sharding and checkpointing from ``fit``.

        ``teacher``: (model, variables) or callable images→logits; must be
        supplied (no pretrained regnety in a TPU-clean env). Extra kwargs
        (lr, seed, verbose, mesh, steps_per_call, checkpoint_*) pass through
        to ``fit``."""
        from vision_transformers_tpu.training.trainer import fit

        if teacher is None:
            raise ValueError(
                "DeiT distillation needs an injected teacher: pass "
                "teacher=(model, variables) or a callable images->logits "
                "(no pretrained regnety available in a TPU-clean env)"
            )
        if callable(teacher) and not isinstance(teacher, tuple):
            teacher_fn = teacher
        else:
            t_model, t_vars = teacher
            teacher_fn = lambda x: t_model.apply(t_vars, x)

        # training forward must yield (cls_logits, dist_logits)
        model = self if self.distilled_training else self.clone(
            distilled_training=True)
        return fit(
            model, train_loader, test_loader, epochs, val_loader,
            teacher_fn=teacher_fn,
            distill=(distillation_type, alpha, tau),
            **fit_kwargs,
        )


if __name__ == "__main__":
    # Distilled training needs an injected teacher (no pretrained zoo on
    # TPU); the plain variant trains via the shared loop:
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("deit_tiny_cifar100")
