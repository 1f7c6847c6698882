"""T2T-ViT: Tokens-to-Token ViT (TPU-native, with the T2T path actually wired).

Reference: models/image_classification/t2t_vit.py. The reference builds the
T2T module (:190-192) but its forward never calls it — it runs the plain conv
patch embed instead, so the T2T path is dead code with a typo
(``x.tranpose``, :159). Per SURVEY.md §2.9.4 this implements the *intended*
behavior: three soft-splits (7×7 s4 p2, then 3×3 s2 p1 twice,
t2t_vit.py:118-120) interleaved with token transformers or performers
(:122-133), a linear projection to the embed dim (:124), then the standard
ViT encoder + CLS head sized to the T2T token count.

Soft-splits are extracted with ``lax.conv_general_dilated_patches`` — an
im2col the TPU backend lowers efficiently; patch features feed the token
attention as one MXU contraction.

Constructor matches the reference (t2t_vit.py:171-177) including
``token_dim=64, token_type='performer'``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import trunc_normal_init, zeros_init
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.models.image_classification.token_performer import (
    TokenPerformer,
)
from vision_transformers_tpu.models.image_classification.token_transformer import (
    TokenTransformer,
)
from vision_transformers_tpu.models.image_classification.vanilla_vit import Encoder


def soft_split(x: jax.Array, kernel: int, stride: int, padding: int):
    """Unfold (B, H, W, C) → (tokens (B, N, k·k·C), out_grid)."""
    b, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kernel, kernel),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    _, oh, ow, f = patches.shape
    return patches.reshape(b, oh * ow, f), (oh, ow)


class T2T(nn.Module):
    """Tokens-to-token module (t2t_vit.py:112-142, intended semantics)."""

    image_size: int
    tokens_type: str
    embed_dim: int
    token_dim: int
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        b = images.shape[0]

        def attn_layer(dim, name):
            if self.tokens_type == "performer":
                return TokenPerformer(
                    dim=dim, in_dim=self.token_dim, kernel_ratio=0.5,
                    dtype=self.dtype, name=name,
                )
            return TokenTransformer(
                dim=dim, in_dim=self.token_dim, num_heads=1, mlp_ratio=1.0,
                dtype=self.dtype, name=name,
            )

        x, grid = soft_split(images, 7, 4, 2)
        x = attn_layer(self.in_channels * 7 * 7, "attention1")(
            x, deterministic=deterministic
        )
        x = x.reshape(b, grid[0], grid[1], self.token_dim)

        x, grid = soft_split(x, 3, 2, 1)
        x = attn_layer(self.token_dim * 3 * 3, "attention2")(
            x, deterministic=deterministic
        )
        x = x.reshape(b, grid[0], grid[1], self.token_dim)

        x, grid = soft_split(x, 3, 2, 1)
        x = nn.Dense(
            self.embed_dim,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="project",
        )(x)
        return x, grid


class T2T_ViT(nn.Module, TrainableModel):
    image_size: int
    patch_size: int  # accepted for signature parity; T2T defines the grid
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    token_dim: int = 64
    token_type: str = "performer"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # 3 soft-splits with strides 4, 2, 2 (t2t_vit.py:135)
        side = self.image_size // 16
        self.num_patches = side * side
        self.t2t = T2T(
            image_size=self.image_size, tokens_type=self.token_type,
            embed_dim=self.hidden_dim, token_dim=self.token_dim,
            dtype=self.dtype,
        )
        self.class_token = self.param(
            "class_token", zeros_init, (1, 1, self.hidden_dim)
        )
        self.encoder = Encoder(
            seq_length=self.num_patches + 1, num_layers=self.num_layers,
            num_heads=self.num_heads, hidden_dim=self.hidden_dim,
            mlp_dim=self.mlp_dim, dropout=self.dropout,
            attention_dropout=self.attention_dropout, dtype=self.dtype,
        )
        self.head = nn.Dense(
            self.num_classes, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="head",
        )

    def forward_features(self, images, *, deterministic: bool = True):
        n = images.shape[0]
        tokens, _ = self.t2t(images, deterministic=deterministic)
        cls = jnp.broadcast_to(
            self.class_token.astype(tokens.dtype), (n, 1, self.hidden_dim)
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        return self.encoder(tokens, deterministic=deterministic)

    def __call__(self, images, *, deterministic: bool = True):
        feats = self.forward_features(images, deterministic=deterministic)
        return self.head(feats[:, 0])


if __name__ == "__main__":
    # Reference-style entry point (vanilla_vit.py:311-324 pattern):
    # python -m vision_transformers_tpu.models.image_classification.t2t_vit
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("t2t_cifar100")
