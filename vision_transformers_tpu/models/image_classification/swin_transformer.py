"""Swin Transformer (TPU-native).

Same capability surface as the reference's torchvision-derived Swin
(models/image_classification/swin_transformer.py:233-303): conv patch embed
+ LN, 4 stages of SwinTransformerBlocks (alternating shift 0 / window//2,
swin_transformer.py:269), PatchMerging between stages, per-block stochastic
depth with a linear schedule over total depth (swin_transformer.py:266-267),
final LN → global average pool → linear head. Linear weights trunc-normal
0.02, zero bias (swin_transformer.py:290-293); block MLPs xavier + 1e-6 bias
(swin_transformer.py:222-226). Feature maps are NHWC end-to-end — the
reference's Permute layers (NCHW↔NHWC) have no equivalent here.

Constructor signature matches the reference:
``SwinTransformer(patch_size, embed_dim, depths, num_heads, window_size,
mlp_ratio, dropout, attention_dropout, stochastic_depth_prob, num_classes)``
(plus ``image_size`` accepted for args-registry compatibility).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import trunc_normal_init, zeros_init
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.ops.layers import DropPath
from vision_transformers_tpu.ops.mlp import MLPBlock
from vision_transformers_tpu.ops.windows import (
    PatchMerging,
    PatchMergingV2,
    ShiftedWindowAttention,
    ShiftedWindowAttentionV2,
)


class SwinTransformerBlock(nn.Module):
    """x + SD(attn(LN x)); x + SD(mlp(LN x)) (swin_transformer.py:206-230).
    Operates on (B, H, W, C) feature maps."""

    dim: int
    num_heads: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    stochastic_depth_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        sd = DropPath(self.stochastic_depth_prob, name="stochastic_depth")
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = ShiftedWindowAttention(
            self.dim, self.window_size, self.shift_size, self.num_heads,
            attention_dropout=self.attention_dropout, dropout=self.dropout,
            dtype=self.dtype, name="attn",
        )(y, deterministic=deterministic)
        x = x + sd(y, deterministic=deterministic)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = MLPBlock(
            int(self.dim * self.mlp_ratio), dropout=self.dropout,
            dtype=self.dtype, name="mlp",
        )(y, deterministic=deterministic)
        return x + sd(y, deterministic=deterministic)


class SwinTransformerBlockV2(nn.Module):
    """SwinV2 post-norm block: x + SD(LN(attn(x))); x + SD(LN(mlp(x)))
    (torchvision SwinTransformerBlockV2). The reference registers
    ``swinv2_*`` presets with no model behind them (utils/args.py:29-41,
    SURVEY §2.9.9) — this completes the intent."""

    dim: int
    num_heads: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    stochastic_depth_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        sd = DropPath(self.stochastic_depth_prob, name="stochastic_depth")
        y = ShiftedWindowAttentionV2(
            self.dim, self.window_size, self.shift_size, self.num_heads,
            attention_dropout=self.attention_dropout, dropout=self.dropout,
            dtype=self.dtype, name="attn",
        )(x, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(y)
        x = x + sd(y, deterministic=deterministic)

        y = MLPBlock(
            int(self.dim * self.mlp_ratio), dropout=self.dropout,
            dtype=self.dtype, name="mlp",
        )(x, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
        return x + sd(y, deterministic=deterministic)


class SwinTransformer(nn.Module, TrainableModel):
    patch_size: List[int]
    embed_dim: int
    depths: List[int]
    num_heads: List[int]
    window_size: List[int]
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    stochastic_depth_prob: float = 0.1
    num_classes: int = 100
    image_size: Optional[int] = None  # accepted for get_args compatibility
    v2: bool = False  # SwinV2: cosine attention + CPB-MLP + post-norm
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        ph, pw = self.patch_size
        x = nn.Conv(
            self.embed_dim, kernel_size=(ph, pw), strides=(ph, pw),
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="patch_embed",
        )(images)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        block_cls = SwinTransformerBlockV2 if self.v2 else SwinTransformerBlock
        merge_cls = PatchMergingV2 if self.v2 else PatchMerging
        total_blocks = sum(self.depths)
        block_id = 0
        for i_stage, depth in enumerate(self.depths):
            dim = self.embed_dim * 2 ** i_stage
            for i_layer in range(depth):
                sd_prob = (
                    self.stochastic_depth_prob * float(block_id)
                    / max(total_blocks - 1, 1)
                )
                shift = [
                    0 if i_layer % 2 == 0 else w // 2 for w in self.window_size
                ]
                x = block_cls(
                    dim, self.num_heads[i_stage],
                    window_size=self.window_size, shift_size=shift,
                    mlp_ratio=self.mlp_ratio, dropout=self.dropout,
                    attention_dropout=self.attention_dropout,
                    stochastic_depth_prob=sd_prob, dtype=self.dtype,
                    name=f"stage{i_stage}_block{i_layer}",
                )(x, deterministic=deterministic)
                block_id += 1
            if i_stage < len(self.depths) - 1:
                x = merge_cls(dtype=self.dtype, name=f"merge{i_stage}")(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool over H, W
        return nn.Dense(
            self.num_classes,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="head",
        )(x)


class SwinTransformerV2(SwinTransformer):
    """SwinV2 (cosine attention, continuous position bias MLP, post-norm,
    PatchMergingV2). Fills the reference's ``swinv2_*`` preset names
    (utils/args.py:29-41) that had no model behind them."""

    v2: bool = True


if __name__ == "__main__":
    # Reference-style entry point (vanilla_vit.py:311-324 pattern):
    # python -m vision_transformers_tpu.models.image_classification.swin_transformer
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("swin_tiny_cifar100")
