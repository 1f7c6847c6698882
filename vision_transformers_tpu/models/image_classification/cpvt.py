"""CPVT and CPVT-GAP (Conditional Positional Vision Transformer).

Reference: models/image_classification/cpvt.py and cpvt_gap.py. CPVT removes
the learned absolute pos-embed entirely (cpvt.py:99-115 Encoder has none);
position information comes from a depthwise-conv CPE applied once after the
class token is attached (cpvt.py:144,184) plus a PEG (same module) at the
end of every encoder block (cpvt.py:80,94).

Defects implemented as intended behavior, not ported (SURVEY.md §2.9):
- cpvt.py:93-96 returns ``x + y`` after already adding the MLP branch into
  ``x`` (double-counted residual). Here the block is the standard
  attn-residual → mlp-residual → PEG.
- cpvt_gap.py:149,191-196 constructs an AdaptiveAvgPool1d GAP head but still
  reads the CLS token. CPVTGAP here actually global-average-pools the patch
  tokens (the paper's point — translation-invariant head).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import zeros_init
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.ops.attention import SelfAttention
from vision_transformers_tpu.ops.mlp import MLPBlock
from vision_transformers_tpu.ops.patch_embed import PatchEmbed
from vision_transformers_tpu.ops.posenc import ConditionalPositionalEncoding


class PEGEncoderBlock(nn.Module):
    """Pre-LN encoder block with a PEG after the MLP residual (cpvt.py:68-96,
    intended semantics)."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_1")(x)
        y = SelfAttention(
            self.hidden_dim, self.num_heads,
            attention_dropout=self.attention_dropout,
            dtype=self.dtype, name="self_attention",
        )(y, deterministic=deterministic)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = x + y

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_2")(x)
        y = MLPBlock(self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
                     name="mlp")(y, deterministic=deterministic)
        x = x + y
        return ConditionalPositionalEncoding(dtype=self.dtype, name="peg")(x)


class _CPVTBase(nn.Module, TrainableModel):
    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.image_size % self.patch_size == 0, \
            "Input shape indivisible by patch size!"
        self.conv_proj = PatchEmbed(self.hidden_dim, self.patch_size,
                                    dtype=self.dtype)
        self.class_token = self.param(
            "class_token", zeros_init, (1, 1, self.hidden_dim)
        )
        self.pos_embedding = ConditionalPositionalEncoding(dtype=self.dtype)
        self.input_dropout = nn.Dropout(self.dropout)
        self.blocks = [
            PEGEncoderBlock(
                self.num_heads, self.hidden_dim, self.mlp_dim,
                self.dropout, self.attention_dropout,
                dtype=self.dtype, name=f"encoder_layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")
        self.head = nn.Dense(
            self.num_classes, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="head",
        )

    def forward_features(self, images, *, deterministic: bool = True):
        n = images.shape[0]
        tokens, _ = self.conv_proj(images)
        cls = jnp.broadcast_to(
            self.class_token.astype(tokens.dtype), (n, 1, self.hidden_dim)
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = self.pos_embedding(tokens)  # CPE once, before the encoder
        tokens = self.input_dropout(tokens, deterministic=deterministic)
        for block in self.blocks:
            tokens = block(tokens, deterministic=deterministic)
        return self.ln(tokens)


class CPVT(_CPVTBase):
    """CLS-token head (cpvt.py:190-196)."""

    def __call__(self, images, *, deterministic: bool = True):
        feats = self.forward_features(images, deterministic=deterministic)
        return self.head(feats[:, 0])


class CPVTGAP(_CPVTBase):
    """Global-average-pool head over patch tokens (cpvt_gap.py intent)."""

    def __call__(self, images, *, deterministic: bool = True):
        feats = self.forward_features(images, deterministic=deterministic)
        return self.head(jnp.mean(feats[:, 1:], axis=1))


if __name__ == "__main__":
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("cpvt_cifar100")
