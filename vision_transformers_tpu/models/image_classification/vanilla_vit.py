"""Vanilla Vision Transformer (TPU-native).

Same architecture and capability surface as the reference's torchvision-derived
ViT (models/image_classification/vanilla_vit.py:109-215): conv patch embed
(here an explicit MXU matmul, ops/patch_embed.py), learnable class token,
learned absolute positional embedding N(0, .02), pre-LN encoder blocks
(LN → MHA → dropout → residual; LN → GELU-MLP → residual,
vanilla_vit.py:73-83), final LN, CLS-token linear head (zero-init,
vanilla_vit.py:149-151).

Constructor signature matches the reference:
``ViT(image_size, patch_size, num_layers, num_heads, hidden_dim, mlp_dim,
dropout, attention_dropout, num_classes)``; inputs are NHWC.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import normal_init, zeros_init
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.ops.attention import SelfAttention
from vision_transformers_tpu.ops.flash_attention import (
    fused_attention_block,
    fused_block_supported,
)
from vision_transformers_tpu.ops.mlp import MLPBlock
from vision_transformers_tpu.ops.patch_embed import PatchEmbed


# Measured on v5e (ViT-B/16 @224, bench.py): routing inference through the
# fused LN+QKV+attn+out+residual kernel REGRESSED end-to-end throughput,
# 4173 -> 3863 img/s, despite winning the isolated sub-block comparison
# (benchmarks/attn_fused_block.py: 2.39 vs 2.62 ms/layer). In the full
# model XLA already fuses the LN/projection epilogues around the packed
# kernel better than the standalone baseline, and the b_blk=1 fused grid
# forfeits that overlap. Kept as an optimization valve.
USE_FUSED_BLOCK = False


class EncoderBlock(nn.Module):
    """Pre-LN transformer encoder block (vanilla_vit.py:59-83)."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant8: bool = False  # serving-time w8a8 projections/MLP (ops/quant.py)

    def _use_fused_block(self, x, deterministic, return_weights) -> bool:
        return (
            USE_FUSED_BLOCK
            and not self.quant8  # fused kernel reads fp kernels
            and deterministic
            and not return_weights
            and not self.is_initializing()   # modular path creates params
            and jax.default_backend() == "tpu"
            and x.ndim == 3
            and fused_block_supported(
                x.shape[1], self.hidden_dim, jnp.dtype(self.dtype).itemsize)
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_weights: bool = False):
        weights = None
        if self._use_fused_block(x, deterministic, return_weights):
            # Inference fast path: LN1 + QKV + attention + out-proj +
            # residual as ONE Pallas program with VMEM-resident weights
            # (flash_attention.py "Fused attention sub-block" note).
            # Reads the same params the modular path creates.
            ln_p = self.get_variable("params", "ln_1")
            at_p = self.get_variable("params", "self_attention")
            dh = self.hidden_dim // self.num_heads
            x = fused_attention_block(
                x,
                ln_p["scale"].astype(jnp.float32).reshape(1, -1),
                ln_p["bias"].astype(jnp.float32).reshape(1, -1),
                at_p["qkv"]["kernel"].astype(self.dtype),
                at_p["qkv"]["bias"].astype(jnp.float32).reshape(1, -1),
                at_p["out"]["kernel"].astype(self.dtype),
                at_p["out"]["bias"].astype(jnp.float32).reshape(1, -1),
                self.num_heads, 1.0 / (dh ** 0.5),
            )
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_1")(x)
            attn = SelfAttention(
                self.hidden_dim, self.num_heads,
                attention_dropout=self.attention_dropout,
                dtype=self.dtype, quant8=self.quant8,
                name="self_attention",
            )
            if return_weights:
                y, weights = attn(y, deterministic=deterministic,
                                  return_weights=True)
            else:
                y = attn(y, deterministic=deterministic)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = x + y

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_2")(x)
        y = MLPBlock(self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
                     quant8=self.quant8, name="mlp")(
            y, deterministic=deterministic
        )
        out = x + y
        if return_weights:
            return out, weights
        return out


class Encoder(nn.Module):
    """Stack of encoder blocks with learned absolute pos-embed
    (vanilla_vit.py:86-106)."""

    seq_length: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    remat: bool = False  # rematerialize blocks: FLOPs for activation memory
    dtype: jnp.dtype = jnp.float32
    quant8: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_weights: bool = False):
        pos = self.param(
            "pos_embedding", normal_init(0.02),
            (1, self.seq_length, self.hidden_dim),
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        block_cls = EncoderBlock
        if self.remat and not return_weights:
            # jax.checkpoint per block (SURVEY.md: trade FLOPs for HBM);
            # flag args passed positionally and marked static.
            block_cls = nn.remat(EncoderBlock, static_argnums=(2, 3))
        all_weights = []
        for i in range(self.num_layers):
            block = block_cls(
                self.num_heads, self.hidden_dim, self.mlp_dim,
                self.dropout, self.attention_dropout,
                dtype=self.dtype, quant8=self.quant8,
                name=f"encoder_layer_{i}",
            )
            if return_weights:
                x, w = block(x, deterministic, True)
                all_weights.append(w)
            else:
                x = block(x, deterministic, False)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        if return_weights:
            return x, all_weights
        return x


class ViT(nn.Module, TrainableModel):
    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    quant8: bool = False  # serving-time w8a8 encoder (ops/quant.py)

    def setup(self):
        assert self.image_size % self.patch_size == 0, \
            "Input shape indivisible by patch size!"
        seq_length = (self.image_size // self.patch_size) ** 2 + 1
        self.conv_proj = PatchEmbed(
            self.hidden_dim, self.patch_size, dtype=self.dtype
        )
        self.class_token = self.param(
            "class_token", zeros_init, (1, 1, self.hidden_dim)
        )
        self.encoder = Encoder(
            seq_length=seq_length,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            remat=self.remat,
            dtype=self.dtype,
            quant8=self.quant8,
        )
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="head",
        )

    def forward_features(self, images, *, deterministic: bool = True,
                         return_weights: bool = False):
        n = images.shape[0]
        tokens, _ = self.conv_proj(images)
        cls = jnp.broadcast_to(
            self.class_token.astype(tokens.dtype), (n, 1, self.hidden_dim)
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        return self.encoder(
            tokens, deterministic=deterministic, return_weights=return_weights
        )

    def __call__(self, images, *, deterministic: bool = True,
                 return_weights: bool = False):
        if return_weights:
            feats, weights = self.forward_features(
                images, deterministic=deterministic, return_weights=True
            )
            return self.head(feats[:, 0]), weights
        feats = self.forward_features(images, deterministic=deterministic)
        return self.head(feats[:, 0])


if __name__ == "__main__":
    # Reference-style entry point (vanilla_vit.py:311-324 pattern):
    # python -m vision_transformers_tpu.models.image_classification.vanilla_vit
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("vit_tiny_cifar100")
