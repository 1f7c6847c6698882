"""CPE-ViT: vanilla ViT plus a single Conditional Positional Encoding.

Reference: models/image_classification/cpe_vit.py — the depthwise-conv CPE
is applied once after the class token is attached (cpe_vit.py:143,182),
*in addition to* the encoder's learned absolute pos-embed
(cpe_vit.py:101,112). Reuses the vanilla ViT encoder unchanged.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import zeros_init
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.models.image_classification.vanilla_vit import Encoder
from vision_transformers_tpu.ops.patch_embed import PatchEmbed
from vision_transformers_tpu.ops.posenc import ConditionalPositionalEncoding


class CPEViT(nn.Module, TrainableModel):
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
        seq_length = (self.image_size // self.patch_size) ** 2 + 1
        self.conv_proj = PatchEmbed(self.hidden_dim, self.patch_size,
                                    dtype=self.dtype)
        self.class_token = self.param(
            "class_token", zeros_init, (1, 1, self.hidden_dim)
        )
        self.pos_embedding = ConditionalPositionalEncoding(dtype=self.dtype)
        self.encoder = Encoder(
            seq_length=seq_length, num_layers=self.num_layers,
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
        tokens, _ = self.conv_proj(images)
        cls = jnp.broadcast_to(
            self.class_token.astype(tokens.dtype), (n, 1, self.hidden_dim)
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = self.pos_embedding(tokens)  # CPE, then learned pos-embed in Encoder
        return self.encoder(tokens, deterministic=deterministic)

    def __call__(self, images, *, deterministic: bool = True):
        feats = self.forward_features(images, deterministic=deterministic)
        return self.head(feats[:, 0])


if __name__ == "__main__":
    # Reference-style entry point (vanilla_vit.py:311-324 pattern):
    # python -m vision_transformers_tpu.models.image_classification.cpe_vit
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("cpevit_cifar100")
