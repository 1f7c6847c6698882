"""TNT: Transformer-in-Transformer (TPU-native).

Reference: models/image_classification/tnt.py. Two token granularities:
"words" (inner tokens from a k7 conv over each p×p patch at stride
inner_stride, tnt.py:20-46) and "sentences" (outer tokens). Each block runs
inner attention+MLP over words, projects the concatenated words of each patch
into the outer token stream (added to all but CLS, tnt.py:160-162), then
outer attention+MLP with optional SE gating (tnt.py:68-86,164-167). Learned
inner/outer positional embeddings, trunc-normal 0.02 (tnt.py:190-194).

Defects implemented as intended, not ported (SURVEY.md §2.9.8): the
reference builds blocks/norm/head *inside* the layer loop (re-assigning each
iteration, tnt.py:200-224) and the ``idxs=[]`` inner-free branch is dead.
Here the stack is built once; ``inner_free_layers`` exposes the intended
inner_dim=-1 option.

Defaults match the reference __main__ run: image 32, patch 8, outer 512,
inner 48, 7 layers, 4+4 heads (tnt.py:171).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.core.initializers import trunc_normal_init, zeros_init
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.ops.layers import DropPath
from vision_transformers_tpu.ops.mlp import Mlp
from vision_transformers_tpu.ops.attention import dot_product_attention


class TNTAttention(nn.Module):
    """Separate QK (dim→hidden·2) and V (dim→dim) projections
    (tnt.py:89-118)."""

    dim: int
    hidden_dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        head_dim = self.hidden_dim // h
        v_head = c // h
        scale = self.qk_scale or head_dim ** -0.5

        qk = nn.Dense(
            2 * self.hidden_dim, use_bias=self.qkv_bias,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="qk",
        )(x).reshape(b, n, 2, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k = qk[0], qk[1]
        v = nn.Dense(
            c, use_bias=self.qkv_bias,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="v",
        )(x).reshape(b, n, h, v_head).transpose(0, 2, 1, 3)

        drop = 0.0 if deterministic else self.attn_drop
        rng = self.make_rng("dropout") if drop > 0.0 else None
        out = dot_product_attention(
            q, k, v, scale=scale, dropout_rate=drop, dropout_rng=rng
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(
            c, kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="proj",
        )(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SE(nn.Module):
    """Squeeze-excite over tokens: LN → Linear → ReLU → Linear → tanh gate
    (tnt.py:68-86)."""

    hidden_ratio: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a = jnp.mean(x, axis=1, keepdims=True)
        a = nn.LayerNorm(dtype=self.dtype)(a)
        a = nn.Dense(int(c * self.hidden_ratio),
                     kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
                     dtype=self.dtype)(a)
        a = nn.relu(a)
        a = nn.Dense(c, kernel_init=trunc_normal_init(0.02),
                     bias_init=zeros_init, dtype=self.dtype)(a)
        return jnp.tanh(a) * x


class TNTBlock(nn.Module):
    outer_dim: int
    inner_dim: int  # -1 disables the inner transformer
    outer_num_heads: int
    inner_num_heads: int
    num_words: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    se: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inner_tokens, outer_tokens, *, deterministic: bool = True):
        dp = DropPath(self.drop_path, name="drop_path")
        if self.inner_dim > 0:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="inner_norm1")(inner_tokens)
            y = TNTAttention(
                self.inner_dim, self.inner_dim, num_heads=self.inner_num_heads,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                attn_drop=self.attn_drop, proj_drop=self.drop,
                dtype=self.dtype, name="inner_attn",
            )(y, deterministic=deterministic)
            inner_tokens = inner_tokens + dp(y, deterministic=deterministic)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="inner_norm2")(inner_tokens)
            y = Mlp(
                hidden_dim=int(self.inner_dim * self.mlp_ratio),
                out_dim=self.inner_dim, dropout=self.drop,
                dtype=self.dtype, name="inner_mlp",
            )(y, deterministic=deterministic)
            inner_tokens = inner_tokens + dp(y, deterministic=deterministic)

            # fold words into their sentence token (tnt.py:160-162)
            b, n1, _ = outer_tokens.shape
            n_patches = n1 - 1
            words = inner_tokens.reshape(b, n_patches, -1)
            words = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="proj_norm1")(words)
            words = nn.Dense(
                self.outer_dim, use_bias=False,
                kernel_init=trunc_normal_init(0.02),
                dtype=self.dtype, name="proj",
            )(words)
            words = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="proj_norm2")(words)
            outer_tokens = jnp.concatenate(
                [outer_tokens[:, :1], outer_tokens[:, 1:] + words], axis=1
            )

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="outer_norm1")(outer_tokens)
        y = TNTAttention(
            self.outer_dim, self.outer_dim, num_heads=self.outer_num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            dtype=self.dtype, name="outer_attn",
        )(y, deterministic=deterministic)
        outer_tokens = outer_tokens + dp(y, deterministic=deterministic)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="outer_norm2")(outer_tokens)
        y = Mlp(
            hidden_dim=int(self.outer_dim * self.mlp_ratio),
            out_dim=self.outer_dim, dropout=self.drop,
            dtype=self.dtype, name="outer_mlp",
        )(y, deterministic=deterministic)
        if self.se > 0:
            y = y + SE(0.25, dtype=self.dtype, name="se_layer")(y)
        outer_tokens = outer_tokens + dp(y, deterministic=deterministic)
        return inner_tokens, outer_tokens


class TNT(nn.Module, TrainableModel):
    image_size: int = 32
    patch_size: int = 8
    num_classes: int = 100
    outer_dim: int = 512
    inner_dim: int = 48
    num_layers: int = 7
    outer_num_heads: int = 4
    inner_num_heads: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    dropout: float = 0.0
    attention_dropout: float = 0.0
    drop_path_rate: float = 0.0
    inner_stride: int = 4
    se: int = 0
    inner_free_layers: Sequence[int] = ()  # intended idxs option (tnt.py:201)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        b, h, w, c = images.shape
        p = self.patch_size
        assert h == self.image_size and w == self.image_size, \
            "Input Image and Expected size doesn't match"
        n_patches = (h // p) * (w // p)
        words_side = -(-p // self.inner_stride)  # ceil
        num_words = words_side * words_side

        # words: split into p×p patches, then k7 p3 stride-s conv per patch
        x = images.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * n_patches, p, p, c)
        inner = nn.Conv(
            self.inner_dim, kernel_size=(7, 7),
            strides=(self.inner_stride, self.inner_stride),
            padding=[(3, 3), (3, 3)], dtype=self.dtype, name="patch_proj",
        )(x)
        inner = inner.reshape(b * n_patches, num_words, self.inner_dim)

        inner_pos = self.param(
            "inner_pos", trunc_normal_init(0.02),
            (1, num_words, self.inner_dim),
        )
        inner = inner + inner_pos.astype(inner.dtype)

        words = inner.reshape(b, n_patches, num_words * self.inner_dim)
        words = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="proj_norm1")(words)
        outer = nn.Dense(
            self.outer_dim,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="proj",
        )(words)
        outer = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="proj_norm2")(outer)

        cls = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.outer_dim)
        )
        outer = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(outer.dtype), (b, 1, self.outer_dim)),
             outer], axis=1,
        )
        outer_pos = self.param(
            "outer_pos", trunc_normal_init(0.02),
            (1, n_patches + 1, self.outer_dim),
        )
        outer = outer + outer_pos.astype(outer.dtype)
        outer = nn.Dropout(self.dropout)(outer, deterministic=deterministic)

        dpr = np.linspace(0, self.drop_path_rate, self.num_layers)
        for i in range(self.num_layers):
            inner, outer = TNTBlock(
                outer_dim=self.outer_dim,
                inner_dim=-1 if i in self.inner_free_layers else self.inner_dim,
                outer_num_heads=self.outer_num_heads,
                inner_num_heads=self.inner_num_heads,
                num_words=num_words, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.dropout, attn_drop=self.attention_dropout,
                drop_path=float(dpr[i]), se=self.se,
                dtype=self.dtype, name=f"block{i}",
            )(inner, outer, deterministic=deterministic)

        outer = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(outer)
        feats = outer[:, 0]
        if self.num_classes > 0:
            return nn.Dense(
                self.num_classes,
                kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
                dtype=self.dtype, name="head",
            )(feats)
        return feats


if __name__ == "__main__":
    # Reference-style entry point (vanilla_vit.py:311-324 pattern):
    # python -m vision_transformers_tpu.models.image_classification.tnt
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("tnt_cifar100")
