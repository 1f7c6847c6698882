"""T2T token transformer: attention block with dim→in_dim projection and
V-as-skip-connection.

Reference: models/image_classification/token_transformer.py:28-75 — qkv
projects dim → 3·in_dim (head dim = in_dim, heads=1 in practice), softmax
scale uses sqrt(dim/num_heads) of the *input* dim, output adds V as the skip
(the input has a different width, token_transformer.py:56), then a standard
MLP residual.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import trunc_normal_init, zeros_init
from vision_transformers_tpu.ops.attention import dot_product_attention
from vision_transformers_tpu.ops.layers import DropPath
from vision_transformers_tpu.ops.mlp import Mlp


class TokenAttention(nn.Module):
    dim: int
    in_dim: int
    num_heads: int = 1
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, _ = x.shape
        h = self.num_heads
        # scale from the INPUT dim per head (token_transformer.py:33-34)
        scale = self.qk_scale or (self.dim // h) ** -0.5

        qkv = nn.Dense(
            3 * h * self.in_dim, use_bias=self.qkv_bias,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="qkv",
        )(x)
        qkv = qkv.reshape(b, n, 3, h, self.in_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        drop = 0.0 if deterministic else self.attn_drop
        rng = self.make_rng("dropout") if drop > 0.0 else None
        out = dot_product_attention(
            q, k, v, scale=scale, dropout_rate=drop, dropout_rng=rng
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * self.in_dim)
        out = nn.Dense(
            h * self.in_dim,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="proj",
        )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        # V skip connection (heads folded back, token_transformer.py:56)
        return v.transpose(0, 2, 1, 3).reshape(b, n, h * self.in_dim) + out


class TokenTransformer(nn.Module):
    """attn(LN x) [no residual]; x + DP(MLP(LN x))
    (token_transformer.py:71-74)."""

    dim: int
    in_dim: int
    num_heads: int = 1
    mlp_ratio: float = 1.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = TokenAttention(
            self.dim, self.in_dim, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            dtype=self.dtype, name="attn",
        )(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden_dim=int(self.in_dim * self.mlp_ratio),
            out_dim=self.in_dim, dropout=self.drop,
            dtype=self.dtype, name="mlp",
        )(y, deterministic=deterministic)
        return x + DropPath(self.drop_path, name="drop_path")(
            y, deterministic=deterministic
        )
