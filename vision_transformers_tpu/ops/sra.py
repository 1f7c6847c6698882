"""Spatial-Reduction Attention (PVT) and Twins' global sub-sampled variant.

Reference: pvt.py:42-85 — Q from all N tokens, K/V from tokens spatially
reduced by a stride-``sr_ratio`` conv (+LN), giving O(N²/r²) attention. Maps
to the shared flash kernel's cross-attention case (Sk = N/r² « Sq). The
reduction conv is a non-overlapping patch matmul (kernel == stride), so it is
expressed as space-to-depth + Dense — one MXU contraction, same trick as the
patch embed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import trunc_normal_init, zeros_init
from vision_transformers_tpu.ops.attention import dot_product_attention


class SpatialReductionAttention(nn.Module):
    """PVT SRA on (B, N, C) token sequences with grid (H, W).

    ``num_cls_tokens`` leading tokens (PVT's last stage prepends CLS) skip
    the spatial reduction — they are appended to the reduced K/V sequence so
    every query can still attend to them.
    """

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    num_cls_tokens: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid: Tuple[int, int], *, deterministic: bool = True):
        b, n, c = x.shape
        h_, w_ = grid
        heads = self.num_heads
        dh = c // heads
        assert dh * heads == c, f"dim {c} should be divided by num_heads {heads}."
        scale = self.qk_scale or dh ** -0.5

        dense = lambda f, name: nn.Dense(
            f, use_bias=self.qkv_bias if name in ("q", "kv") else True,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name=name,
        )

        q = dense(c, "q")(x).reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

        if self.sr_ratio > 1:
            ncls = self.num_cls_tokens
            cls, spatial = x[:, :ncls, :], x[:, ncls:, :]
            r = self.sr_ratio
            g = spatial.reshape(b, h_, w_, c)
            # stride-r r×r conv == space-to-depth + matmul (MXU-native)
            pad_h, pad_w = (-h_) % r, (-w_) % r
            if pad_h or pad_w:
                g = jnp.pad(g, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hh, ww = g.shape[1] // r, g.shape[2] // r
            g = g.reshape(b, hh, r, ww, r, c).transpose(0, 1, 3, 2, 4, 5)
            g = g.reshape(b, hh * ww, r * r * c)
            g = nn.Dense(
                c, kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
                dtype=self.dtype, name="sr",
            )(g)
            g = nn.LayerNorm(dtype=self.dtype, name="sr_norm")(g)
            kv_in = jnp.concatenate([cls, g], axis=1) if ncls else g
        else:
            kv_in = x

        kv = dense(2 * c, "kv")(kv_in)
        nk = kv_in.shape[1]
        kv = kv.reshape(b, nk, 2, heads, dh).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

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
