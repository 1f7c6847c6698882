"""Positional encodings.

ConditionalPositionalEncoding: the CPVT/CPE-ViT PEG — a depthwise k×k conv
over the 2D token grid with the class token passing through untouched
(reference cpvt.py:16-30 / cpe_vit.py:16-30). NHWC layout; depthwise conv
lowers to a VPU-friendly XLA conv with feature_group_count = channels.

sincos_pos_embed: fixed 2D sin-cos embedding (used by the DETR detection
stack as an alternative to learned row/col embeddings).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConditionalPositionalEncoding(nn.Module):
    """Depthwise-conv PEG on (B, S, D) token sequences.

    If ``with_cls`` the first token is the class token and bypasses the conv;
    remaining S-1 tokens must form a square grid (reference asserts the
    same, cpvt.py:25).
    """

    kernel_size: int = 3
    with_cls: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, grid=None) -> jax.Array:
        b, s, d = tokens.shape
        if self.with_cls:
            cls, x = tokens[:, :1, :], tokens[:, 1:, :]
            n = s - 1
        else:
            cls, x = None, tokens
            n = s
        if grid is None:
            side = int(math.isqrt(n))
            assert side * side == n, (
                "Sequence length must be a perfect square"
                + (" minus one for the class token" if self.with_cls else "")
            )
            grid = (side, side)
        h, w = grid
        x = x.reshape(b, h, w, d)
        x = nn.Conv(
            d,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding="SAME",
            feature_group_count=d,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = x.reshape(b, n, d)
        if cls is not None:
            x = jnp.concatenate([cls, x], axis=1)
        return x


def sincos_pos_embed_2d(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """Fixed 2D sine-cosine positional embedding, (grid_h*grid_w, embed_dim)."""
    assert embed_dim % 4 == 0
    def _1d(dim, positions):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("p,d->pd", positions, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gy, gx = np.meshgrid(
        np.arange(grid_h, dtype=np.float64),
        np.arange(grid_w, dtype=np.float64),
        indexing="ij",
    )
    emb_h = _1d(embed_dim // 2, gy.reshape(-1))
    emb_w = _1d(embed_dim // 2, gx.reshape(-1))
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)
