"""Twins-SVT (TPU-native).

Reference: models/image_classification/twin-svt.py:170-263 — 3 stages
(CIFAR config) of per-stage conv PatchEmbed + LN, blocks alternating
**LSA** (locally-grouped window attention, even blocks, ws=wss[k],
twin-svt.py:108-148) and **GSA** (global sub-sampled attention = SRA with
sr_ratio, odd blocks, twin-svt.py:59-105), a PosCNN PEG applied after each
stage's first block (twin-svt.py:241-243), final LN → GAP → head. Defaults
embed_dims [64,128,256], heads [1,2,4], depths [4,4,4], sr_ratios [4,2,1],
wss [7,7,7].

Defects fixed as intended behavior (SURVEY.md §2.9.7):
- PosCNN has no ``forward`` in the reference (crashes when called,
  twin-svt.py:51-56) — implemented here as the real Twins PEG: depthwise
  3×3 conv with residual.
- ``self.norm`` is used but never defined (twin-svt.py:256) — defined here
  as LayerNorm(embed_dims[-1]).
- LSA requires the grid to divide the window in the reference (crashes on
  the 8×8 grid with ws=7); here edge windows are padded and the padded
  keys masked (real-Twins semantics, ops/windows.edge_pad_key_mask).

LSA reuses the windowed flash-attention path (no shift, no relative bias);
GSA reuses the PVT SpatialReductionAttention.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.core.initializers import trunc_normal_init, zeros_init
from vision_transformers_tpu.models.image_classification.base import TrainableModel
from vision_transformers_tpu.ops.layers import DropPath
from vision_transformers_tpu.ops.mlp import Mlp
from vision_transformers_tpu.ops.patch_embed import PatchEmbed
from vision_transformers_tpu.ops.sra import SpatialReductionAttention
from vision_transformers_tpu.ops.windows import shifted_window_attention


class PosCNN(nn.Module):
    """Twins PEG: depthwise 3×3 conv over the token grid, residual add
    (intended behavior of twin-svt.py:51-56)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid):
        b, n, c = x.shape
        h, w = grid
        g = x.reshape(b, h, w, c)
        y = nn.Conv(
            c, kernel_size=(3, 3), padding="SAME", feature_group_count=c,
            dtype=self.dtype, name="proj",
        )(g)
        return (y + g).reshape(b, n, c)


class GroupAttention(nn.Module):
    """LSA: window attention without shift or relative bias
    (twin-svt.py:108-148), padded edge windows masked."""

    dim: int
    num_heads: int
    ws: int
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid, *, deterministic: bool = True):
        b, n, c = x.shape
        h, w = grid
        qkv_kernel = self.param(
            "qkv_kernel", trunc_normal_init(0.02), (c, 3 * c))
        qkv_b = (
            self.param("qkv_bias_p", zeros_init, (3 * c,))
            if self.qkv_bias else None
        )
        proj_kernel = self.param(
            "proj_kernel", trunc_normal_init(0.02), (c, c))
        proj_b = self.param("proj_bias_p", zeros_init, (c,))

        rng = None
        if not deterministic and self.attn_drop > 0.0:
            rng = self.make_rng("dropout")
        out = shifted_window_attention(
            x.reshape(b, h, w, c).astype(self.dtype),
            qkv_kernel.astype(self.dtype),
            None if qkv_b is None else qkv_b.astype(self.dtype),
            proj_kernel.astype(self.dtype),
            proj_b.astype(self.dtype),
            None,
            (self.ws, self.ws), self.num_heads, (0, 0),
            attention_dropout=self.attn_drop,
            deterministic=deterministic, dropout_rng=rng,
            mask_padding=True,
        ).reshape(b, n, c)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class GroupBlock(nn.Module):
    """LSA (ws>1) or GSA (ws==1) + MLP, pre-LN, drop-path
    (twin-svt.py:151-167)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    sr_ratio: int = 1
    ws: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid, *, deterministic: bool = True):
        dp = DropPath(self.drop_path, name="drop_path")
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.ws == 1:
            y = SpatialReductionAttention(
                self.dim, self.num_heads, sr_ratio=self.sr_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                attn_drop=self.attn_drop, proj_drop=self.drop,
                dtype=self.dtype, name="attn",
            )(y, grid, deterministic=deterministic)
        else:
            y = GroupAttention(
                self.dim, self.num_heads, ws=self.ws,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                attn_drop=self.attn_drop, proj_drop=self.drop,
                dtype=self.dtype, name="attn",
            )(y, grid, deterministic=deterministic)
        x = x + dp(y, deterministic=deterministic)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio), dropout=self.drop,
            dtype=self.dtype, name="mlp",
        )(y, deterministic=deterministic)
        return x + dp(y, deterministic=deterministic)


class TwinSVT(nn.Module, TrainableModel):
    img_size: int = 32
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 100
    embed_dims: Optional[List[int]] = None
    num_heads: Optional[List[int]] = None
    mlp_ratios: Optional[List[float]] = None
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    depths: Optional[List[int]] = None
    sr_ratios: Optional[List[int]] = None
    wss: Optional[List[int]] = None
    dtype: jnp.dtype = jnp.float32

    def _cfg(self):
        return (
            self.embed_dims or [64, 128, 256],
            self.num_heads or [1, 2, 4],
            self.mlp_ratios or [4, 4, 4],
            self.depths or [4, 4, 4],
            self.sr_ratios or [4, 2, 1],
            self.wss or [7, 7, 7],
        )

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        embed_dims, num_heads, mlp_ratios, depths, sr_ratios, wss = self._cfg()
        b = images.shape[0]
        dpr = np.linspace(0, self.drop_path_rate, sum(depths))

        x = images
        grid = None
        cur = 0
        for k in range(len(depths)):
            if k == 0:
                tokens, grid = PatchEmbed(
                    embed_dims[0], self.patch_size, norm=True,
                    dtype=self.dtype, name=f"patch_embed{k}",
                )(x)
            else:
                h_, w_ = grid
                fmap = x.reshape(b, h_, w_, embed_dims[k - 1])
                tokens, grid = PatchEmbed(
                    embed_dims[k], 2, norm=True,
                    dtype=self.dtype, name=f"patch_embed{k}",
                )(fmap)
            tokens = nn.Dropout(self.drop_rate)(
                tokens, deterministic=deterministic
            )
            for j in range(depths[k]):
                tokens = GroupBlock(
                    embed_dims[k], num_heads[k], mlp_ratio=mlp_ratios[k],
                    qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path=float(dpr[cur + j]), sr_ratio=sr_ratios[k],
                    ws=1 if j % 2 == 1 else wss[k],
                    dtype=self.dtype, name=f"block{k}_{j}",
                )(tokens, grid, deterministic=deterministic)
                if j == 0:
                    tokens = PosCNN(dtype=self.dtype, name=f"pos_block{k}")(
                        tokens, grid
                    )
            cur += depths[k]
            x = tokens

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=1)  # GAP over tokens (twin-svt.py:258 intent)
        if self.num_classes > 0:
            return nn.Dense(
                self.num_classes,
                kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
                dtype=self.dtype, name="head",
            )(x)
        return x


if __name__ == "__main__":
    # Reference-style entry point (vanilla_vit.py:311-324 pattern):
    # python -m vision_transformers_tpu.models.image_classification.twins_svt
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("twins_cifar100")
