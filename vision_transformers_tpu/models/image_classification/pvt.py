"""Pyramid Vision Transformer (TPU-native).

Reference: models/image_classification/pvt.py:124-258 — 4 stages, each with
a conv patch embed + LN returning (tokens, (H, W)), learned per-stage
pos-embed (bilinear-interpolated on grid mismatch, pvt.py:193-199),
spatial-reduction attention blocks (sr_ratios [8,4,2,1]), DropPath schedule
over total depth, CLS token prepended only in the last stage
(pvt.py:211-215), final LN + CLS head. Defaults embed_dims [64,128,256,512],
heads [1,2,4,8], depths [3,4,6,3] (pvt.py:133-142).

Defect fixed (implement intent): the reference resets ``cur = 0`` inside the
stage loop (pvt.py:160), restarting the stochastic-depth schedule each
stage; here the linear schedule runs over the cumulative block index.
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


class PVTBlock(nn.Module):
    """x + DP(SRA(LN x)); x + DP(MLP(LN x)) (pvt.py:105-122)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    sr_ratio: int = 1
    num_cls_tokens: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid, *, deterministic: bool = True):
        dp = DropPath(self.drop_path, name="drop_path")
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = SpatialReductionAttention(
            self.dim, self.num_heads, sr_ratio=self.sr_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            num_cls_tokens=self.num_cls_tokens, dtype=self.dtype, name="attn",
        )(y, grid, deterministic=deterministic)
        x = x + dp(y, deterministic=deterministic)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio), dropout=self.drop,
            dtype=self.dtype, name="mlp",
        )(y, deterministic=deterministic)
        return x + dp(y, deterministic=deterministic)


class PVT(nn.Module, TrainableModel):
    image_size: int = 32
    patch_size: int = 16
    in_channels: int = 3
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
    num_stages: int = 4
    dtype: jnp.dtype = jnp.float32

    def _cfg(self):
        return (
            self.embed_dims or [64, 128, 256, 512],
            self.num_heads or [1, 2, 4, 8],
            self.mlp_ratios or [4, 4, 4, 4],
            self.depths or [3, 4, 6, 3],
            self.sr_ratios or [8, 4, 2, 1],
        )

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        embed_dims, num_heads, mlp_ratios, depths, sr_ratios = self._cfg()
        b = images.shape[0]
        last = self.num_stages - 1
        dpr = np.linspace(0, self.drop_path_rate, sum(depths))

        x = images
        cur = 0
        grid = None
        for i in range(self.num_stages):
            if i == 0:
                tokens, grid = PatchEmbed(
                    embed_dims[0], self.patch_size, norm=True,
                    dtype=self.dtype, name="patch_embedding1",
                )(x)
            else:
                # fold tokens back to a feature map, then 2×2 patch embed
                h_, w_ = grid
                fmap = x.reshape(b, h_, w_, embed_dims[i - 1])
                tokens, grid = PatchEmbed(
                    embed_dims[i], 2, norm=True,
                    dtype=self.dtype, name=f"patch_embedding{i + 1}",
                )(fmap)
            h_, w_ = grid
            n = h_ * w_

            ncls = 1 if i == last else 0
            if ncls:
                cls = self.param(
                    "cls_token", trunc_normal_init(0.02), (1, 1, embed_dims[i])
                )
                tokens = jnp.concatenate(
                    [jnp.broadcast_to(cls.astype(tokens.dtype),
                                      (b, 1, embed_dims[i])), tokens],
                    axis=1,
                )

            # Canonical pos-embed grid from the config (pvt.py:163-167);
            # bilinear-interpolate to the runtime grid on mismatch
            # (_get_pos_embed, pvt.py:193-199).
            canon = (
                self.image_size // self.patch_size if i == 0
                else (self.image_size // (2 ** (i + 1))) // 2
            )
            pos = self.param(
                f"position_embedding{i + 1}", trunc_normal_init(0.02),
                (1, canon * canon + ncls, embed_dims[i]),
            )
            pos_cls, pos_grid = pos[:, :ncls], pos[:, ncls:]
            if canon != h_ or canon != w_:
                pos_grid = jax.image.resize(
                    pos_grid.reshape(1, canon, canon, embed_dims[i]),
                    (1, h_, w_, embed_dims[i]), method="bilinear",
                ).reshape(1, n, embed_dims[i])
            pos = jnp.concatenate([pos_cls, pos_grid], axis=1)
            tokens = tokens + pos.astype(tokens.dtype)
            tokens = nn.Dropout(self.drop_rate)(
                tokens, deterministic=deterministic
            )

            for j in range(depths[i]):
                tokens = PVTBlock(
                    embed_dims[i], num_heads[i], mlp_ratio=mlp_ratios[i],
                    qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path=float(dpr[cur + j]), sr_ratio=sr_ratios[i],
                    num_cls_tokens=ncls, dtype=self.dtype,
                    name=f"block{i + 1}_{j}",
                )(tokens, grid, deterministic=deterministic)
            cur += depths[i]
            x = tokens

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        cls_feat = x[:, 0]
        if self.num_classes > 0:
            return nn.Dense(
                self.num_classes,
                kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
                dtype=self.dtype, name="head",
            )(cls_feat)
        return cls_feat
        # headless features (reference forward_features, pvt.py:240): use
        # PVT(num_classes=0) — returns the post-norm CLS feature.


if __name__ == "__main__":
    # Reference-style entry point (vanilla_vit.py:311-324 pattern):
    # python -m vision_transformers_tpu.models.image_classification.pvt
    from vision_transformers_tpu.cli import run_reference_main

    run_reference_main("pvt_cifar100")
