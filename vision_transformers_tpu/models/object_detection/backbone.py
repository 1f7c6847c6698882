"""DETR backbone: ResNet-50 with frozen-BN semantics and multi-scale taps.

The reference builds a pretrained torchvision resnet50 with
FrozenBatchNorm2d, dilation in the last stage, and IntermediateLayerGetter
taps on layers 1–4 (detr.py:66-91). There is no pretrained zoo in a
TPU-clean environment, so the backbone is implemented natively:

- ``FrozenBatchNorm``: affine transform with non-trainable running stats
  (stop_gradient on all four buffers) — exact FrozenBatchNorm2d semantics,
  meaningful once a checkpoint is loaded into it.
- ``norm='group'`` alternative for honest from-scratch training (frozen BN
  at fresh init is just a fixed affine).
- ``replace_stride_with_dilation`` on layer4 (stride→dilation 2, the
  reference's [False, False, True], detr.py:69).
- ``return_interm_layers`` returns a dict {'0': C2, '1': C3, '2': C4,
  '3': C5} like IntermediateLayerGetter (detr.py:88-89).
- NHWC throughout; trainability gating (the reference freezes everything
  but layers 2–4 when not train_backbone, detr.py:74-82) is handled by the
  optimizer mask helper ``backbone_param_filter``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine params frozen."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale, bias, mean, var = map(jax.lax.stop_gradient,
                                     (scale, bias, mean, var))
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        # fold to per-channel (inv, shift) in fp32, then apply in x's dtype:
        # without the casts the fp32 params promote every feature map to
        # fp32, doubling the backbone's HBM traffic under bf16 training
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


def _norm(kind: str, features: int, name: str, dtype=None):
    if kind == "frozen_bn":
        return FrozenBatchNorm(features, name=name)
    if kind == "group":
        # dtype pins the RESULT dtype (stats still reduce in fp32 inside
        # flax); dtype=None would promote bf16 maps to fp32 via the params
        return nn.GroupNorm(num_groups=32, dtype=dtype, name=name)
    raise ValueError(kind)


class Bottleneck(nn.Module):
    """ResNet bottleneck 1x1 → 3x3 → 1x1 (expansion 4)."""

    features: int
    strides: int = 1
    dilation: int = 1
    norm: str = "frozen_bn"
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _norm(self.norm, self.features, "bn1", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    padding=[(self.dilation,) * 2] * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _norm(self.norm, self.features, "bn2", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = _norm(self.norm, self.features * 4, "bn3", self.dtype)(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            residual = _norm(self.norm, self.features * 4, "down_bn",
                             self.dtype)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-50-style backbone (layers [3,4,6,3]) with NHWC maps."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    norm: str = "frozen_bn"
    replace_stride_with_dilation: Sequence[bool] = (False, False, True)
    return_interm_layers: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _norm(self.norm, 64, "bn1", self.dtype)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = {}
        dilation = 1
        for stage, blocks in enumerate(self.stage_sizes):
            features = 64 * 2 ** stage
            stride = 1 if stage == 0 else 2
            prev_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            for i in range(blocks):
                # torchvision ResNet semantics: a dilated stage's FIRST
                # block keeps the pre-doubling dilation; only subsequent
                # blocks use the doubled one (checkpoint-parity matters for
                # torch-ported DETR-R50 weights).
                y = Bottleneck(
                    features,
                    strides=stride if i == 0 else 1,
                    dilation=prev_dilation if i == 0 else dilation,
                    norm=self.norm,
                    downsample=i == 0,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{i}",
                )(y)
            outs[str(stage)] = y

        if self.return_interm_layers:
            return outs
        return {"0": outs["3"]}


class ViTBackbone(nn.Module):
    """ViT feature extractor for detection (BASELINE.json config 4: 'ViT
    object detection' — the detection head reuses the same attention
    kernels). Patch embed + encoder blocks, no CLS token; returns the final
    token grid as a single feature level {'0': (B, H/p, W/p, D)}."""

    hidden_dim: int = 768
    patch_size: int = 16
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images) -> Dict[str, jax.Array]:
        from vision_transformers_tpu.models.image_classification.vanilla_vit import (
            EncoderBlock,
        )
        from vision_transformers_tpu.ops.patch_embed import PatchEmbed
        from vision_transformers_tpu.ops.posenc import sincos_pos_embed_2d

        b, h, w, _ = images.shape
        p = self.patch_size
        if h % p or w % p:
            images = jnp.pad(
                images, ((0, 0), (0, (-h) % p), (0, (-w) % p), (0, 0)))
        tokens, (gh, gw) = PatchEmbed(
            self.hidden_dim, p, dtype=self.dtype, name="patch_embed")(images)
        pos = jnp.asarray(sincos_pos_embed_2d(self.hidden_dim, gh, gw))
        tokens = tokens + pos[None].astype(tokens.dtype)
        for i in range(self.num_layers):
            tokens = EncoderBlock(
                self.num_heads, self.hidden_dim, self.mlp_dim,
                dtype=self.dtype, name=f"block{i}",
            )(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        return {"0": tokens.reshape(b, gh, gw, self.hidden_dim)}


def build_backbone(trainable_backbone: bool = True, *,
                   arch: str = "resnet50",
                   norm: str = "frozen_bn",
                   return_interm_layers: bool = True,
                   dtype=jnp.float32, **vit_kwargs):
    """Reference-surface builder (detr.py:66-91): returns (model,
    num_channels). ``arch``: 'resnet50' (reference) or 'vit'."""
    if arch == "vit":
        model = ViTBackbone(dtype=dtype, **vit_kwargs)
        return model, model.hidden_dim
    model = ResNet(norm=norm, return_interm_layers=return_interm_layers,
                   dtype=dtype)
    return model, 2048


def backbone_param_filter(path: str) -> bool:
    """True for params the reference keeps trainable when
    train_backbone=False (layers 2-4 only, detr.py:74-82). Use with
    optax.masked to freeze the rest."""
    return any(f"layer{i}_" in path for i in (2, 3, 4))
