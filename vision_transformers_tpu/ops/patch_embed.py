"""Patch embedding as a single MXU matmul.

The reference uses a strided Conv2d (vanilla_vit.py:129,196-198). A stride-p
p×p conv over non-overlapping patches is exactly a reshape + matmul; doing the
space-to-depth reshape explicitly guarantees the projection lands on the MXU
as one (B·N, p²·C) @ (p²·C, D) contraction with no conv lowering in the way.

Layout note: this framework is NHWC end-to-end (TPU-native); the reference is
NCHW. ``patchify`` emits features ordered (ph, pw, c) per patch — tests
account for the ordering when loading torch conv weights.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import conv_patch_init, zeros_init


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) → (B, H/p * W/p, p*p*C) non-overlapping patches."""
    b, h, w, c = images.shape
    p = patch_size
    assert h % p == 0 and w % p == 0, "image indivisible by patch size"
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, p, p, C)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding (conv-as-matmul).

    Init mirrors the reference conv patch embed: trunc_normal with
    std=sqrt(1/fan_in), zero bias (vanilla_vit.py:143-147).
    Returns (tokens, (grid_h, grid_w)).
    """

    embed_dim: int
    patch_size: int
    norm: bool = False  # PVT-style LayerNorm after projection (pvt.py:18-39)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
        b, h, w, c = images.shape
        p = self.patch_size
        tokens = patchify(images, p)
        tokens = nn.Dense(
            self.embed_dim,
            kernel_init=conv_patch_init(p, c),
            bias_init=zeros_init,
            dtype=self.dtype,
            name="proj",
        )(tokens)
        if self.norm:
            tokens = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=self.dtype)(tokens)
        return tokens, (h // p, w // p)


class OverlapPatchEmbed(nn.Module):
    """Strided conv patch embedding for overlapping kernels (TNT's k7s4 conv
    tnt.py:20-46, T2T soft-splits). Falls back to lax.conv when kernel>stride
    — XLA lowers small convs onto the MXU via implicit im2col."""

    embed_dim: int
    kernel_size: int
    stride: int
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding), (self.padding, self.padding)],
            dtype=self.dtype,
            name="proj",
        )(images)
        b, gh, gw, d = x.shape
        return x.reshape(b, gh * gw, d), (gh, gw)
