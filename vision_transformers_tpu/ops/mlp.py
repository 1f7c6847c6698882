"""Transformer MLP blocks.

``MLPBlock`` mirrors the reference encoder MLP (vanilla_vit.py:47-56):
Linear → GELU → Dropout → Linear → Dropout with xavier-uniform weights and
N(0, 1e-6) biases. ``Mlp`` is the timm-style two-layer MLP used by
PVT/Swin/TNT/Twins/T2T (e.g. token_transformer.py:10-26) with configurable
hidden/out dims. Both are single XLA fusions on TPU — two MXU matmuls with
the GELU fused into the first's epilogue; no Pallas needed because XLA
already emits the fused form (SURVEY.md §7 step 2).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import (
    tiny_normal_init,
    trunc_normal_init,
    xavier_uniform_init,
    zeros_init,
)


def gelu_for(dtype):
    """Exact (erf) GELU in fp32 for torch/reference parity; tanh-approximate
    in bf16 where the ~1e-3 approximation error is below bf16 rounding and
    the VPU runs it 1.7× faster (measured on v5e)."""
    approximate = dtype == jnp.bfloat16
    return lambda x: nn.gelu(x, approximate=approximate)


class MLPBlock(nn.Module):
    """Reference ViT encoder MLP: in → mlp_dim → in, GELU, dropout."""

    mlp_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant8: bool = False  # serving-time w8a8 (ops/quant.py)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        if self.quant8:
            from vision_transformers_tpu.ops.quant import QuantDense

            dense1 = QuantDense(self.mlp_dim, dtype=self.dtype, name="fc1")
            dense2 = QuantDense(out_dim, dtype=self.dtype, name="fc2")
        else:
            dense1 = nn.Dense(
                self.mlp_dim,
                kernel_init=xavier_uniform_init(),
                bias_init=tiny_normal_init(),
                dtype=self.dtype,
                name="fc1",
            )
            dense2 = nn.Dense(
                out_dim,
                kernel_init=xavier_uniform_init(),
                bias_init=tiny_normal_init(),
                dtype=self.dtype,
                name="fc2",
            )
        x = dense1(x)
        x = gelu_for(self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = dense2(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Mlp(nn.Module):
    """timm-style MLP (trunc-normal init, zero bias) used by the
    PVT/Swin/TNT/Twins/T2T families."""

    hidden_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dropout: float = 0.0
    act: Optional[Callable] = None  # default: dtype-appropriate GELU
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_dim = x.shape[-1]
        hidden = self.hidden_dim or in_dim
        out = self.out_dim or in_dim
        x = nn.Dense(
            hidden,
            kernel_init=trunc_normal_init(0.02),
            bias_init=zeros_init,
            dtype=self.dtype,
            name="fc1",
        )(x)
        x = (self.act or gelu_for(self.dtype))(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(
            out,
            kernel_init=trunc_normal_init(0.02),
            bias_init=zeros_init,
            dtype=self.dtype,
            name="fc2",
        )(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x
