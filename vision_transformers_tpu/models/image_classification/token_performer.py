"""T2T token performer: FAVOR+ linear attention.

Reference: models/image_classification/token_performer.py:9-59 — positive
random features exp(wᵀx − |x|²/2)/√m with a FIXED orthogonal projection w
(orthogonal init × √m, requires_grad=False, token_performer.py:29-30), linear
attention via the associativity trick qp·(kpᵀv)/D (token_performer.py:46-55),
V-as-skip through a projection + dropout, then an MLP residual.

TPU note: the feature map is numerically delicate (exp of differences);
everything from prm_exp through the normalization runs in fp32 regardless of
the model compute dtype (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import trunc_normal_init, zeros_init


class TokenPerformer(nn.Module):
    dim: int
    in_dim: int
    head_cnt: int = 1
    kernel_ratio: float = 0.5
    dp1: float = 0.1
    dp2: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        emb = self.in_dim * self.head_cnt
        m = int(emb * self.kernel_ratio)

        # Fixed orthogonal random features, frozen (stop_gradient mirrors
        # requires_grad=False).
        w = self.param(
            "w",
            lambda key, shape: jax.nn.initializers.orthogonal()(key, shape)
            * math.sqrt(m),
            (m, emb),
        )
        w = jax.lax.stop_gradient(w).astype(jnp.float32)

        def prm_exp(t):
            t = t.astype(jnp.float32)
            xd = jnp.sum(t * t, axis=-1, keepdims=True) / 2.0
            wtx = jnp.einsum("bti,mi->btm", t, w)
            return jnp.exp(wtx - xd) / math.sqrt(m)

        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        kqv = nn.Dense(
            3 * emb, kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="kqv",
        )(y)
        k, q, v = jnp.split(kqv, 3, axis=-1)

        kp, qp = prm_exp(k), prm_exp(q)                       # (B, T, m)
        denom = jnp.einsum("bti,bi->bt", qp, jnp.sum(kp, axis=1))[..., None]
        kptv = jnp.einsum("bin,bim->bnm", v.astype(jnp.float32), kp)  # (B, emb, m)
        attn_out = jnp.einsum("bti,bni->btn", qp, kptv) / (denom + 1e-8)
        attn_out = attn_out.astype(v.dtype)

        proj = nn.Dense(
            emb, kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="proj",
        )(attn_out)
        proj = nn.Dropout(self.dp1)(proj, deterministic=deterministic)
        x = v + proj  # V skip connection (token_performer.py:53)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(
            emb, kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="mlp_fc1",
        )(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(
            emb, kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="mlp_fc2",
        )(y)
        y = nn.Dropout(self.dp2)(y, deterministic=deterministic)
        return x + y
