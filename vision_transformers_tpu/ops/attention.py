"""Multi-head attention: jnp oracle + Pallas dispatch + linen module.

Mirrors the math of ``torch.nn.MultiheadAttention(batch_first=True)`` as used
by the reference encoder blocks (vanilla_vit.py:67,77): packed QKV projection,
scaled dot-product softmax attention with dropout on the probabilities, and an
output projection. TPU-first differences: softmax statistics in fp32, the
fused scaled-softmax(QKᵀ+bias)V runs as a Pallas kernel on TPU
(flash_attention.py), and the probability-dropout path (training with
attention_dropout > 0) uses the XLA-fused jnp twin so dropout masks stay
inside one fusion.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_transformers_tpu.core.initializers import xavier_uniform_init, zeros_init
from vision_transformers_tpu.ops.flash_attention import (
    flash_attention,
    flash_dropout_attention,
    packed_flash_attention,
    packed_flash_supported,
)

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Pure-jnp scaled dot-product attention (the unit-test oracle).

    q, k, v: (B, H, S, D). bias: additive, broadcastable to (B, H, Sq, Sk).
    mask: bool, True = attend, broadcastable to (B, H, Sq, Sk).
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# Above this score size the kernel switches to the streaming online-softmax
# path, which does not support an additive bias — biased large-S attention
# (rare: a windowed model would need a giant window) routes through XLA.
_PALLAS_MAX_SCORE_ELEMS = 1_500_000


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    kv_valid: Optional[int] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    backend: str = "auto",
) -> jax.Array:
    """Backend dispatcher: Pallas flash kernel on TPU, jnp twin elsewhere.

    ``mask`` (arbitrary boolean) forces the jnp path; key-padding masks
    (B, 1, 1, Sk) and training-mode probability dropout stay on kernels
    (flash_dropout_attention for dropout > 0). Static trailing key padding
    should be expressed via ``kv_valid``, an iota compare in-kernel.
    """
    wants_pallas = backend == "pallas" or (backend == "auto" and _use_pallas())
    small = q.shape[2] * k.shape[2] <= _PALLAS_MAX_SCORE_ELEMS
    kernel_ok = small or bias is None
    if wants_pallas and kernel_ok and mask is None and dropout_rate == 0.0:
        return flash_attention(q, k, v, bias, scale=scale, kv_valid=kv_valid)
    # key-padding masks (B, 1, 1, Sk) ride the kernels (bias-free)
    is_key_padding = (
        mask is not None and mask.ndim == 4
        and mask.shape[1] == 1 and mask.shape[2] == 1
        and mask.shape[0] == q.shape[0]
    )
    if (wants_pallas and bias is None and dropout_rate > 0.0
            and dropout_rng is not None
            and (mask is None or is_key_padding)):
        # Training-mode probability dropout rides the q-row-blocked kernel
        # (in-kernel pltpu PRNG, replayed by its Pallas backward) instead of
        # falling onto the jnp path — at DETR-encoder shapes the fallback's
        # (B, H, S, S) HBM materializations were ~45 ms of the 98 ms train
        # step (benchmarks/detr_train_residue_r05.json). Key-padding masks
        # (the DETR encoder/decoder cross-attn case) fold in as an additive
        # per-(batch, key) bias.
        seed = jax.random.randint(
            dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        return flash_dropout_attention(
            q, k, v, dropout_rate=dropout_rate, seed=seed,
            scale=scale, kv_valid=kv_valid,
            key_mask=None if mask is None else mask[:, 0, 0, :])
    if (wants_pallas and bias is None and is_key_padding
            and dropout_rate == 0.0):
        return flash_attention(
            q, k, v, kv_mask=mask[:, 0, 0, :],
            scale=scale, kv_valid=kv_valid)
    if bias is not None and bias.shape[0] not in (1, q.shape[0]):
        # Windowed attention: bias leading dim is num_windows, batch is
        # B·num_windows — tile for the jnp path (the Pallas kernel instead
        # indexes the compact bias with a grid modulo).
        assert q.shape[0] % bias.shape[0] == 0
        bias = jnp.tile(bias, (q.shape[0] // bias.shape[0], 1, 1, 1))
    if kv_valid is not None and kv_valid < k.shape[2]:
        col = jnp.arange(k.shape[2]) < kv_valid
        key_mask = col[None, None, None, :]
        mask = key_mask if mask is None else (mask & key_mask)
    return mha_reference(
        q, k, v, bias, mask,
        scale=scale, dropout_rate=dropout_rate, dropout_rng=dropout_rng,
    )


class SelfAttention(nn.Module):
    """Packed-QKV multi-head self attention (torch MHA semantics).

    hidden_dim must divide num_heads; output = out_proj(attn). Follows the
    reference's use with need_weights=False; set ``return_weights=True`` to
    also get the (B, H, S, S) probabilities for visualization
    (utils/visualization.py parity — the reference could never supply them).
    """

    hidden_dim: int
    num_heads: int
    attention_dropout: float = 0.0
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    quant8: bool = False  # serving-time w8a8 projections (ops/quant.py)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_weights: bool = False):
        b, s, _ = x.shape
        h = self.num_heads
        dh = self.hidden_dim // h
        assert dh * h == self.hidden_dim, "hidden_dim not divisible by heads"

        if self.quant8:
            from vision_transformers_tpu.ops.quant import QuantDense

            qkv = QuantDense(
                3 * self.hidden_dim, dtype=self.dtype, name="qkv")(x)
        else:
            qkv = nn.Dense(
                3 * self.hidden_dim,
                kernel_init=xavier_uniform_init(),
                bias_init=zeros_init,
                dtype=self.dtype,
                name="qkv",
            )(x)

        drop = 0.0 if deterministic else self.attention_dropout
        rng = self.make_rng("dropout") if drop > 0.0 else None
        weights = None

        if (not return_weights and _use_pallas()
                and packed_flash_supported(b, s, qkv.shape[-1],
                                           qkv.dtype.itemsize)):
            # Packed path: the kernel reads the projection output in place —
            # no head split/transpose round trips (flash_attention.py,
            # "Packed-QKV attention" design note). Probability dropout runs
            # in-kernel via the pltpu PRNG, so the reference training
            # configs (attention_dropout=0.1) stay on the kernel path.
            seed = None
            if drop > 0.0:
                seed = jax.random.randint(
                    rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            out = packed_flash_attention(qkv, h, dropout_rate=drop,
                                         seed=seed)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
            k = k.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
            v = v.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

            if return_weights:
                scale = 1.0 / (dh ** 0.5)
                scores = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32
                ) * scale
                weights = jax.nn.softmax(scores, axis=-1)
                out = jnp.einsum(
                    "bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
            else:
                out = dot_product_attention(
                    q, k, v, dropout_rate=drop, dropout_rng=rng
                )
            out = out.transpose(0, 2, 1, 3).reshape(b, s, self.hidden_dim)
        if self.quant8:
            from vision_transformers_tpu.ops.quant import QuantDense

            out = QuantDense(
                self.hidden_dim, use_bias=self.out_bias,
                dtype=self.dtype, name="out")(out)
        else:
            out = nn.Dense(
                self.hidden_dim,
                use_bias=self.out_bias,
                kernel_init=xavier_uniform_init(),
                bias_init=zeros_init,
                dtype=self.dtype,
                name="out",
            )(out)
        if return_weights:
            return out, weights
        return out
