"""Pallas TPU flash attention.

Replaces the fused attention the reference gets for free from
``torch.nn.MultiheadAttention`` (vanilla_vit.py:67,77) and the hand-rolled
softmax(QK^T)V paths in Swin/PVT/Twins/TNT — one blocked kernel covering:

- full self attention (ViT/DeiT/TNT/T2T),
- attention with an additive per-head bias (Swin relative position bias +
  shift mask, swin_transformer.py:90-113),
- cross attention with Sq != Sk (PVT/Twins SRA where K/V are spatially
  reduced, pvt.py:57-73; DETR decoder).

Design notes (TPU-first, see /opt/skills/guides/pallas_guide.md):
- Vision sequence lengths here are small (65..1025), so K/V for one (batch,
  head) always fit in VMEM. The kernel therefore streams q blocks over a
  (batch*head, q_block) grid, holds K/V whole, and does a single-pass fp32
  softmax per q block — no online-softmax rescaling passes are needed, which
  removes two VPU passes per block relative to the generic flash recipe.
- Sequence padding is static (XLA static shapes): callers pad S to a lane
  multiple and pass ``kv_valid``; masking uses a compile-time iota compare.
- fp32 scores/softmax, bf16 matmul inputs, fp32 accumulation
  (preferred_element_type).
- Backward is expressed in jnp on saved (out, lse) residuals: at these
  sequence lengths the S×S score rematerialization is a handful of MXU tiles
  and XLA fuses it cleanly; a dedicated Pallas backward is an optimization
  valve, not a requirement.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_valid, bias_ref=None):
    """One (batch*head, q_block) program: softmax(scale·QKᵀ + bias)V.

    q_ref: (block_q, d), k_ref/v_ref: (s_k, d), bias_ref: (block_q, s_k).
    """
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    if bias_ref is not None:
        s = s + bias_ref[...].astype(jnp.float32)

    s_k = k.shape[0]
    if kv_valid < s_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom
    lse_ref[...] = m + jnp.log(denom)  # (block_q, 1)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _flash_fwd(q, k, v, bias, scale: float, kv_valid: int, block_q: int):
    """q: (G, Sq, D); k, v: (G, Sk, D); bias: None or (G or 1, Sq, Sk)."""
    g, s_q, d = q.shape
    s_k = k.shape[1]
    block_q = min(block_q, s_q)
    num_q_blocks = pl.cdiv(s_q, block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        # bias leading dim may be g (per batch*head), h (shared across batch,
        # heads fastest-varying in g), or 1 (fully shared): index with mod.
        bias_g = bias.shape[0]
        bmap = lambda b, i: (b % bias_g, i, 0)
        in_specs.append(
            pl.BlockSpec((1, block_q, s_k), bmap, memory_space=pltpu.VMEM)
        )
        args.append(bias)

    def kernel(*refs):
        if bias is not None:
            q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref, lse_ref = refs
            bias_ref = None
        _attn_kernel(
            q_ref.at[0], k_ref.at[0], v_ref.at[0],
            o_ref.at[0], lse_ref.at[0],
            scale=scale, kv_valid=kv_valid,
            bias_ref=None if bias_ref is None else bias_ref.at[0],
        )

    # Off-TPU (CPU test meshes) the kernel runs in interpreter mode, keeping
    # one code path; the jnp twin remains the semantic oracle in tests.
    interpret = jax.default_backend() != "tpu"

    out, lse = pl.pallas_call(
        kernel,
        grid=(g, num_q_blocks),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((g, s_q, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * s_q * s_k * d,
            bytes_accessed=(2 * g * s_q * d + 2 * g * s_k * d) * q.dtype.itemsize,
            transcendentals=g * s_q * s_k,
        ),
    )(*args)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention(q, k, v, bias, scale, kv_valid, block_q):
    out, _ = _flash_fwd(q, k, v, bias, scale, kv_valid, block_q)
    return out


def _flash_attention_fwd(q, k, v, bias, scale, kv_valid, block_q):
    out, lse = _flash_fwd(q, k, v, bias, scale, kv_valid, block_q)
    return out, (q, k, v, bias, out, lse)


def _flash_attention_bwd(scale, kv_valid, block_q, res, do):
    q, k, v, bias, out, lse = res
    # Rematerialize probabilities from saved lse (fp32), standard flash bwd.
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    s = jnp.einsum("gqd,gkd->gqk", qf, kf) * scale
    if bias is not None:
        bias_g = bias.shape[0]
        if bias_g == s.shape[0]:
            s = s + bias.astype(jnp.float32)
        else:  # bias shared across batch (heads fastest-varying in g)
            s = s + jnp.tile(bias.astype(jnp.float32), (s.shape[0] // bias_g, 1, 1))
    s_k = k.shape[1]
    if kv_valid < s_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)  # lse: (G, Sq, 1), broadcasts over keys

    dv = jnp.einsum("gqk,gqd->gkd", p, dof)
    dp = jnp.einsum("gqd,gkd->gqk", dof, vf)
    delta = jnp.sum(dof * out.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("gqk,gkd->gqd", ds, kf) * scale
    dk = jnp.einsum("gqk,gqd->gkd", ds, qf) * scale
    if bias is None:
        dbias = None
    else:
        bias_g = bias.shape[0]
        if bias_g == ds.shape[0]:
            dbias = ds
        else:  # bias was broadcast over the batch: reduce the broadcast dim
            dbias = jnp.sum(
                ds.reshape(-1, bias_g, *ds.shape[1:]), axis=0
            )
        dbias = dbias.astype(bias.dtype)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    kv_valid: Optional[int] = None,
    block_q: int = 256,
) -> jax.Array:
    """Blocked TPU attention over (B, H, S, D) inputs.

    Pads S and D to hardware tiles internally; ``kv_valid`` (static) marks
    how many keys are real after padding. ``bias`` is additive, broadcast
    over batch if its leading dim is 1: (1|B, H, Sq, Sk).
    """
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if kv_valid is None:
        kv_valid = s_k

    # Static padding to VPU/MXU-friendly tiles.
    s_qp = _round_up(s_q, 128)
    s_kp = _round_up(s_k, 128)
    dp = _round_up(d, 128)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, s_qp - s_q), (0, dp - d)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, s_kp - s_k), (0, dp - d)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, s_kp - s_k), (0, dp - d)))

    g = b * h
    q = q.reshape(g, s_qp, dp)
    k = k.reshape(g, s_kp, dp)
    v = v.reshape(g, s_kp, dp)
    if bias is not None:
        bb = bias.shape[0]
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, s_qp - s_q), (0, s_kp - s_k))
        ).reshape(bb * h, s_qp, s_kp)

    out = _flash_attention(q, k, v, bias, scale, min(kv_valid, s_k), block_q)
    return out.reshape(b, h, s_qp, dp)[:, :, :s_q, :d]
