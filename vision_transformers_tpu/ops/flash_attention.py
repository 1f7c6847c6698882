"""Pallas TPU flash attention.

Replaces the fused attention the reference gets for free from
``torch.nn.MultiheadAttention`` (vanilla_vit.py:67,77) and the hand-rolled
softmax(QK^T)V paths in Swin/PVT/Twins/TNT — one kernel covering:

- full self attention (ViT/DeiT/TNT/T2T),
- attention with an additive per-head bias (Swin relative position bias +
  shift mask, swin_transformer.py:90-113),
- cross attention with Sq != Sk (PVT/Twins SRA reduced K/V, pvt.py:57-73).

Design notes (TPU-first; profiled on v5e — see git history):
- Vision attention here is many small heads (S = 49..1025, D = 32..64), so
  per-(batch·head) grid programs drown in launch overhead (3072 programs
  for ViT-B/16 ≈ 9 ms/layer). The kernel instead processes a BLOCK of
  (batch·head) pairs per program with *batched* ``dot_general`` — grid
  ~100 programs — and keeps K/V whole in VMEM (they always fit at these
  sequence lengths), doing a single-pass fp32 softmax. No online-softmax
  rescaling is needed.
- No HBM padding round-trips: blocks use the array's true S and D (Mosaic
  pads sublanes/lanes in registers). Only the (batch·head) axis is padded
  to the block multiple.
- Bias with a broadcast leading dim (per-head, shared across batch) is
  indexed compactly via a grid modulo — the group block size is chosen to
  divide the bias groups so each program sees one contiguous bias block.
- fp32 scores/softmax, bf16 matmul inputs, fp32 accumulation.
- Backward is jnp on saved (out, lse) residuals: the S×S rematerialization
  is a handful of MXU tiles at these shapes and XLA fuses it; a Pallas
  backward is an optimization valve, not a requirement.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# Per-program VMEM target (bytes): leave headroom under the 16 MB VMEM for
# Mosaic's double-buffered pipelining and fusion temporaries.
_VMEM_TARGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_group_block(g: int, s_q: int, s_k: int, d: int, itemsize: int,
                      bias_g: Optional[int]) -> int:
    """Largest block of (batch·head) pairs per program whose working set
    fits VMEM and that divides the bias group count (contiguous bias
    blocks). Working set per pair ≈ 4 fp32 score-sized buffers (scores,
    exp, prob + slack) + double-buffered q/kT/v/out blocks."""
    scores = 4 * s_q * s_k * 4
    inputs = 2 * (2 * s_q * d + 2 * s_k * d) * itemsize
    if bias_g is not None:
        scores += s_q * s_k * 4  # bias block rides along
    cap = max(1, _VMEM_TARGET // max(scores + inputs, 1))
    cap = min(cap, 64)
    blk = min(cap, g)
    while blk > 1:
        if g % blk == 0 and (bias_g is None or bias_g % blk == 0 or blk % bias_g == 0):
            return blk
        blk -= 1
    return 1


def _attn_kernel(q_ref, kt_ref, v_ref, o_ref, lse_ref, *, scale, kv_valid,
                 bias_ref=None, bias_g=None, dropout_rate=0.0,
                 seed_ref=None):
    """One program: a (G_BLK, Sq, D) batch of heads against full K/V.

    K arrives pre-transposed as (G_BLK, D, Sk): the QKᵀ contraction then
    runs lane(q)×sublane(kᵀ) — MXU-native, no per-program register
    transposes (the HBM transpose is one fused XLA pass outside).

    ``dropout_rate`` > 0 drops normalized attention probabilities in-kernel
    via the pltpu PRNG (torch MHA semantics). The mask stream is a function
    of (seed, program_id) only, so the backward replays it bit-exactly —
    fwd and bwd must partition G identically (enforced by the callers).
    """
    q = q_ref[...]
    kt = kt_ref[...]
    v = v_ref[...]
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    s = jax.lax.dot_general(
        q, kt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # batched over G_BLK
        preferred_element_type=jnp.float32,
    )  # (G_BLK, Sq, Sk)
    s = s * scale
    if bias_ref is not None:
        b = bias_ref[...].astype(jnp.float32)
        if b.shape[0] != s.shape[0]:  # bias groups tile across the block
            b = jnp.tile(b, (s.shape[0] // b.shape[0], 1, 1))
        s = s + b

    s_k = kt.shape[2]
    if kv_valid < s_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[...] = m + jnp.log(denom)  # (G_BLK, Sq, 1)
    if dropout_rate > 0.0:
        # drop the (unnormalized) probabilities; dividing the OUTPUT by the
        # undropped denom is equivalent to dropping normalized probs
        keep = _dropout_keep(e.shape, dropout_rate)
        e = jnp.where(keep, e, 0.0) * (1.0 / (1.0 - dropout_rate))
    p = e * pl.reciprocal(denom, approx=False)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


# score-elements threshold between the single-pass (K/V whole in VMEM) and
# the streaming online-softmax kernels
_SMALL_S_LIMIT = 1_500_000


def _flash_fwd(q, k, v, bias, kv_mask, scale: float, kv_valid: int,
               block_q: int):
    """q: (G, Sq, D); k, v: (G, Sk, D); bias: None or (bias_g, Sq, Sk)
    with bias_g in {1, h, G} (heads fastest-varying in G); kv_mask: None or
    (n_groups, Sk) keep-mask (streaming path only)."""
    g, s_q, d = q.shape
    s_k = k.shape[1]
    if s_q * s_k > _SMALL_S_LIMIT or kv_mask is not None:
        assert bias is None, "bias unsupported on the large-S streaming path"
        heads = g // (kv_mask.shape[0] if kv_mask is not None else g)
        return _flash_fwd_large(q, k, v, scale, kv_valid,
                                kv_mask=kv_mask, heads=heads)
    bias_g = bias.shape[0] if bias is not None else None

    g_blk = _pick_group_block(g, s_q, s_k, d, q.dtype.itemsize, bias_g)
    grid = (g // g_blk,)

    kt = k.swapaxes(1, 2)  # (G, D, Sk): one fused XLA transpose in HBM

    in_specs = [
        pl.BlockSpec((g_blk, s_q, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g_blk, d, s_k), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g_blk, s_k, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, kt, v]
    if bias is not None:
        if bias_g >= g_blk:
            # contiguous bias block per program (g_blk divides bias_g)
            bmap = lambda i: (i % (bias_g // g_blk), 0, 0)
            bias_block = g_blk
        else:
            # bias_g divides g_blk: every program tiles the full bias
            bmap = lambda i: (0, 0, 0)
            bias_block = bias_g
        in_specs.append(pl.BlockSpec(
            (bias_block, s_q, s_k), bmap, memory_space=pltpu.VMEM))
        args.append(bias)

    def kernel(*refs):
        if bias is not None:
            q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref, lse_ref = refs
            bias_ref = None
        _attn_kernel(
            q_ref, k_ref, v_ref, o_ref, lse_ref,
            scale=scale, kv_valid=kv_valid,
            bias_ref=bias_ref, bias_g=bias_g,
        )

    interpret = jax.default_backend() != "tpu"

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((g_blk, s_q, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, s_q, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((g, s_q, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * s_q * s_k * d,
            bytes_accessed=(2 * g * s_q * d + 2 * g * s_k * d) * q.dtype.itemsize,
            transcendentals=g * s_q * s_k,
        ),
    )(*args)
    return out, lse


# ---------------------------------------------------------------------------
# Large-S streaming forward: true online-softmax flash for sequences whose
# S×S scores exceed VMEM (DETR encoder on 800-1333px COCO: S ≈ 2500-4200).
# Grid (G, nq, nk) with running (max, sum, acc) scratch carried across the
# innermost k dimension; bias unsupported on this path (large-S users need
# runtime padding masks, which route through XLA anyway).

_LARGE_BLOCK_Q = 512
_LARGE_BLOCK_K = 512


def _large_kernel(q_ref, kt_ref, v_ref, o_ref, lse_ref,
                  acc_ref, m_ref, l_ref, *, scale, kv_valid, block_k,
                  mask_ref=None):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    kt = kt_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (block_q, block_k)

    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
    if mask_ref is not None:  # runtime key-padding mask, True = attend
        s = jnp.where(mask_ref[0] != 0, s, DEFAULT_MASK_VALUE)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_ref[...] * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_new
    l_ref[...] = l_new

    @pl.when(kb == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)
        lse_ref[0] = m_ref[...] + jnp.log(denom)


def _flash_fwd_large(q, k, v, scale: float, kv_valid: int,
                     kv_mask=None, heads: int = 1):
    """kv_mask: None or (n_groups, Sk) int8 keep-mask with n_groups
    dividing G (per-image padding masks, heads fastest-varying in G)."""
    g, s_q, d = q.shape
    s_k = k.shape[1]
    bq = min(_LARGE_BLOCK_Q, _round_up(s_q, 128))
    bk = min(_LARGE_BLOCK_K, _round_up(s_k, 128))
    s_qp, s_kp = _round_up(s_q, bq), _round_up(s_k, bk)
    q = jnp.pad(q, ((0, 0), (0, s_qp - s_q), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, s_kp - s_k), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, s_kp - s_k), (0, 0)))
    kt = k.swapaxes(1, 2)

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, bk), lambda b, i, j: (b, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, kt, v]
    if kv_mask is not None:
        # 3D with a unit middle dim: TPU blocks need last-two-dims tiling
        kv_mask = jnp.pad(
            kv_mask.astype(jnp.int8), ((0, 0), (0, s_kp - s_k)))[:, None, :]
        in_specs.append(pl.BlockSpec(
            (1, 1, bk), lambda b, i, j: (b // heads, 0, j),
            memory_space=pltpu.VMEM))
        args.append(kv_mask)

    def kernel(*refs):
        if kv_mask is not None:
            q_ref, kt_ref, v_ref, mask_ref, o_ref, lse_ref, acc, m, l = refs
        else:
            q_ref, kt_ref, v_ref, o_ref, lse_ref, acc, m, l = refs
            mask_ref = None
        _large_kernel(q_ref, kt_ref, v_ref, o_ref, lse_ref, acc, m, l,
                      scale=scale, kv_valid=min(kv_valid, s_k), block_k=bk,
                      mask_ref=mask_ref)

    interpret = jax.default_backend() != "tpu"
    out, lse = pl.pallas_call(
        kernel,
        grid=(g, s_qp // bq, s_kp // bk),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, s_qp, d), q.dtype),
            jax.ShapeDtypeStruct((g, s_qp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * s_qp * s_kp * d,
            bytes_accessed=(2 * g * s_qp * d + 2 * g * s_kp * d)
            * q.dtype.itemsize,
            transcendentals=g * s_qp * s_kp,
        ),
    )(*args)
    return out[:, :s_q], lse[:, :s_q]


# ---------------------------------------------------------------------------
# Pallas backward (bias-free path). All five bwd matmuls run lane×sublane-
# native by consuming pre-transposed operands (XLA fuses the HBM transposes
# from the residuals); the S×S score tensors never touch HBM — the jnp
# fallback materializes four of them per layer, which dominates the train
# step (measured ~7.3 ms vs 5.1 ms fwd per ViT-B/16 layer).

_BWD_SCORE_BUDGET = 1280 * 1024  # several S×S fp32 buffers live at once


def _bwd_kernel(q_ref, qt_ref, k_ref, kt_ref, v_ref, vt_ref,
                do_ref, dot_ref, lse_ref, lset_ref, delta_ref, deltat_ref,
                dq_ref, dk_ref, dv_ref, *, scale, kv_valid):
    q, qt = q_ref[...], qt_ref[...]
    k, kt = k_ref[...], kt_ref[...]
    v, vt = v_ref[...], vt_ref[...]
    do, dot_ = do_ref[...], dot_ref[...]
    lse, lset = lse_ref[...], lset_ref[...]
    delta, deltat = delta_ref[...], deltat_ref[...]
    s_k = k.shape[1]

    bmm = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    # dq branch: p (Sq, Sk) orientation
    s = bmm(q, kt) * scale
    if kv_valid < s_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)
    dp = bmm(do, vt)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_ref[...] = (bmm(ds, k) * scale).astype(dq_ref.dtype)

    # dk/dv branch: transposed orientation (Sk, Sq)
    st = bmm(k, qt) * scale
    if kv_valid < s_k:
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, dimension=1)
        st = jnp.where(row < kv_valid, st, DEFAULT_MASK_VALUE)
    pt = jnp.exp(st - lset)
    dv_ref[...] = bmm(pt.astype(do.dtype), do).astype(dv_ref.dtype)
    dpt = bmm(v, dot_)
    dst = (pt * (dpt - deltat)).astype(q.dtype)
    dk_ref[...] = (bmm(dst, q) * scale).astype(dk_ref.dtype)


def _flash_bwd_pallas(q, k, v, out, lse, do, scale, kv_valid):
    g, s_q, d = q.shape
    s_k = k.shape[1]

    cap = max(1, _BWD_SCORE_BUDGET // max(s_q * s_k * 4, 1))
    g_blk = min(cap, 16, g)
    while g_blk > 1 and g % g_blk:
        g_blk -= 1

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32),
        axis=-1, keepdims=True)                       # (G, Sq, 1)
    args = [
        q, q.swapaxes(1, 2), k, k.swapaxes(1, 2), v, v.swapaxes(1, 2),
        do, do.swapaxes(1, 2), lse, lse.swapaxes(1, 2),
        delta, delta.swapaxes(1, 2),
    ]
    specs = [
        pl.BlockSpec((g_blk,) + a.shape[1:], lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for a in args
    ]
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_valid=kv_valid),
        grid=(g // g_blk,),
        interpret=interpret,
        in_specs=specs,
        out_specs=tuple(
            pl.BlockSpec((g_blk, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for s in (s_q, s_k, s_k)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((g, s_k, d), k.dtype),
            jax.ShapeDtypeStruct((g, s_k, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * g * s_q * s_k * d,
            bytes_accessed=8 * g * (s_q + s_k) * d * q.dtype.itemsize,
            transcendentals=2 * g * s_q * s_k,
        ),
    )(*args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Dropout attention: q-row-blocked fwd/bwd pair with in-kernel probability
# dropout for the SPLIT-HEAD path (bias-free, mask-free). Exists because
# training-mode attention dropout otherwise falls off every kernel onto the
# XLA path, which materializes (B, H, Sq, Sk) scores in HBM both ways — at
# DETR-encoder shapes (S=1024, 6 layers) that was ~45 ms of the 98 ms train
# step (benchmarks/detr_train_residue_r05.json). The packed-QKV kernel has
# in-kernel dropout but its whole-S score buffer caps it at S ≲ 800; this
# pair instead blocks Sq (scores (g_blk, q_blk, Sk) live in VMEM, K/V
# resident per group — they always fit at vision head dims), so it covers
# the DETR encoder at 512px (S=1024) through COCO scale (S≈4200).
#
# PRNG replay contract: the keep-mask stream is a function of
# (seed, group-block, q-block) — both kernels are launched on the SAME
# (g_blk, q_blk) partitioning (one shared plan, _dropout_plan), so the
# backward regenerates the forward's mask bit-exactly, like the packed
# kernel's (seed, program, head) stream. delta = rowsum(do·out) remains the
# correct softmax-backward correction under dropout because
# Σ_k y·dy = do·out with y the DROPPED probabilities.

_DROP_VMEM_TARGET = 10 * 1024 * 1024


def _dropout_plan(g: int, s_q: int, s_k: int, d: int, itemsize: int):
    """(g_blk, q_blk) shared by the dropout fwd and bwd kernels.

    q_blk: 256/128/64 (sublane-aligned; Sq padded up to a multiple) or Sq
    itself when Sq ≤ 256, sized so ~5 live fp32 (q_blk, Sk) score buffers
    fit; g_blk: divisor of g that keeps the per-program set under budget
    (1 at DETR-encoder shapes, larger for small-S decoder blocks)."""
    q_blk = s_q if s_q <= 256 else 256
    while q_blk > 64 and 5 * q_blk * s_k * 4 > _DROP_VMEM_TARGET:
        q_blk //= 2
    per_group = (5 * q_blk * s_k * 4            # live score-sized buffers
                 + 2 * (2 * q_blk * d + 2 * s_k * d) * itemsize
                 + 2 * 2 * s_k * d * 4)         # dk/dv fp32 scratch
    g_blk = min(max(1, _DROP_VMEM_TARGET // max(per_group, 1)), 8, g)
    while g_blk > 1 and g % g_blk:
        g_blk -= 1
    return g_blk, q_blk


def _drop_fwd_kernel(seed_ref, q_ref, kt_ref, v_ref, o_ref, lse_ref, *,
                     scale, kv_valid, dropout_rate, nq, mask_ref=None):
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0],
                        pl.program_id(0) * nq + pl.program_id(1))
    q = q_ref[...]
    kt = kt_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (g_blk, q_blk, Sk)
    s_k = kt.shape[2]
    if kv_valid < s_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
    if mask_ref is not None:
        s = s + mask_ref[...]  # (g_blk, 1, Sk) additive key-padding mask
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[...] = m + jnp.log(denom)
    if dropout_rate > 0.0:
        keep = _dropout_keep(e.shape, dropout_rate)
        e = jnp.where(keep, e, 0.0) * (1.0 / (1.0 - dropout_rate))
    p = e * pl.reciprocal(denom, approx=False)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _drop_bwd_kernel(seed_ref, q_ref, kt_ref, v_ref, do_ref, out_ref,
                     lse_ref, dq_ref, dk_ref, dv_ref, *,
                     scale, kv_valid, dropout_rate, nq, mask_ref=None):
    """Single-orientation recompute backward (packed-bwd math on split
    tensors); dk/dv accumulate across the sequential q-block grid dim.
    With dropout_rate == 0 this is also the VMEM-safe large-S backward
    (the dual-orientation _bwd_kernel keeps whole-S score buffers)."""
    qb = pl.program_id(1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0) * nq + qb)

    @pl.when(qb == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[...]
    kt = kt_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    out = out_ref[...]
    lse = lse_ref[...]

    bmm_nt = lambda a, b: jax.lax.dot_general(   # contract lanes (D or Sk)
        a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    bmm_tn = lambda a, b: jax.lax.dot_general(   # contract sublanes (q rows)
        a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (g_blk, q_blk, Sk)
    s_k = kt.shape[2]
    if kv_valid < s_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
    if mask_ref is not None:
        s = s + mask_ref[...]  # (g_blk, 1, Sk) additive key-padding mask
    p = jnp.exp(s - lse)  # normalized pre-dropout probs

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    dp = bmm_nt(do, v)
    if dropout_rate > 0.0:
        keep = _dropout_keep(p.shape, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        pd = (jnp.where(keep, p, 0.0) * inv).astype(do.dtype)
        dp = jnp.where(keep, dp, 0.0) * inv
    else:
        pd = p.astype(do.dtype)
    dv_ref[...] += bmm_tn(pd, do).astype(dv_ref.dtype)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(  # (g, q_blk, Sk) @ (g, Sk, D): contract k
        ds, kt, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] += bmm_tn(ds, q).astype(dk_ref.dtype)


def _dropout_attn_call(q, k, v, seed, scale, kv_valid, dropout_rate,
                       *, backward, do=None, out=None, lse=None,
                       mask_add=None):
    g, s_q, d = q.shape
    s_k = k.shape[1]
    g_blk, q_blk = _dropout_plan(g, s_q, s_k, d, q.dtype.itemsize)
    nq = s_q // q_blk if s_q % q_blk == 0 else -(-s_q // q_blk)
    pad_q = nq * q_blk - s_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    kt = k.swapaxes(1, 2)
    grid = (g // g_blk, nq)
    qspec = pl.BlockSpec((g_blk, q_blk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    ktspec = pl.BlockSpec((g_blk, d, s_k), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((g_blk, s_k, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((g_blk, q_blk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    seedspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    maskspec = pl.BlockSpec((g_blk, 1, s_k), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    kwargs = dict(scale=scale, kv_valid=kv_valid,
                  dropout_rate=dropout_rate, nq=nq)
    mask_ins, mask_specs = (), ()
    if mask_add is not None:
        kwargs["mask_ref"] = True  # replaced positionally below
        mask_ins, mask_specs = (mask_add,), (maskspec,)

    def kernel_fn(base):
        if mask_add is None:
            return functools.partial(base, **kwargs)
        kw = {k_: v_ for k_, v_ in kwargs.items() if k_ != "mask_ref"}

        def wrapped(seed_ref, *refs):
            mask_ref = refs[-1 - n_out]
            ins = refs[:-1 - n_out] + refs[-n_out:]
            return base(seed_ref, *ins, mask_ref=mask_ref, **kw)
        return wrapped

    if not backward:
        n_out = 2
        o, lse_out = pl.pallas_call(
            kernel_fn(_drop_fwd_kernel),
            grid=grid,
            interpret=interpret,
            in_specs=[seedspec, qspec, ktspec, kvspec, *mask_specs],
            out_specs=(qspec, lspec),
            out_shape=(
                jax.ShapeDtypeStruct((g, nq * q_blk, d), q.dtype),
                jax.ShapeDtypeStruct((g, nq * q_blk, 1), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=4 * g * s_q * s_k * d,
                bytes_accessed=(2 * g * s_q * d + 2 * g * s_k * d)
                * q.dtype.itemsize,
                transcendentals=g * s_q * s_k,
            ),
        )(seed.astype(jnp.int32), q, kt, v, *mask_ins)
        return o[:, :s_q], lse_out[:, :s_q]

    if pad_q:
        do = jnp.pad(do, ((0, 0), (0, pad_q), (0, 0)))
        out = jnp.pad(out, ((0, 0), (0, pad_q), (0, 0)))
        # pad rows: p = exp(0*scale - 0) = 1 would poison dk/dv; push the
        # padded rows' probabilities to exp(-inf - 0) = 0 via lse = +big
        lse = jnp.pad(lse, ((0, 0), (0, pad_q), (0, 0)),
                      constant_values=-DEFAULT_MASK_VALUE)
    kvaccspec = pl.BlockSpec((g_blk, s_k, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    n_out = 3
    dq, dk, dv = pl.pallas_call(
        kernel_fn(_drop_bwd_kernel),
        grid=grid,
        interpret=interpret,
        in_specs=[seedspec, qspec, ktspec, kvspec, qspec, qspec, lspec,
                  *mask_specs],
        out_specs=(qspec, kvaccspec, kvaccspec),
        out_shape=(
            jax.ShapeDtypeStruct((g, nq * q_blk, d), q.dtype),
            # fp32: dk/dv accumulate across the sequential q-block dim in
            # the resident output block; cast to the param dtype outside
            jax.ShapeDtypeStruct((g, s_k, d), jnp.float32),
            jax.ShapeDtypeStruct((g, s_k, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * g * s_q * s_k * d,
            bytes_accessed=8 * g * (s_q + s_k) * d * q.dtype.itemsize,
            transcendentals=g * s_q * s_k,
        ),
    )(seed.astype(jnp.int32), q, kt, v, do, out, lse, *mask_ins)
    return dq[:, :s_q], dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_dropout_attention(q, k, v, seed, mask_add, scale, kv_valid,
                             dropout_rate):
    out, _ = _dropout_attn_call(q, k, v, seed, scale, kv_valid,
                                dropout_rate, backward=False,
                                mask_add=mask_add)
    return out


def _flash_dropout_fwd_rule(q, k, v, seed, mask_add, scale, kv_valid,
                            dropout_rate):
    out, lse = _dropout_attn_call(q, k, v, seed, scale, kv_valid,
                                  dropout_rate, backward=False,
                                  mask_add=mask_add)
    return out, (q, k, v, seed, mask_add, out, lse)


def _flash_dropout_bwd_rule(scale, kv_valid, dropout_rate, res, do):
    q, k, v, seed, mask_add, out, lse = res
    dq, dk, dv = _dropout_attn_call(
        q, k, v, seed, scale, kv_valid, dropout_rate,
        backward=True, do=do, out=out, lse=lse, mask_add=mask_add)
    dmask = None if mask_add is None else jnp.zeros_like(mask_add)
    return dq, dk, dv, None, dmask


_flash_dropout_attention.defvjp(_flash_dropout_fwd_rule,
                                _flash_dropout_bwd_rule)


def flash_dropout_attention(q, k, v, *, dropout_rate, seed,
                            scale=None, kv_valid=None, key_mask=None):
    """Split-head attention with in-kernel probability dropout.

    q: (B, H, Sq, D); k, v: (B, H, Sk, D). ``seed``: (1,) int32 — the same
    seed replays the same mask (forward and backward share the stream).
    ``key_mask``: optional boolean (B, Sk), True = attend (torch
    key_padding_mask semantics inverted, matching the dispatcher's mask) —
    folded in as an additive -inf bias per (batch, key). No arbitrary-bias
    support (those fall back to XLA in the dispatcher); ``kv_valid`` masks
    trailing pad keys. TPU only (pltpu PRNG)."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if kv_valid is None or kv_valid >= s_k:
        kv_valid = s_k
    g = b * h
    mask_add = None
    if key_mask is not None:
        mask_add = jnp.where(key_mask, 0.0, DEFAULT_MASK_VALUE)
        mask_add = jnp.broadcast_to(
            mask_add.astype(jnp.float32)[:, None, None, :], (b, h, 1, s_k)
        ).reshape(g, 1, s_k)
    out = _flash_dropout_attention(
        q.reshape(g, s_q, d), k.reshape(g, s_k, d), v.reshape(g, s_k, d),
        seed, mask_add, scale, int(kv_valid), float(dropout_rate))
    return out.reshape(b, h, s_q, d)


# ---------------------------------------------------------------------------
# Packed-QKV attention: consumes the QKV projection output (B, S, 3·H·D)
# directly and emits (B, S, H·D).
#
# Why (measured on v5e, benchmarks/attn_packed.py): the split-heads path is
# HBM-bound end to end — the kernel itself is a ~1.4 ms/layer HBM pipeline
# (copy-only == full kernel), and the XLA transposes around it (q/k/v
# (B,S,3HD)→(B,H,S,D), kt pre-transpose, out transpose back) roughly triple
# that. (B,S,D·H) blocks also waste half of every 128-lane tile at D=64.
# Reading the packed projection output in place eliminates every transpose
# and all lane waste: 4.7 → 1.8 ms/layer including the QKV matmul.
# Head slices live at 64-lane offsets inside the block; the QK^T contraction
# runs lane×lane (Mosaic handles the operand swizzle in registers, which is
# free here — the kernel stays memory-bound).

_PACKED_VMEM_TARGET = 13 * 1024 * 1024  # b_blk=4 at ViT-B uses ~11.6 MB


def packed_flash_supported(b: int, s: int, three_hd: int,
                           itemsize: int) -> bool:
    """True if one image's packed working set fits the VMEM budget (large S
    — e.g. 1025 tokens — must use the split-head kernel instead)."""
    hd = three_hd // 3
    per_image = 2 * (s * three_hd + s * hd) * itemsize + 3 * s * s * 4
    return per_image <= _PACKED_VMEM_TARGET


def _pick_batch_block(b: int, s: int, hd: int, itemsize: int,
                      n_score_bufs: int = 3) -> int:
    """Largest divisor of b whose per-program working set fits VMEM:
    double-buffered qkv-in + out blocks, plus ~n live fp32 score buffers."""
    per_image = 2 * (s * 3 * hd + s * hd) * itemsize + n_score_bufs * s * s * 4
    cap = max(1, _PACKED_VMEM_TARGET // max(per_image, 1))
    blk = min(cap, 32, b)
    while blk > 1 and b % blk:
        blk -= 1
    return blk


def _dropout_keep(shape, rate):
    """In-kernel Bernoulli keep-mask from the already-seeded pltpu PRNG.
    P(keep) = 1 - rate; the caller must have called pltpu.prng_seed."""
    bits = pltpu.prng_random_bits(shape)
    # prng_random_bits yields raw 32-bit words typed int32 — compare
    # unsigned or half the range lands below any positive threshold.
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    thresh = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return bits >= thresh


def _packed_fwd_kernel(qkv_ref, o_ref, lse_ref, *, heads, dh, scale,
                       kv_valid=None, dropout_rate=0.0, seed_ref=None):
    hd = heads * dh
    if dropout_rate > 0.0:
        # Mask depends on (seed, program, head-iteration order) only; the
        # bwd kernel replays the identical stream (same b_blk enforced).
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                    # (b_blk, Sq, Sk)
        if kv_valid is not None and kv_valid < s.shape[-1]:
            # Trailing pad keys (sequence padded to a sublane-friendly S).
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
            s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            # torch MHA drops the normalized probabilities; dividing the
            # output by the undropped denom is equivalent.
            keep = _dropout_keep(e.shape, dropout_rate)
            e = jnp.where(keep, e, 0.0) * (1.0 / (1.0 - dropout_rate))
        o = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # divide the (S, D) output, not the (S, S) probabilities
        o_ref[:, :, h * dh:(h + 1) * dh] = (o / denom).astype(o_ref.dtype)
        lse_ref[:, :, h:h + 1] = m + jnp.log(denom)


def _packed_bwd_kernel(qkv_ref, do_ref, out_ref, lse_ref, dqkv_ref,
                       *, heads, dh, scale, kv_valid=None,
                       dropout_rate=0.0, seed_ref=None):
    """Recompute-from-(qkv, lse) backward; S×S never touches HBM."""
    hd = heads * dh
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        do = do_ref[:, :, h * dh:(h + 1) * dh]
        out = out_ref[:, :, h * dh:(h + 1) * dh]
        lse = lse_ref[:, :, h:h + 1]

        bmm_nt = lambda a, b: jax.lax.dot_general(   # contract lanes×lanes
            a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        bmm_tn = lambda a, b: jax.lax.dot_general(   # contract sublanes
            a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        bmm_nn = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        s = bmm_nt(q, k) * scale                    # (b, Sq, Sk)
        if kv_valid is not None and kv_valid < s.shape[-1]:
            # p = exp(-1e30 - lse) = 0 for pad keys, so dv/dk/ds of pad
            # columns vanish and the masked fwd's gradients stay exact.
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
            s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)
        delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1, keepdims=True)     # (b, Sq, 1)
        dp = bmm_nt(do, v)                          # (b, Sq, Sk)
        if dropout_rate > 0.0:
            # Replay the forward's keep-mask (same seed/program/head order).
            # With pd = keep⊙p/(1-r): dv = pdᵀdo, ds = p⊙(keep⊙dp/(1-r) − δ)
            # where δ = rowsum(do⊙out) already reflects the dropped out.
            keep = _dropout_keep(p.shape, dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p, 0.0) * inv
            dp = jnp.where(keep, dp, 0.0) * inv
        else:
            pd = p
        pb = pd.astype(do.dtype)
        dv = bmm_tn(pb, do)                         # (b, Sk, D)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = bmm_nn(ds, k)                          # (b, Sq, D)
        dk = bmm_tn(ds, q)                          # (b, Sk, D)
        dqkv_ref[:, :, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh] = (
            dk.astype(dqkv_ref.dtype))
        dqkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh] = (
            dv.astype(dqkv_ref.dtype))


def _packed_bwd_block(b, s, hd, itemsize):
    """bwd holds qkv + do + out + dqkv blocks and ~4 live score buffers."""
    per_image = 2 * (2 * s * 3 * hd + 2 * s * hd) * itemsize + 4 * s * s * 4
    cap = max(1, _PACKED_VMEM_TARGET // max(per_image, 1))
    b_blk = min(cap, 32, b)
    while b_blk > 1 and b % b_blk:
        b_blk -= 1
    return b_blk


def _packed_fwd(qkv, heads, scale, dropout_rate=0.0, seed=None,
                kv_valid=None):
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    b_blk = _pick_batch_block(b, s, hd, qkv.dtype.itemsize)
    if dropout_rate > 0.0:
        # The keep-mask stream is a function of (seed, program_id, head):
        # fwd and bwd must partition the batch identically to replay it.
        b_blk = min(b_blk, _packed_bwd_block(b, s, hd, qkv.dtype.itemsize))
    interpret = jax.default_backend() != "tpu"
    in_specs = [pl.BlockSpec((b_blk, s, three_hd), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    kern_kwargs = dict(heads=heads, dh=dh, scale=scale, kv_valid=kv_valid,
                       dropout_rate=dropout_rate)
    if dropout_rate > 0.0:
        def kernel(seed_ref, qkv_ref, o_ref, lse_ref):
            _packed_fwd_kernel(qkv_ref, o_ref, lse_ref,
                               seed_ref=seed_ref, **kern_kwargs)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = [seed.astype(jnp.int32)] + args
    else:
        kernel = functools.partial(_packed_fwd_kernel, **kern_kwargs)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b // b_blk,),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, s, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, s, heads), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * dh,
            bytes_accessed=4 * b * s * hd * qkv.dtype.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(*args)
    return out, lse


def _packed_bwd_pallas(qkv, do, out, lse, heads, scale,
                       dropout_rate=0.0, seed=None, kv_valid=None):
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    b_blk = _packed_bwd_block(b, s, hd, qkv.dtype.itemsize)
    if dropout_rate > 0.0:  # must mirror the fwd's partitioning (PRNG replay)
        b_blk = min(b_blk, _pick_batch_block(b, s, hd, qkv.dtype.itemsize))
    interpret = jax.default_backend() != "tpu"
    in_specs = [
        pl.BlockSpec((b_blk, s, three_hd), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_blk, s, heads), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv, do, out, lse]
    kern_kwargs = dict(heads=heads, dh=dh, scale=scale, kv_valid=kv_valid,
                       dropout_rate=dropout_rate)
    if dropout_rate > 0.0:
        def kernel(seed_ref, qkv_ref, do_ref, out_ref, lse_ref, dqkv_ref):
            _packed_bwd_kernel(qkv_ref, do_ref, out_ref, lse_ref, dqkv_ref,
                               seed_ref=seed_ref, **kern_kwargs)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = [seed.astype(jnp.int32)] + args
    else:
        kernel = functools.partial(_packed_bwd_kernel, **kern_kwargs)
    dqkv = pl.pallas_call(
        kernel,
        grid=(b // b_blk,),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b_blk, s, three_hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, three_hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * heads * s * s * dh,
            bytes_accessed=8 * b * s * hd * qkv.dtype.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(*args)
    return dqkv


# ---------------------------------------------------------------------------
# Fused attention sub-block: LN1 + QKV projection + attention + out
# projection + residual in ONE kernel (vanilla_vit.py:73-78 semantics).
#
# Why (measured on v5e, benchmarks/attn_fused_block.py): even with the
# packed kernel, the sub-block's stages round-trip HBM between XLA and
# Pallas — the LN output, the (B,S,3HD) qkv tensor, and the attention
# output are each written and re-read. Keeping Wqkv/Wout VMEM-resident
# (constant index map) and doing LN on the VPU drops the sub-block from
# 2.62 to 2.39 ms/layer at ViT-B/16. Inference path only: the backward is
# a jnp recompute (training stays on the packed kernel, whose bwd never
# materializes S×S).

_FUSED_VMEM_TARGET = 14 * 1024 * 1024


def fused_block_supported(s: int, hd: int, itemsize: int) -> bool:
    """True if the b_blk=1 fused working set fits VMEM. Mosaic
    double-buffers even constant-index weight blocks (measured), so the
    weights count twice; ViT-L bf16 (hd=1024) misses the budget and falls
    back to the packed path."""
    weights = 2 * (hd * 3 * hd + hd * hd) * itemsize
    blocks = 2 * 2 * s * hd * itemsize          # x + out, double-buffered
    interm = (s * 3 * hd * itemsize              # qkv
              + 3 * s * s * 4                    # live fp32 score buffers
              + 2 * s * hd * 4)                  # fp32 xf / out accum
    return weights + blocks + interm <= _FUSED_VMEM_TARGET


def _fused_block_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                        bout_ref, o_ref, *, heads, dh, scale, eps):
    x = x_ref[...]                                    # (1, S, HD)
    xf = x.astype(jnp.float32)

    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * g_ref[...] + b_ref[...]).astype(x.dtype)

    qkv = jax.lax.dot_general(                        # (1, S, 3HD)
        xn, wqkv_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[...]).astype(x.dtype)

    hd = heads * dh
    attn_out = []
    for h in range(heads):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn_out.append((o / denom).astype(x.dtype))
    attn = jnp.concatenate(attn_out, axis=-1)         # (1, S, HD)

    out = jax.lax.dot_general(
        attn, wout_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (out + bout_ref[...] + xf).astype(o_ref.dtype)


def _fused_block_fwd_pallas(x, gamma, beta, wqkv, bqkv, wout, bout,
                            heads, scale, eps):
    b, s, hd = x.shape
    dh = hd // heads
    const = lambda i: (0, 0)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_fused_block_kernel, heads=heads, dh=dh,
                          scale=scale, eps=eps),
        grid=(b,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, s, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, 3 * hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * hd * 4 * hd + 4 * b * s * s * hd,
            bytes_accessed=2 * b * s * hd * x.dtype.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(x, gamma, beta, wqkv, bqkv, wout, bout)


def _fused_block_ref(x, gamma, beta, wqkv, bqkv, wout, bout,
                     heads, scale, eps):
    """jnp twin: unit-test oracle and the recompute backward."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    qkv = (jnp.einsum("bsd,df->bsf", xn, wqkv,
                      preferred_element_type=jnp.float32)
           + bqkv).astype(x.dtype)
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, hd).astype(x.dtype)
    out = (jnp.einsum("bsd,df->bsf", o, wout,
                      preferred_element_type=jnp.float32) + bout)
    return (out + xf).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_attention_block(x, gamma, beta, wqkv, bqkv, wout, bout,
                          heads, scale, eps=1e-6):
    """x + out_proj(attention(qkv_proj(LN(x)))) as one Pallas program.

    x: (B, S, HD); gamma/beta/bqkv/bout: fp32 (1, dim) rows; wqkv/wout in
    the compute dtype. Inference fast path — gradients fall back to a jnp
    recompute of the whole sub-block (training uses the packed kernel).
    """
    return _fused_block_fwd_pallas(x, gamma, beta, wqkv, bqkv, wout, bout,
                                   heads, scale, eps)


def _fused_block_fwd_rule(x, gamma, beta, wqkv, bqkv, wout, bout,
                          heads, scale, eps):
    out = _fused_block_fwd_pallas(x, gamma, beta, wqkv, bqkv, wout, bout,
                                  heads, scale, eps)
    return out, (x, gamma, beta, wqkv, bqkv, wout, bout)


def _fused_block_bwd_rule(heads, scale, eps, res, do):
    _, vjp = jax.vjp(
        lambda *a: _fused_block_ref(*a, heads, scale, eps), *res)
    return vjp(do)


fused_attention_block.defvjp(_fused_block_fwd_rule, _fused_block_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _packed_flash(qkv, seed, heads, scale, dropout_rate, kv_valid):
    out, _ = _packed_fwd(qkv, heads, scale, dropout_rate, seed, kv_valid)
    return out


def _packed_flash_fwd_rule(qkv, seed, heads, scale, dropout_rate, kv_valid):
    out, lse = _packed_fwd(qkv, heads, scale, dropout_rate, seed, kv_valid)
    return out, (qkv, seed, out, lse)


def _packed_flash_bwd_rule(heads, scale, dropout_rate, kv_valid, res, do):
    qkv, seed, out, lse = res
    dqkv = _packed_bwd_pallas(qkv, do, out, lse, heads, scale,
                              dropout_rate, seed, kv_valid)
    return (dqkv, None)


_packed_flash.defvjp(_packed_flash_fwd_rule, _packed_flash_bwd_rule)


def packed_flash_attention(qkv, heads, scale=None, dropout_rate=0.0,
                           seed=None, kv_valid=None):
    """Self attention straight off the packed QKV projection.

    qkv: (B, S, 3·H·D) laid out [q | k | v] along the last axis (torch
    packed-MHA column order, vanilla_vit.py:67). Returns (B, S, H·D).

    ``dropout_rate`` > 0 applies probability dropout INSIDE the kernel via
    the pltpu PRNG (torch MHA dropout semantics; reference training configs
    set attention_dropout=0.1, utils/args.py:6-15). ``seed``: (1,) int32;
    the same seed replays the same mask (and the backward replays it too).
    TPU only — interpret mode has no pltpu PRNG, and off-TPU callers
    (ops.attention dispatcher) use the jnp path instead.

    ``kv_valid`` (static int) masks trailing pad keys: tokens >= kv_valid
    never receive attention (their own rows compute garbage the caller
    slices away). Lets models pad S to a sublane-friendly length (e.g.
    ViT's 197 -> 208) so every surrounding projection runs on clean tiles.
    """
    if scale is None:
        scale = 1.0 / ((qkv.shape[-1] // (3 * heads)) ** 0.5)
    if dropout_rate > 0.0 and seed is None:
        raise ValueError("dropout_rate > 0 requires a seed")
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    if kv_valid is not None:
        kv_valid = int(kv_valid)
        if kv_valid >= qkv.shape[1]:
            kv_valid = None
    return _packed_flash(qkv, seed, heads, scale, float(dropout_rate),
                         kv_valid)


# ---------------------------------------------------------------------------
# Multi-window pack kernel: block-diagonal MXU packing for tiny windows.
#
# Small-window attention (Swin N=49 dh=32, CIFAR Swin N=16 dh=32) issues
# tens of thousands of (N, dh) matmuls whose 32-deep contraction uses 1/4
# of the MXU and whose padded (N→56/128) HBM layouts inflate IO ~4× — the
# split-head path measures ~4% of roofline at Swin-T stage 1. This kernel
# packs P = 128//dh windows per MXU op:
#
#   scores: Q_bd (P·N, P·dh=128) block-diagonal · K_cat (N, 128) with
#           window i's k at lanes i·dh.. → (P·N, N); row-block i equals
#           q_i @ k_i^T with a FULL 128-deep contraction.
#   PV:     probs (P·N, N) @ V_cat (N, 128) → (P·N, 128); window i's
#           output is the (rows i·N.., lanes i·dh..) diagonal block.
#
# It consumes the packed (G, N, 3·H·dh) projection output directly (no
# head-split transposes) and takes the combined rel-pos + shift-mask bias
# pre-packed per window group. Measured at Swin-T/224 stage 1 (G=8192):
# 4.4 ms vs 7.1 ms for the split-head core (benchmarks/window_pack_kernel.py).

# Calibrated on-chip: in full-model context an estimated ~16 MB program
# (g_blk=16, fp32 bias) fails Mosaic's scoped-vmem check by 400 KB while
# ~14 MB compiles; the packed bias is stored in the compute dtype to get
# the per-window-bias (shifted-block) case under the line for bf16 models.
_WINDOW_PACK_VMEM_TARGET = 14 * 1024 * 1024


def window_pack_plan(g: int, n: int, heads: int, dh: int,
                     bias_windows: int, itemsize: int = 2):
    """Return (p, g_blk) for the multi-window kernel, or None if the shape
    doesn't qualify. ``bias_windows``: leading dim of the combined bias
    (1 = shared by all windows, n_win = per-window shift masks).

    ``bias_windows`` need NOT divide into packs evenly: the per-pack bias
    tile pattern is periodic in the pack index with period
    lcm(bias_windows, p) / p (windows are fastest-varying in g, so window
    indices cycle mod n_win across packs), and the kernel reads the bias
    through a modulo index map. This is what keeps e.g. SwinV2 @224
    stage 1 (56/8 = 7 windows per side -> n_win = 49, p = 4) on the pack
    kernel for its SHIFTED blocks — the r3 plan rejected any
    bias_windows % p != 0 and silently fell back to the ~2x slower
    split-head path for half of every SwinV2 stage."""
    if dh > 64 or 128 % dh != 0 or n > 128:
        return None
    p = 128 // dh
    if p < 2 or g % p:
        return None
    g_packs = g // p
    period = 1 if bias_windows <= 1 else math.lcm(bias_windows, p) // p

    def fits(g_blk):
        blk = g_blk * p
        hd = heads * dh
        in_b = 2 * blk * n * 3 * hd * itemsize        # qkv double-buffered
        out_b = 2 * blk * n * hd * itemsize
        live = g_blk * (p * n) * 128 * (3 * 4 + 2 * itemsize)
        # the packed bias is stored in the compute dtype (cast to fp32 at
        # the score add)
        bias_b = g_blk * heads * (p * n) * max(n, 128) * itemsize
        return in_b + out_b + live + bias_b <= _WINDOW_PACK_VMEM_TARGET

    # Candidates: divisors of the period (bias read through a modulo index
    # map) and period·2^k multiples (bias tiled to the block, constant
    # index). g_blk must also divide the pack count so the grid is exact.
    cands = {d for d in range(1, period + 1) if period % d == 0}
    cand = period
    while cand <= g_packs:
        cands.add(cand)
        cand *= 2
    best = None
    for c in sorted(cands):
        if c <= g_packs and g_packs % c == 0 and fits(c):
            best = c
    return (p, best) if best else None


def _window_pack_kernel(qkv_ref, bias_ref, o_ref, *, heads, dh, p, n, scale):
    """qkv_ref (Gb·P, N, 3·H·dh); bias_ref (Gb, H, P·N, N) fp32 (already
    tiled to the program's packs); o_ref (Gb·P, N, H·dh)."""
    hd = heads * dh
    gbp = qkv_ref.shape[0]
    gb = gbp // p
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]

        q4 = q.reshape(gb, p, n, dh)
        q_bd = jnp.concatenate([
            jnp.pad(q4[:, i], ((0, 0), (0, 0), (i * dh, (p - 1 - i) * dh)))
            for i in range(p)
        ], axis=1)                                       # (Gb, P·N, P·dh)
        k_cat = jnp.concatenate([
            k.reshape(gb, p, n, dh)[:, i] for i in range(p)
        ], axis=2)                                       # (Gb, N, P·dh)
        s = jax.lax.dot_general(
            q_bd, k_cat,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                        # (Gb, P·N, N)
        s = s + bias_ref[:, h].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        probs = (e / denom).astype(v.dtype)

        v_cat = jnp.concatenate([
            v.reshape(gb, p, n, dh)[:, i] for i in range(p)
        ], axis=2)                                       # (Gb, N, P·dh)
        o_all = jax.lax.dot_general(
            probs, v_cat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # (Gb, P·N, P·dh)
        o = jnp.concatenate([
            o_all[:, i * n:(i + 1) * n, i * dh:(i + 1) * dh][:, None]
            for i in range(p)
        ], axis=1).reshape(gbp, n, dh)
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def _pack_window_bias(bias, heads, n, p, g_blk, bias_dt):
    """Pack the (nW'|1, H, N, N) bias into per-pack (H, P·N, N) tiles:
    window i of pack j carries bias row-block (j·p + i) mod nW'. The tile
    pattern is periodic in j with period lcm(nW', p)/p; either the period
    tiles into g_blk (constant index map) or g_blk divides the period
    (modulo index map) — window_pack_plan only emits such g_blk.
    Returns (bias_pk, bias_index_map)."""
    bias_index_map = lambda i: (0, 0, 0, 0)
    if bias is None:
        bias_pk = jnp.zeros((g_blk, heads, p * n, n), bias_dt)
    else:
        nwp = bias.shape[0]
        if nwp == 1:
            tile = jnp.tile(bias[0].astype(bias_dt), (1, p, 1))  # (H,PN,N)
            bias_pk = jnp.broadcast_to(tile[None], (g_blk, heads, p * n, n))
        else:
            period = math.lcm(nwp, p) // p
            idx = np.arange(period * p).reshape(period, p) % nwp
            bp = bias.astype(bias_dt)[idx]           # (period, p, H, N, N)
            bp = bp.transpose(0, 2, 1, 3, 4).reshape(
                period, heads, p * n, n)
            if g_blk % period == 0:
                bias_pk = jnp.tile(bp, (g_blk // period, 1, 1, 1))
            else:  # g_blk | period (plan invariant)
                bias_pk = bp
                n_bias_blocks = period // g_blk
                bias_index_map = lambda i: (i % n_bias_blocks, 0, 0, 0)
    return bias_pk, bias_index_map


def _window_pack_fwd_pallas(qkv, bias, heads, scale, p, g_blk):
    g, n, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    blk = g_blk * p

    # bias VMEM-resident in the compute dtype (see target)
    bias_pk, bias_index_map = _pack_window_bias(
        bias, heads, n, p, g_blk, qkv.dtype)

    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_window_pack_kernel, heads=heads, dh=dh, p=p,
                          n=n, scale=scale),
        grid=(g // blk,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((blk, n, three_hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, heads, p * n, n), bias_index_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, n, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * heads * n * n * dh,
            bytes_accessed=4 * g * n * hd * qkv.dtype.itemsize,
            transcendentals=g * heads * n * n,
        ),
    )(qkv, bias_pk)


def _window_pack_ref(qkv, bias, heads, scale):
    """jnp twin (oracle + recompute backward)."""
    g, n, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    spl = lambda a: a.reshape(g, n, heads, dh).transpose(0, 2, 1, 3)
    q, k, v = spl(q), spl(k), spl(v)
    s = jnp.einsum("ghqd,ghkd->ghqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        b = bias.astype(jnp.float32)
        if b.shape[0] != g:
            b = jnp.tile(b, (g // b.shape[0], 1, 1, 1))
        s = s + b
    pr = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("ghqk,ghkd->ghqd", pr.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).reshape(g, n, hd).astype(qkv.dtype)


def _window_pack_bwd_gblk(g, n, heads, dh, bias_windows, itemsize=2):
    """g_blk for the backward kernel (same pack width p = 128/dh as the
    forward, its own VMEM budget: the bwd holds ~4 fp32 (P·N, N) score
    arrays plus the dS output per program)."""
    p = 128 // dh
    if p < 2 or g % p:
        return None
    g_packs = g // p
    period = 1 if bias_windows <= 1 else math.lcm(bias_windows, p) // p
    hd = heads * dh
    pn = p * n

    def fits(g_blk):
        blk = g_blk * p
        in_b = 2 * blk * n * 3 * hd * itemsize          # qkv
        do_b = 2 * blk * n * hd * itemsize
        dq_b = 2 * blk * n * 3 * hd * itemsize          # dqkv out
        ds_b = 2 * g_blk * heads * pn * n * itemsize    # dS out
        bias_b = g_blk * heads * pn * max(n, 128) * itemsize
        # transient per-head live set: 4 fp32 (PN, N) score-class arrays,
        # 2 bf16 copies, block-diag/cat operands and 3 fp32 (PN|N, 128)
        # grad outputs
        live = g_blk * (pn * n * (4 * 4 + 2 * itemsize)
                        + pn * 128 * (2 * itemsize + 2 * 4)
                        + n * 128 * (4 * itemsize + 2 * 4))
        return in_b + do_b + dq_b + ds_b + bias_b + live \
            <= _WINDOW_PACK_VMEM_TARGET

    cands = {d for d in range(1, period + 1) if period % d == 0}
    cand = period
    while cand <= g_packs:
        cands.add(cand)
        cand *= 2
    best = None
    for c in sorted(cands):
        if c <= g_packs and g_packs % c == 0 and fits(c):
            best = c
    return best


def _window_pack_bwd_kernel(qkv_ref, bias_ref, do_ref, dqkv_ref, ds_ref, *,
                            heads, dh, p, n, scale):
    """Backward twin of :func:`_window_pack_kernel` — same block-diagonal
    multi-window MXU packing, 5 (vs the forward's 2) full-depth matmuls
    per head. dK and dV contract over the packed P·N axis against the
    block-diagonal operand, so they come out in "cat" layout directly; only
    dQ needs the forward's diagonal-block extraction. dS (the score grad,
    pre-scale) is emitted per pack for the bias reduction outside."""
    hd = heads * dh
    gbp = qkv_ref.shape[0]
    gb = gbp // p
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        do = do_ref[:, :, h * dh:(h + 1) * dh]

        q4 = q.reshape(gb, p, n, dh)
        do4 = do.reshape(gb, p, n, dh)
        q_bd = jnp.concatenate([
            jnp.pad(q4[:, i], ((0, 0), (0, 0), (i * dh, (p - 1 - i) * dh)))
            for i in range(p)
        ], axis=1)                                       # (Gb, P·N, P·dh)
        do_bd = jnp.concatenate([
            jnp.pad(do4[:, i], ((0, 0), (0, 0), (i * dh, (p - 1 - i) * dh)))
            for i in range(p)
        ], axis=1)                                       # (Gb, P·N, P·dh)
        k_cat = jnp.concatenate([
            k.reshape(gb, p, n, dh)[:, i] for i in range(p)
        ], axis=2)                                       # (Gb, N, P·dh)
        v_cat = jnp.concatenate([
            v.reshape(gb, p, n, dh)[:, i] for i in range(p)
        ], axis=2)                                       # (Gb, N, P·dh)

        # recompute probs exactly as the forward (same max-subtraction)
        s = jax.lax.dot_general(
            q_bd, k_cat,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + bias_ref[:, h].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)   # (Gb, P·N, N) f32

        # dP[i] = dO[i] · V[i]^T : block-diagonal dO against cat V zeroes
        # the cross-window terms, exactly like the forward's scores
        dp = jax.lax.dot_general(
            do_bd, v_cat,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # (Gb, P·N, N)
        dsoft = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        ds_ref[:, h] = dsoft.astype(ds_ref.dtype)        # pre-scale: dBias

        probs_c = probs.astype(v.dtype)
        ds_c = (dsoft * scale).astype(q.dtype)

        # dQ[i] = dS[i] · K[i]: contract N, extract diagonal blocks
        dq_all = jax.lax.dot_general(
            ds_c, k_cat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # (Gb, P·N, P·dh)
        dq = jnp.concatenate([
            dq_all[:, i * n:(i + 1) * n, i * dh:(i + 1) * dh][:, None]
            for i in range(p)
        ], axis=1).reshape(gbp, n, dh)

        # dK[j][b,d] = Σ_a dS[j][a,b]·Q[j][a,d]: contracting the packed
        # P·N axis against block-diagonal Q lands each window's dK in its
        # own dh-column block — "cat" layout, no transpose needed
        dk_cat = jax.lax.dot_general(
            ds_c, q_bd,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # (Gb, N, P·dh)
        dv_cat = jax.lax.dot_general(
            probs_c, do_bd,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # (Gb, N, P·dh)
        dk = jnp.concatenate([
            dk_cat[:, :, i * dh:(i + 1) * dh][:, None] for i in range(p)
        ], axis=1).reshape(gbp, n, dh)
        dv = jnp.concatenate([
            dv_cat[:, :, i * dh:(i + 1) * dh][:, None] for i in range(p)
        ], axis=1).reshape(gbp, n, dh)

        dqkv_ref[:, :, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh] = dk.astype(
            dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh] = dv.astype(
            dqkv_ref.dtype)


def _window_pack_bwd_pallas(qkv, bias, do, heads, scale, p, g_blk):
    """Returns (dqkv, dbias|None). dbias is reduced in fp32 from the
    kernel's per-pack dS output via one lcm-periodic reshape (windows are
    fastest-varying in G, so window index = global index mod nW')."""
    g, n, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    blk = g_blk * p

    bias_pk, bias_index_map = _pack_window_bias(
        bias, heads, n, p, g_blk, qkv.dtype)

    interpret = jax.default_backend() != "tpu"
    dqkv, ds = pl.pallas_call(
        functools.partial(_window_pack_bwd_kernel, heads=heads, dh=dh, p=p,
                          n=n, scale=scale),
        grid=(g // blk,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((blk, n, three_hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, heads, p * n, n), bias_index_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, n, three_hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, heads, p * n, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n, three_hd), qkv.dtype),
            jax.ShapeDtypeStruct((g // p, heads, p * n, n), qkv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * g * heads * n * n * dh,
            bytes_accessed=8 * g * n * hd * qkv.dtype.itemsize,
            transcendentals=g * heads * n * n,
        ),
    )(qkv, bias_pk, do)

    if bias is None:
        return dqkv, None
    nwp = bias.shape[0]
    lcm = math.lcm(nwp, p)
    # ds rows: pack j, window slot i → global window (j·p + i) mod nW'.
    # Sum pack cycles (period lcm/p), unstack slots, fold lcm/nW' copies.
    ds6 = ds.astype(jnp.float32).reshape(
        g // lcm, lcm // p, heads, p, n, n).sum(0)
    dbias = ds6.transpose(0, 2, 1, 3, 4).reshape(
        lcm // nwp, nwp, heads, n, n).sum(0)
    return dqkv, dbias.astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _window_pack(qkv, bias, heads, scale, p, g_blk):
    return _window_pack_fwd_pallas(qkv, bias, heads, scale, p, g_blk)


def _window_pack_fwd_rule(qkv, bias, heads, scale, p, g_blk):
    out = _window_pack_fwd_pallas(qkv, bias, heads, scale, p, g_blk)
    return out, (qkv, bias)


def _window_pack_bwd_rule(heads, scale, p, g_blk, res, do):
    qkv, bias = res
    g, n, three_hd = qkv.shape
    dh = three_hd // (3 * heads)
    nwp = 1 if bias is None else bias.shape[0]
    bwd_gblk = _window_pack_bwd_gblk(g, n, heads, dh, nwp,
                                     qkv.dtype.itemsize)
    if bwd_gblk is not None:
        # Pallas backward twin (r5): the split-head jnp recompute this
        # replaced runs at ~4% of roofline at window shapes — it held
        # Swin-T training at 8.3% MFU (hier_train_r05) while the forward
        # rode the pack kernel
        return _window_pack_bwd_pallas(qkv, bias, do, heads, scale, p,
                                       bwd_gblk)
    if bias is None:
        _, vjp = jax.vjp(
            lambda a: _window_pack_ref(a, None, heads, scale), qkv)
        return vjp(do) + (None,)
    # the fwd kernel stores the bias VMEM-resident in the COMPUTE dtype
    # (fp32(bf16(bias)) at the score add — see _window_pack_fwd_pallas);
    # recompute through the same rounding so the gradients are consistent
    # with the actual forward at bf16 (ADVICE r2)
    _, vjp = jax.vjp(
        lambda a, b: _window_pack_ref(
            a, b.astype(a.dtype), heads, scale), qkv, bias)
    return vjp(do)


_window_pack.defvjp(_window_pack_fwd_rule, _window_pack_bwd_rule)


def window_packed_attention(qkv, bias, heads, scale=None, plan=None):
    """Multi-window attention on the packed projection output.

    qkv: (G, N, 3·H·dh) with G = batch·n_win (window fastest-varying);
    bias: (1 | n_win, H, N, N) combined rel-pos (+shift/pad-mask) bias or
    None. ``plan`` from :func:`window_pack_plan` (computed if omitted)."""
    g, n, three_hd = qkv.shape
    dh = three_hd // (3 * heads)
    if scale is None:
        scale = 1.0 / dh ** 0.5
    if plan is None:
        plan = window_pack_plan(
            g, n, heads, dh, 1 if bias is None else bias.shape[0],
            qkv.dtype.itemsize)
    if plan is None:
        raise ValueError("shape not supported; check window_pack_plan first")
    p, g_blk = plan
    return _window_pack(qkv, bias, heads, float(scale), p, g_blk)


def window_batched_plan(g: int, n: int, heads: int, dh: int,
                        bias_windows: int, itemsize: int = 2):
    """blk for the per-head batched window kernel, or None.

    Unlike the pack kernel this one keeps each window's attention as a
    small batched matmul (no block-diagonal packing) — measured FASTER
    than both pack and fused at unshifted Swin stage-1/2/4 shapes
    (window_variant_sweep_r05: s1 4.90 vs pack 5.19 / fused 5.25 ms,
    s2 2.98 vs 3.17 / 3.66) because the packing relayout isn't free and
    the MXU is idle either way at N=49. Requires g % blk == 0 and the
    bias leading dim to be 1 or divisible by blk (grid-modulo indexing)."""
    if n > 128:
        return None
    hd = heads * dh
    for blk in (32, 16, 8):
        if g % blk or (bias_windows > 1 and bias_windows % blk):
            continue
        in_b = 2 * blk * n * 3 * hd * itemsize
        out_b = 2 * blk * n * hd * itemsize
        bias_b = (min(blk, max(bias_windows, 1)) * heads * n
                  * max(n, 128) * itemsize)
        live = blk * n * (n * 3 * 4 + dh * 2 * 4)
        if in_b + out_b + bias_b + live <= _WINDOW_PACK_VMEM_TARGET:
            return blk
    return None


def _window_batched_kernel(qkv_ref, bias_ref, o_ref, *, heads, dh, scale):
    """qkv_ref (blk, N, 3·H·dh); bias_ref (blk | 1, H, N, N) fp32;
    o_ref (blk, N, H·dh). Plain per-head batched attention."""
    hd = heads * dh
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        # (blk | 1, N, N) broadcasts over windows; bias VMEM-resident in
        # the compute dtype, same rounding as the pack kernel (whose
        # backward this kernel shares)
        s = s + bias_ref[:, h].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        o = jax.lax.dot_general(
            probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def _window_batched_fwd_pallas(qkv, bias, heads, scale, blk):
    g, n, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    if bias is None:
        bias_f = jnp.zeros((1, heads, n, n), qkv.dtype)
    else:
        bias_f = bias.astype(qkv.dtype)
    nwp = bias_f.shape[0]
    if nwp == 1:
        bspec = pl.BlockSpec((1, heads, n, n), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        bspec = pl.BlockSpec((blk, heads, n, n),
                             lambda i: (i % (nwp // blk), 0, 0, 0),
                             memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_window_batched_kernel, heads=heads, dh=dh,
                          scale=scale),
        grid=(g // blk,),
        interpret=interpret,
        in_specs=[pl.BlockSpec((blk, n, three_hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM), bspec],
        out_specs=pl.BlockSpec((blk, n, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * heads * n * n * dh,
            bytes_accessed=4 * g * n * hd * qkv.dtype.itemsize,
            transcendentals=g * heads * n * n,
        ),
    )(qkv, bias_f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _window_batched(qkv, bias, heads, scale, blk):
    return _window_batched_fwd_pallas(qkv, bias, heads, scale, blk)


def _window_batched_fwd_rule(qkv, bias, heads, scale, blk):
    return _window_batched_fwd_pallas(qkv, bias, heads, scale, blk), \
        (qkv, bias)


def _window_batched_bwd_rule(heads, scale, blk, res, do):
    # same (G, N, 3·H·dh) layout as the pack kernel — share its Pallas
    # backward (the fwd kernels differ only in how they feed the MXU)
    qkv, bias = res
    g, n, three_hd = qkv.shape
    dh = three_hd // (3 * heads)
    nwp = 1 if bias is None else bias.shape[0]
    if dh <= 64 and 128 % dh == 0 and g % (128 // dh) == 0:
        p = 128 // dh
        bwd_gblk = _window_pack_bwd_gblk(g, n, heads, dh, nwp,
                                         qkv.dtype.itemsize)
        if bwd_gblk is not None:
            return _window_pack_bwd_pallas(qkv, bias, do, heads, scale, p,
                                           bwd_gblk)
    if bias is None:
        _, vjp = jax.vjp(
            lambda a: _window_pack_ref(a, None, heads, scale), qkv)
        return vjp(do) + (None,)
    _, vjp = jax.vjp(
        lambda a, b: _window_pack_ref(a, b.astype(a.dtype), heads, scale),
        qkv, bias)
    return vjp(do)


_window_batched.defvjp(_window_batched_fwd_rule, _window_batched_bwd_rule)


def window_batched_attention(qkv, bias, heads, scale=None, blk=None):
    """Per-head batched window attention (the r5 'batched32' variant).

    qkv: (G, N, 3·H·dh), G = batch·n_win (window fastest-varying);
    bias: (1 | n_win, H, N, N) or None. ``blk`` from
    :func:`window_batched_plan` (computed if omitted)."""
    g, n, three_hd = qkv.shape
    dh = three_hd // (3 * heads)
    if scale is None:
        scale = 1.0 / dh ** 0.5
    if blk is None:
        blk = window_batched_plan(
            g, n, heads, dh, 1 if bias is None else bias.shape[0],
            qkv.dtype.itemsize)
    if blk is None:
        raise ValueError("shape not supported; check window_batched_plan")
    return _window_batched(qkv, bias, heads, float(scale), blk)


# ---------------------------------------------------------------------------
# Fused NHWC windowed attention: cyclic shift + window partition + packed
# attention + window reverse + un-shift in ONE kernel.
#
# Measured (benchmarks/swin_layout_ablation.py, v5e): Swin-T/224 spends
# ~2.8 ms/fwd on the window partition/reverse relayouts and ~1.4 ms on the
# jnp.roll pair — 12% of the 33 ms forward, pure HBM traffic the MXU never
# sees. This kernel deletes both: the feature map stays in HBM in NHWC
# (memory_space=ANY); each program manually DMAs one ROW-SLAB of windows
# (bb images × wh rows × full width) into VMEM, with the cyclic row shift
# folded into the DMA's row indexing (the last slab wraps: two copies) and
# the column shift done as an in-VMEM slice-concat. Window extraction and
# reversal become VMEM-local reshapes, and the attention core is the same
# block-diagonal multi-window MXU packing as _window_pack_kernel, packing
# across images in the slab so widths that don't divide the pack (SwinV2's
# nw=7, p=4) still qualify.
#
# Numerics are EXACTLY the cyclic-shift scheme of the reference
# (swin_transformer.py:74-118): roll(-s) -> partition -> softmax(qk+bias)v
# -> reverse -> roll(+s); the 9-region shift mask rides in unchanged.
_WINDOW_FUSED_VMEM_TARGET = 13 * 1024 * 1024


def window_fused_plan(b: int, hp: int, wp: int, wh: int, ww: int,
                      heads: int, dh: int, bias_windows: int,
                      itemsize: int = 2):
    """Return (p, bb) for the fused NHWC window kernel, or None.

    ``bb``: images per program (the slab is (bb, wh, wp)). Packs of
    p = 128//dh windows are formed over the slab's bb·nw windows, so the
    only divisibility demand is (bb·nw) % p == 0 and bb | b — the bias
    lane pattern depends only on the window's column index (window id
    k·nw + ((j·p+i) mod nw)), identical for every image in the slab.

    Mosaic's sliced-DMA legality (measured): the second-minor dim of a
    4D HBM slice must be 8-aligned and the lane dim 128-aligned — so the
    map width must satisfy wp % 8 == 0 and the q/k/v sections are padded
    to sec = roundup(H·dh, 128) lanes (zero weight columns, so the dense
    projection emits the padded layout at +sec/hd GEMM cost instead of an
    HBM pad pass). Covers Swin @224 stage 1 (wp=56) and ALL SwinV2
    stages (window-8 padding makes every map 8-aligned: 56/32/16/8)."""
    n = wh * ww
    if dh > 64 or 128 % dh != 0 or n > 128:
        return None
    if hp % wh or wp % ww or hp < wh or wp < ww:
        return None
    if wp % 8:
        return None
    p = 128 // dh
    if p < 2:
        return None
    nw = wp // ww
    hd = heads * dh
    sec = -(-hd // 128) * 128

    def fits(bb):
        gb = bb * nw // p
        slab_in = bb * wh * wp * 3 * sec * itemsize
        slab_out = bb * wh * wp * sec * itemsize
        # shifted + windowed VMEM copies of the slab, fp32 score temps
        # (s, e, probs ~3x), packed q_bd/k_cat/v_cat, double-buffered bias
        live = 2 * slab_in + slab_out
        f32 = 3 * gb * (p * n) * max(n, 128) * 4
        packed = gb * (p * n + 2 * n) * 128 * itemsize
        bias_b = 2 * gb * heads * (p * n) * max(n, 128) * itemsize
        return (slab_in + slab_out + live + f32 + packed + bias_b
                <= _WINDOW_FUSED_VMEM_TARGET)

    best = None
    for bb in range(1, b + 1):
        if b % bb or (bb * nw) % p:
            continue
        if fits(bb):
            best = bb  # largest fitting divisor: amortizes the serial DMA
    return (p, best) if best else None


def _pack_attn_math(z, bias_ref, heads, dh, p, n, sec, scale):
    """Block-diagonal multi-window attention on a packed window batch
    (see _window_pack_kernel for the MXU-packing derivation).

    z: (G, N, 3·sec) value with q/k/v sections at ``sec`` lane strides
    (lane-padded when H·dh isn't 128-aligned; the per-head slices never
    touch the pad lanes); bias_ref: VMEM ref whose [0, :, h] is the fp32
    (Gb, P·N, N) bias tile for head h. Returns (G, N, sec)."""
    g = z.shape[0]
    gb = g // p
    hd = heads * dh
    outs = []
    for h in range(heads):
        q = z[:, :, h * dh:(h + 1) * dh]
        kk = z[:, :, sec + h * dh:sec + (h + 1) * dh]
        v = z[:, :, 2 * sec + h * dh:2 * sec + (h + 1) * dh]
        q4 = q.reshape(gb, p, n, dh)
        q_bd = jnp.concatenate([
            jnp.pad(q4[:, j], ((0, 0), (0, 0), (j * dh, (p - 1 - j) * dh)))
            for j in range(p)
        ], axis=1)                                       # (Gb, P·N, P·dh)
        k_cat = jnp.concatenate([
            kk.reshape(gb, p, n, dh)[:, j] for j in range(p)
        ], axis=2)                                       # (Gb, N, P·dh)
        s = jax.lax.dot_general(
            q_bd, k_cat,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + bias_ref[0, :, h].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        v_cat = jnp.concatenate([
            v.reshape(gb, p, n, dh)[:, j] for j in range(p)
        ], axis=2)
        o_all = jax.lax.dot_general(
            probs, v_cat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # (Gb, P·N, P·dh)
        outs.append(jnp.concatenate([
            o_all[:, j * n:(j + 1) * n, j * dh:(j + 1) * dh][:, None]
            for j in range(p)
        ], axis=1).reshape(g, n, dh))
    if sec != hd:  # zero the pad lanes of the output map
        outs.append(jnp.zeros((g, n, sec - hd), outs[0].dtype))
    return jnp.concatenate(outs, axis=-1)                # (G, N, sec)


def window_fused_flat_plan(b: int, hp: int, wp: int, wh: int, ww: int,
                           heads: int, dh: int, bias_windows: int,
                           itemsize: int = 2):
    """Plan for the FLAT fused window kernel: whole images per program on
    the (B·Hp·Wp, 3·sec) row-major view, or None.

    The slab kernel's DMA needs wp % 8 == 0 (Mosaic sublane tiling); maps
    like 28/14/7 fail it. Flattening (Hp, Wp) makes the image a contiguous
    row-range whose slice is legal whenever (bb·Hp·Wp) % 8 == 0 — and with
    whole images resident, BOTH cyclic shifts and the window partition
    reduce to static row arithmetic on the flat scratch (window row-strips
    are contiguous runs of flat rows; the wrapped strips split in two).
    Returns (p, bb, 'flat')."""
    n = wh * ww
    if dh > 64 or 128 % dh != 0 or n > 128:
        return None
    if hp % wh or wp % ww or hp < wh or wp < ww:
        return None
    p = 128 // dh
    if p < 2:
        return None
    nw_img = (hp // wh) * (wp // ww)
    hw = hp * wp
    sec = -(-(heads * dh) // 128) * 128

    def fits(bb):
        gb = bb * nw_img // p
        flat_in = bb * hw * 3 * sec * itemsize
        flat_out = bb * hw * sec * itemsize
        live = 2 * flat_in + flat_out
        f32 = 3 * gb * (p * n) * max(n, 128) * 4
        packed = gb * (p * n + 2 * n) * 128 * itemsize
        bias_b = 2 * gb * heads * (p * n) * max(n, 128) * itemsize
        return (flat_in + flat_out + live + f32 + packed + bias_b
                <= _WINDOW_FUSED_VMEM_TARGET)

    best = None
    for bb in range(1, b + 1):
        if b % bb or (bb * nw_img) % p or (bb * hw) % 8:
            continue
        if fits(bb):
            best = bb
    return (p, best, "flat") if best else None


def _window_fused_flat_kernel(bias_ref, qkv_hbm, o_hbm, in_sc, out_sc,
                              sems, *, heads, dh, p, wh, ww, hp, wp, sh,
                              sw, bb, sec, scale):
    """Grid (B//bb,). qkv_hbm (B·Hp·Wp, 3·sec) and o_hbm (B·Hp·Wp, sec)
    flat row-major in HBM; whole images are DMA'd per program and the
    shifted window partition/reverse are static flat-row slices."""
    i = pl.program_id(0)
    hw = hp * wp
    n = wh * ww
    nr, nw = hp // wh, wp // ww

    cp = pltpu.make_async_copy(
        qkv_hbm.at[pl.ds(i * (bb * hw), bb * hw)], in_sc, sems.at[0])
    cp.start()
    cp.wait()
    x = in_sc[...]

    # strip table: window (b_l, R, c) row r reads ROLLED img row R·wh+r =
    # original row (R·wh+r+sh) mod Hp, cols (c·ww+sw .. +ww) mod Wp —
    # contiguous flat rows, split in two when the column range wraps
    def table(b_l, R, c):
        pieces = []
        for r in range(wh):
            gr = (R * wh + r + sh) % hp
            base = b_l * hw + gr * wp
            c0 = c * ww + sw
            if c0 + ww <= wp:
                pieces.append((base + c0, ww))
            else:
                pieces.append((base + c0, wp - c0))
                pieces.append((base, ww - (wp - c0)))
        return pieces
    wins = []
    order = [(b_l, R, c) for b_l in range(bb)
             for R in range(nr) for c in range(nw)]
    for (b_l, R, c) in order:
        pieces = [x[a:a + ln] for a, ln in table(b_l, R, c)]
        win = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=0)
        wins.append(win[None])                           # (1, N, 3sec)
    z = (wins[0] if len(wins) == 1
         else jnp.concatenate(wins, axis=0))             # (bb·nW, N, 3sec)

    o = _pack_attn_math(z, bias_ref, heads, dh, p, n, sec, scale)
    o = o.astype(out_sc.dtype)

    for idx, (b_l, R, c) in enumerate(order):
        w_o = o[idx]                                     # (N, sec)
        row = 0
        for a, ln in table(b_l, R, c):
            out_sc[a:a + ln, :] = w_o[row:row + ln, :]
            row += ln

    cp = pltpu.make_async_copy(
        out_sc, o_hbm.at[pl.ds(i * (bb * hw), bb * hw)], sems.at[1])
    cp.start()
    cp.wait()


def _window_fused_kernel(bias_ref, qkv_hbm, o_hbm, in_sc, out_sc, sems, *,
                         heads, dh, p, wh, ww, nw, nr, sh, sw, bb, sec,
                         scale):
    """Grid (B//bb, nr). bias_ref (1, Gb, H, P·N, N) VMEM; qkv_hbm
    (B, Hp, Wp, 3·H·dh) and o_hbm (B, Hp, Wp, H·dh) stay in HBM (ANY)."""
    i = pl.program_id(0)
    k = pl.program_id(1)
    n = wh * ww
    hd = heads * dh
    wp = nw * ww
    hp = nr * wh
    gb = bb * nw // p

    # --- load the slab: rolled rows (k·wh+sh .. +wh-1) mod Hp -------------
    if sh == 0:
        cp = pltpu.make_async_copy(
            qkv_hbm.at[pl.ds(i * bb, bb), pl.ds(k * wh, wh)],
            in_sc, sems.at[0])
        cp.start()
        cp.wait()
    else:
        @pl.when(k < nr - 1)
        def _straight():
            cp = pltpu.make_async_copy(
                qkv_hbm.at[pl.ds(i * bb, bb), pl.ds(k * wh + sh, wh)],
                in_sc, sems.at[0])
            cp.start()
            cp.wait()

        @pl.when(k == nr - 1)
        def _wrap():
            ca = pltpu.make_async_copy(
                qkv_hbm.at[pl.ds(i * bb, bb), pl.ds(hp - wh + sh, wh - sh)],
                in_sc.at[:, pl.ds(0, wh - sh)], sems.at[0])
            cb = pltpu.make_async_copy(
                qkv_hbm.at[pl.ds(i * bb, bb), pl.ds(0, sh)],
                in_sc.at[:, pl.ds(wh - sh, sh)], sems.at[1])
            ca.start()
            cb.start()
            ca.wait()
            cb.wait()

    x = in_sc[...]
    if sw:
        x = jnp.concatenate([x[:, :, sw:, :], x[:, :, :sw, :]], axis=2)
    # window extraction: (bb, wh, Wp, 3hd) -> (bb·nw, N, 3hd). Mosaic can't
    # shape-cast a merge of (wh, ww) when ww isn't sublane-aligned, but it
    # CAN concatenate unaligned sizes along the sublane dim (the pack
    # kernel's q_bd build relies on the same) — so each window is built as
    # a concat of its wh row-strips.
    wins = []
    for c in range(nw):
        strips = [x[:, r, c * ww:(c + 1) * ww, :] for r in range(wh)]
        win = strips[0] if wh == 1 else jnp.concatenate(strips, axis=1)
        wins.append(win[:, None])                        # (bb, 1, N, 3sec)
    z = (wins[0] if nw == 1 else jnp.concatenate(wins, axis=1)).reshape(
        bb * nw, n, 3 * sec)

    o = _pack_attn_math(z, bias_ref, heads, dh, p, n, sec, scale)

    # --- window reverse + column un-shift, VMEM-local ---------------------
    o = o.reshape(bb, nw, n, sec)
    rows = []
    for r in range(wh):
        row = [o[:, c, r * ww:(r + 1) * ww, :] for c in range(nw)]
        row = row[0] if nw == 1 else jnp.concatenate(row, axis=1)
        rows.append(row[:, None])                        # (bb, 1, Wp, hd)
    o = rows[0] if wh == 1 else jnp.concatenate(rows, axis=1)
    if sw:
        o = jnp.concatenate([o[:, :, wp - sw:, :], o[:, :, :wp - sw, :]],
                            axis=2)
    out_sc[...] = o.astype(out_sc.dtype)

    # --- store with the same rolled-row mapping ---------------------------
    if sh == 0:
        cp = pltpu.make_async_copy(
            out_sc, o_hbm.at[pl.ds(i * bb, bb), pl.ds(k * wh, wh)],
            sems.at[2])
        cp.start()
        cp.wait()
    else:
        @pl.when(k < nr - 1)
        def _straight_out():
            cp = pltpu.make_async_copy(
                out_sc, o_hbm.at[pl.ds(i * bb, bb), pl.ds(k * wh + sh, wh)],
                sems.at[2])
            cp.start()
            cp.wait()

        @pl.when(k == nr - 1)
        def _wrap_out():
            ca = pltpu.make_async_copy(
                out_sc.at[:, pl.ds(0, wh - sh)],
                o_hbm.at[pl.ds(i * bb, bb), pl.ds(hp - wh + sh, wh - sh)],
                sems.at[2])
            cb = pltpu.make_async_copy(
                out_sc.at[:, pl.ds(wh - sh, sh)],
                o_hbm.at[pl.ds(i * bb, bb), pl.ds(0, sh)], sems.at[0])
            ca.start()
            cb.start()
            ca.wait()
            cb.wait()


def _window_fused_fwd_pallas(qkv_map, bias, heads, window, shift, scale,
                             plan):
    b, hp, wp, three_sec = qkv_map.shape
    wh, ww = window
    sh, sw = shift
    flat = len(plan) == 3
    p, bb = plan[0], plan[1]
    dh = 128 // p
    hd = heads * dh
    sec = three_sec // 3          # lane-padded section stride (>= hd)
    nr, nw = hp // wh, wp // ww
    n = wh * ww
    # slab mode packs the nw windows of one row-slab; flat mode packs all
    # nr·nw windows of whole images, so its bias pattern collapses to a
    # single program-invariant tile (nr_eff = 1)
    nw_eff = nr * nw if flat else nw
    nr_eff = 1 if flat else nr
    gb = bb * nw_eff // p

    # packed bias (nr_eff|1, Gb, H, P·N, N): pack j lane i of slab k
    # carries window id k·nw_eff + ((j·p+i) mod nw_eff) — column-periodic,
    # so the pattern is identical for every image packed into the slab
    bias_dt = qkv_map.dtype
    if bias is None:
        bias_pk = jnp.zeros((1, gb, heads, p * n, n), bias_dt)
        shared = True
    else:
        nwp = bias.shape[0]
        if nwp == 1:
            tile = jnp.tile(bias[0].astype(bias_dt), (1, p, 1))  # (H,PN,N)
            bias_pk = jnp.broadcast_to(
                tile[None, None], (1, gb, heads, p * n, n))
            shared = True
        else:  # per-window (shift/pad masks): nwp == nr·nw
            lane = np.arange(gb * p).reshape(gb, p) % nw_eff
            idx = np.arange(nr_eff)[:, None, None] * nw_eff + lane[None]
            bp = bias.astype(bias_dt)[idx]    # (nr_eff, Gb, P, H, N, N)
            bias_pk = bp.transpose(0, 1, 3, 2, 4, 5).reshape(
                nr_eff, gb, heads, p * n, n)
            shared = nr_eff == 1

    interpret = jax.default_backend() != "tpu"
    bias_spec = pl.BlockSpec((1, gb, heads, p * n, n),
                             memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * b * nr * nw * heads * n * n * dh,
        bytes_accessed=4 * b * hp * wp * hd * qkv_map.dtype.itemsize,
        transcendentals=b * nr * nw * heads * n * n,
    )
    if flat:
        bmap = lambda i: (0, 0, 0, 0, 0)
        bias_spec = pl.BlockSpec((1, gb, heads, p * n, n), bmap,
                                 memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _window_fused_flat_kernel, heads=heads, dh=dh, p=p, wh=wh,
            ww=ww, hp=hp, wp=wp, sh=sh, sw=sw, bb=bb, sec=sec, scale=scale)
        out = pl.pallas_call(
            kernel,
            grid=(b // bb,),
            interpret=interpret,
            in_specs=[bias_spec, pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct((b * hp * wp, sec),
                                           qkv_map.dtype),
            scratch_shapes=[
                pltpu.VMEM((bb * hp * wp, three_sec), qkv_map.dtype),
                pltpu.VMEM((bb * hp * wp, sec), qkv_map.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=cost,
        )(bias_pk, qkv_map.reshape(b * hp * wp, three_sec))
        return out.reshape(b, hp, wp, sec)

    bmap = ((lambda i, k: (0, 0, 0, 0, 0)) if shared
            else (lambda i, k: (k, 0, 0, 0, 0)))
    bias_spec = pl.BlockSpec((1, gb, heads, p * n, n), bmap,
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _window_fused_kernel, heads=heads, dh=dh, p=p, wh=wh, ww=ww,
        nw=nw, nr=nr, sh=sh, sw=sw, bb=bb, sec=sec, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b // bb, nr),
        interpret=interpret,
        in_specs=[
            bias_spec,
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, sec), qkv_map.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, wh, wp, three_sec), qkv_map.dtype),
            pltpu.VMEM((bb, wh, wp, sec), qkv_map.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=cost,
    )(bias_pk, qkv_map)


def _window_fused_ref(qkv_map, bias, heads, window, shift, scale,
                      hd=None, attn=None):
    """jnp twin (oracle + recompute backward): the explicit
    roll->partition->attend->reverse->unroll chain. ``hd``: real H·dh when
    the map's q/k/v sections are lane-padded to sec = map_C // 3.
    ``attn``: override for the windowed core (the fused backward swaps in
    the Pallas pack kernel so only the layout chain is jnp)."""
    b, hp, wp, three_sec = qkv_map.shape
    sec = three_sec // 3
    if hd is None:
        hd = sec
    wh, ww = window
    sh, sw = shift
    x = qkv_map
    if hd != sec:  # strip the pad lanes: sections at 0 / sec / 2·sec
        x = jnp.concatenate(
            [x[..., s * sec:s * sec + hd] for s in range(3)], axis=-1)
    if sh or sw:
        x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))
    x = x.reshape(b, hp // wh, wh, wp // ww, ww, 3 * hd)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b * (hp // wh) * (wp // ww), wh * ww, 3 * hd)
    if attn is None:
        o = _window_pack_ref(x, bias, heads, scale)
    else:
        o = attn(x, bias)
    o = o.reshape(b, hp // wh, wp // ww, wh, ww, hd)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, hd)
    if sh or sw:
        o = jnp.roll(o, shift=(sh, sw), axis=(1, 2))
    if hd != sec:
        o = jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, sec - hd)))
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _window_fused(qkv_map, bias, heads, window, shift, scale, plan):
    return _window_fused_fwd_pallas(
        qkv_map, bias, heads, window, shift, scale, plan)


def _window_fused_fwd_rule(qkv_map, bias, heads, window, shift, scale, plan):
    out = _window_fused_fwd_pallas(
        qkv_map, bias, heads, window, shift, scale, plan)
    return out, (qkv_map, bias)


def _window_fused_bwd_rule(heads, window, shift, scale, plan, res, do):
    qkv_map, bias = res
    dh = 128 // plan[0]
    hd = heads * dh
    b, hp, wp, _ = qkv_map.shape
    wh, ww = window
    g = b * (hp // wh) * (wp // ww)
    nwp = 1 if bias is None else bias.shape[0]
    pack_plan = window_pack_plan(g, wh * ww, heads, dh, nwp,
                                 qkv_map.dtype.itemsize)
    if pack_plan is not None:
        # Differentiate the (cheap, XLA-native) roll/partition/reverse
        # layout chain around the PALLAS pack core — its custom vjp is the
        # r5 backward kernel. _window_fused_ref with the split-head jnp
        # core is the ~4%-of-roofline path that held windowed-model
        # training at 5-8% MFU (hier_train_r05).
        def core(a, c):
            return _window_fused_ref(
                a, c, heads, window, shift, scale, hd,
                attn=lambda x, cb: _window_pack(
                    x, cb, heads, scale, *pack_plan))

        if bias is None:
            _, vjp = jax.vjp(lambda a: core(a, None), qkv_map)
            return vjp(do) + (None,)
        _, vjp = jax.vjp(core, qkv_map, bias)
        return vjp(do)
    if bias is None:
        _, vjp = jax.vjp(
            lambda a: _window_fused_ref(a, None, heads, window, shift,
                                        scale, hd), qkv_map)
        return vjp(do) + (None,)
    # fwd holds the bias VMEM-resident in the compute dtype; recompute
    # through the same rounding (see _window_pack_bwd_rule)
    _, vjp = jax.vjp(
        lambda a, c: _window_fused_ref(
            a, c.astype(a.dtype), heads, window, shift, scale, hd),
        qkv_map, bias)
    return vjp(do)


_window_fused.defvjp(_window_fused_fwd_rule, _window_fused_bwd_rule)


def fused_window_attention(qkv_map, bias, heads, window, shift, dh=None,
                           scale=None, plan=None):
    """Shifted-window attention straight off the dense NHWC projection map.

    qkv_map: (B, Hp, Wp, 3·sec) with sec = roundup(H·dh, 128) — q/k/v
    sections lane-padded for sliced-DMA legality (the caller pads the
    projection's weight columns so the GEMM emits this layout directly);
    already padded to window multiples but NOT rolled — the cyclic shift
    is folded into the kernel's DMA row indexing and an in-VMEM column
    rotation. bias: (1 | nr·nw, H, N, N) combined rel-pos (+shift-mask)
    bias or None. Returns (B, Hp, Wp, sec) in the original (un-rolled)
    coordinates; the real output lives in lanes [:H·dh].

    Equals roll(-shift) -> window_partition -> window_packed_attention ->
    window_reverse -> roll(+shift) exactly (oracle: _window_fused_ref)."""
    b, hp, wp, three_sec = qkv_map.shape
    wh, ww = window
    if dh is None:
        dh = three_sec // (3 * heads)   # only valid for unpadded maps
    if scale is None:
        scale = 1.0 / dh ** 0.5
    if plan is None:
        plan = window_fused_plan(
            b, hp, wp, wh, ww, heads, dh,
            1 if bias is None else bias.shape[0], qkv_map.dtype.itemsize)
    if plan is None:
        raise ValueError("shape not supported; check window_fused_plan")
    if three_sec != 3 * (-(-(heads * dh) // 128) * 128):
        raise ValueError(
            f"qkv_map lanes {three_sec} != 3*roundup({heads * dh},128); "
            "pad the projection's q/k/v sections to 128-lane multiples")
    return _window_fused(qkv_map, bias, heads, (wh, ww), tuple(shift),
                         float(scale), plan)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention(q, k, v, bias, kv_mask, scale, kv_valid, block_q):
    out, _ = _flash_fwd(q, k, v, bias, kv_mask, scale, kv_valid, block_q)
    return out


def _flash_attention_fwd(q, k, v, bias, kv_mask, scale, kv_valid, block_q):
    out, lse = _flash_fwd(q, k, v, bias, kv_mask, scale, kv_valid, block_q)
    return out, (q, k, v, bias, kv_mask, out, lse)


# Measured on v5e (ViT-B/16 shapes): the Pallas bwd runs ~14 ms/layer vs
# ~12 ms for the XLA-fused jnp bwd — XLA overlaps the five S×S matmuls well
# at these sizes, so jnp stays the default; the kernel remains available
# for shapes where HBM S×S materialization dominates.
USE_PALLAS_BWD = False

# Above this per-group score size the jnp backward's four (G, Sq, Sk) fp32
# HBM materializations dominate (DETR encoder at 512px: 64·1024·1024 —
# ~1 GB of residual traffic per layer-call) and the q-row-blocked Pallas
# backward (_drop_bwd_kernel at dropout 0) takes over; small-S shapes
# (ViT-B 197² — XLA overlaps the S×S matmuls well there) stay jnp.
_PALLAS_BWD_MIN_SCORES = 512 * 512 + 1


def _flash_attention_bwd(scale, kv_valid, block_q, res, do):
    q, k, v, bias, kv_mask, out, lse = res
    big = q.shape[1] * k.shape[1] >= _PALLAS_BWD_MIN_SCORES
    if (bias is None and kv_mask is None and (USE_PALLAS_BWD or big)
            and jax.default_backend() == "tpu"):
        if big:
            dq, dk, dv = _dropout_attn_call(
                q, k, v, jnp.zeros((1,), jnp.int32), scale, kv_valid, 0.0,
                backward=True, do=do, out=out, lse=lse)
        else:
            dq, dk, dv = _flash_bwd_pallas(q, k, v, out, lse, do, scale,
                                           kv_valid)
        return dq, dk, dv, None, None
    # jnp path (always used for the biased case — dbias needs the full ds).
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
            s = s + jnp.tile(bias.astype(jnp.float32),
                             (s.shape[0] // bias_g, 1, 1))
    s_k = k.shape[1]
    if kv_valid < s_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
    if kv_mask is not None:  # (n_groups, Sk) keep-mask, broadcast over heads
        reps = s.shape[0] // kv_mask.shape[0]
        mk = jnp.repeat(kv_mask.astype(bool), reps, axis=0)[:, None, :]
        s = jnp.where(mk, s, DEFAULT_MASK_VALUE)
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
            dbias = jnp.sum(ds.reshape(-1, bias_g, *ds.shape[1:]), axis=0)
        dbias = dbias.astype(bias.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias, None)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    kv_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    kv_valid: Optional[int] = None,
    block_q: int = 256,
) -> jax.Array:
    """Batched TPU attention over (B, H, S, D) inputs.

    ``bias`` is additive, (1|H-groups|B, H, Sq, Sk) — a leading dim smaller
    than B is broadcast over the batch (heads fastest-varying).
    ``kv_valid`` (static) masks trailing key padding.
    """
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if kv_valid is None:
        kv_valid = s_k

    g = b * h
    q = q.reshape(g, s_q, d)
    k = k.reshape(g, s_k, d)
    v = v.reshape(g, s_k, d)
    if bias is not None:
        bias = bias.reshape(bias.shape[0] * h, s_q, s_k)
    # kv_mask: (B, Sk) bool keep-mask (per-image key padding), broadcast
    # over heads; forces the streaming path.

    out = _flash_attention(q, k, v, bias, kv_mask, scale,
                           min(kv_valid, s_k), block_q)
    return out.reshape(b, h, s_q, d)
