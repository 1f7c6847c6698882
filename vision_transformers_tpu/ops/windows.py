"""Windowed (Swin-style) attention ops.

TPU-first re-design of the reference's functional ``shifted_window_attention``
(swin_transformer.py:45-130):

- The whole pipeline is NHWC; the reference's NCHW↔NHWC permutes vanish.
- The relative-position index and the 9-region shift mask depend only on
  static shapes, so both are computed in numpy at trace time and baked into
  the program as constants — the reference rebuilds the mask on-device every
  forward (swin_transformer.py:95-111).
- The windowed softmax(QKᵀ+bias)V runs through the shared attention
  dispatcher: batch and windows fold into the kernel grid's leading dim
  (SURVEY.md §7 'batch/window packing'), the combined (relative-position +
  shift) bias rides the kernel's additive-bias input.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.core.initializers import trunc_normal_init, zeros_init
from vision_transformers_tpu.ops.attention import dot_product_attention
from vision_transformers_tpu.ops.flash_attention import (
    fused_window_attention,
    window_batched_attention,
    window_batched_plan,
    window_fused_flat_plan,
    window_fused_plan,
    window_pack_plan,
    window_packed_attention,
)


# Test hook: None = auto (pack kernel on TPU only), True/False forces the
# choice. Lets the CPU suite drive the module→kernel glue (bias packing,
# ordering, cosine folding) through interpret mode — a regression there
# would otherwise only surface in on-TPU benchmarks (ADVICE r2).
FORCE_PACK_PATH: Optional[bool] = None

# Same contract for the fused NHWC kernel (roll/partition/reverse folded
# into the attention kernel's DMA indexing — flash_attention.py,
# _window_fused_kernel). None = auto (TPU only).
FORCE_FUSED_WINDOW: Optional[bool] = None

# Per-head batched window kernel (r5 'batched32'). None = auto by the
# window_variant_sweep_r05 receipts: it wins UNSHIFTED stages except the
# n_win ∈ [2, 8] regime (Swin-T s3, where fused wins 1.23 vs 1.52 ms);
# shifted blocks stay on the fused kernel (5.36 vs 6.80 ms at s1).
FORCE_BATCHED_WINDOW: Optional[bool] = None


def _batched_preferred(n_win: int, nwp: int, drop: float) -> bool:
    if FORCE_BATCHED_WINDOW is not None:
        return FORCE_BATCHED_WINDOW
    return (jax.default_backend() == "tpu" and drop == 0.0 and nwp == 1
            and not (2 <= n_win <= 8))

_pack_dropout_warned = False


def _warn_pack_dropout_fallback():
    global _pack_dropout_warned
    if not _pack_dropout_warned:
        _pack_dropout_warned = True
        import warnings

        warnings.warn(
            "attention_dropout > 0 disengages the multi-window pack kernel "
            "for windowed attention (falls back to the split-head path, "
            "~2x slower at Swin stage-1 shapes); set attention_dropout=0.0 "
            "to keep the kernel path",
            RuntimeWarning,
            stacklevel=3,
        )


def window_partition(x: jax.Array, wh: int, ww: int) -> jax.Array:
    """(B, H, W, C) → (B·nW, wh·ww, C). H, W must be window multiples."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // wh) * (w // ww), wh * ww, c)


def window_reverse(x: jax.Array, wh: int, ww: int, h: int, w: int) -> jax.Array:
    """Inverse of window_partition."""
    bnw, n, c = x.shape
    b = bnw // ((h // wh) * (w // ww))
    x = x.reshape(b, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static (N·N,) gather index into the (2wh-1)(2ww-1) bias table
    (semantics of swin_transformer.py:183-196)."""
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).reshape(-1)


def shift_attn_mask(
    pad_h: int, pad_w: int, window: Sequence[int], shift: Sequence[int]
) -> Optional[np.ndarray]:
    """Static (nW, N, N) additive mask (0 / -100) separating the 9 regions a
    cyclic shift stitches together (semantics of swin_transformer.py:95-111).
    None when no shift."""
    if sum(shift) == 0:
        return None
    wh, ww = window
    region = np.zeros((pad_h, pad_w), np.float32)
    h_slices = ((0, pad_h - wh), (pad_h - wh, pad_h - shift[0]), (pad_h - shift[0], pad_h))
    w_slices = ((0, pad_w - ww), (pad_w - ww, pad_w - shift[1]), (pad_w - shift[1], pad_w))
    count = 0
    for h0, h1 in h_slices:
        for w0, w1 in w_slices:
            region[h0:h1, w0:w1] = count
            count += 1
    region = region.reshape(pad_h // wh, wh, pad_w // ww, ww)
    region = region.transpose(0, 2, 1, 3).reshape(-1, wh * ww)  # (nW, N)
    diff = region[:, None, :] - region[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def edge_pad_key_mask(
    pad_h: int, pad_w: int, h: int, w: int, window: Sequence[int]
) -> Optional[np.ndarray]:
    """Static (nW, 1, N) additive key mask (0 / -1e9) marking positions that
    exist only because the map was padded to window multiples. Twins LSA
    masks them (real-Twins semantics); torchvision Swin does not."""
    if pad_h == h and pad_w == w:
        return None
    wh, ww = window
    valid = np.zeros((pad_h, pad_w), np.float32)
    valid[:h, :w] = 1.0
    valid = valid.reshape(pad_h // wh, wh, pad_w // ww, ww)
    valid = valid.transpose(0, 2, 1, 3).reshape(-1, wh * ww)  # (nW, N)
    return np.where(valid[:, None, :] > 0, 0.0, -1e9).astype(np.float32)


def shifted_window_attention(
    x: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: Optional[jax.Array],
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array],
    relative_position_bias: Optional[jax.Array],  # (num_heads, N, N) or None
    window_size: Sequence[int],
    num_heads: int,
    shift_size: Sequence[int],
    *,
    attention_dropout: float = 0.0,
    dropout: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
    mask_padding: bool = False,
    logit_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Functional core on (B, H, W, C) feature maps.

    ``logit_scale`` (num_heads, 1, 1) switches to SwinV2 cosine attention
    (torchvision V2 semantics): q and k are L2-normalized along the head
    dim and scores scaled by exp(min(logit_scale, log 100)) per head. The
    per-head scale folds into q, so the scaled dot rides the same Pallas
    kernel with scale=1.

    Dataflow (r3): the qkv and output projections run as DENSE full-map
    GEMMs on (B, H, W, ·) — (B·H·W, C) rows, sublane-aligned — instead of
    inside the window layout, whose (B·nW, 49, C) shape pads 49→56
    sublanes and forces a relayout around every matmul. Projections are
    pointwise over spatial positions, so they commute exactly with
    pad/roll/partition/crop; only the attention core itself touches the
    windowed layout."""
    b, h, w, c = x.shape
    wh, ww = window_size
    pad_b = (wh - h % wh) % wh
    pad_r = (ww - w % ww) % ww
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    pad_h, pad_w = h + pad_b, w + pad_r

    shift = list(shift_size)
    if wh >= pad_h:
        shift[0] = 0
    if ww >= pad_w:
        shift[1] = 0

    n_win = (pad_h // wh) * (pad_w // ww)
    n = wh * ww
    g = b * n_win
    dh = c // num_heads

    # Decide the attention path BEFORE projecting: the fused NHWC kernel
    # (flash_attention.py, _window_fused_kernel) folds roll + partition +
    # attention + reverse + unroll into one pass — the layout ops cost
    # Swin-T/224 ~4 ms/fwd of pure HBM traffic
    # (benchmarks/swin_layout_ablation.py) — but wants the q/k/v weight
    # columns padded to 128-lane sections so its sliced DMA is legal.
    drop = 0.0 if deterministic else attention_dropout
    has_mask = sum(shift) > 0 or (
        mask_padding and (pad_h != h or pad_w != w))
    nwp = n_win if has_mask else 1
    # Routing receipts (chip, r4): the fused kernel wins for dot-product
    # window attention — Swin-T 1.42x, Twins 1.33x at the op level
    # (benchmarks/window_fused_flat_r04.json) and Swin-T 32.9->29.6 ms
    # full-model (hier_bench_r04 vs r04b) — but LOSES for the cosine
    # (SwinV2) path: 0.649x at the op level and every SwinV2-T stage
    # slower full-model (48.5->66.5 ms, stages 2-3 doubled). The cosine
    # path must materialize l2-normalized q/k on the dense map before the
    # kernel, so the fused kernel's one-pass advantage (projection output
    # read in place) is already spent; route cosine to the pack path.
    use_fused = (
        FORCE_FUSED_WINDOW if FORCE_FUSED_WINDOW is not None
        else (jax.default_backend() == "tpu" and logit_scale is None
              # unshifted stages outside the n_win ∈ [2, 8] regime route
              # to the batched kernel on the pack path instead (r5
              # receipts — see _batched_preferred)
              and not _batched_preferred(n_win, nwp, drop))
    )
    fused_plan = None
    if use_fused and drop == 0.0:
        fused_plan = window_fused_plan(
            b, pad_h, pad_w, wh, ww, num_heads, dh, nwp, x.dtype.itemsize)
        if fused_plan is None:
            # widths the slab DMA can't slice (wp % 8 != 0: Swin-T stages
            # 2-4) ride the flat whole-image variant instead
            fused_plan = window_fused_flat_plan(
                b, pad_h, pad_w, wh, ww, num_heads, dh, nwp,
                x.dtype.itemsize)

    sec = c if fused_plan is None else -(-c // 128) * 128
    if sec != c:  # zero weight columns: the GEMM emits the padded layout
        qkv_kernel = jnp.pad(
            qkv_kernel.reshape(c, 3, c),
            ((0, 0), (0, 0), (0, sec - c))).reshape(c, 3 * sec)
        if qkv_bias is not None:
            qkv_bias = jnp.pad(
                qkv_bias.reshape(3, c), ((0, 0), (0, sec - c))).reshape(-1)

    if fused_plan is None and sum(shift) > 0:
        # fallback keeps the reference order: roll the (C-channel) map
        # BEFORE the 3C projection — rolling qkv instead would triple the
        # rolled bytes
        x = jnp.roll(x, shift=(-shift[0], -shift[1]), axis=(1, 2))

    # Dense qkv projection on the padded map (exact: pad rows are zero, so
    # they project to the bias, same as projecting after the partition;
    # the cyclic roll is a permutation of positions, so it commutes with
    # the per-position projection — the fused kernel folds it into its
    # DMA indexing).
    qkv = x @ qkv_kernel
    if qkv_bias is not None:
        qkv = qkv + qkv_bias

    scale = 1.0 / dh ** 0.5
    if logit_scale is not None:
        # Cosine attention (SwinV2): normalize q/k and bake the clamped
        # per-head temperature into q on the dense (B, H, W, 3C) map —
        # a contiguous (..., 3, nH, dh) view, so the elementwise work
        # fuses into the projection epilogue and the multi-window pack
        # kernel below stays reachable (it consumes the packed layout).
        # x·rsqrt(Σx²+ε) — NOT x/max(‖x‖,ε), whose backward is NaN at
        # x=0 (and window padding makes exact-zero q/k rows whenever the
        # feature map is smaller than the window, e.g. the last stage of
        # a 32px Swin: d‖x‖/dx = x/‖x‖ is 0/0 there).
        def _l2n(t):
            t32 = t.astype(jnp.float32)
            sumsq = jnp.sum(t32 * t32, axis=-1, keepdims=True)
            return (t32 * jax.lax.rsqrt(sumsq + 1e-12)).astype(t.dtype)

        temp = jnp.exp(jnp.minimum(logit_scale, jnp.log(100.0)))
        if sec == c:
            # pack path: normalize on the contiguous 6-D per-head view —
            # the stack keeps one relayout; the sliced/concat section form
            # below cost SwinV2-T stages 2-3 ~+40-70% on the pack path
            # (ablation 48.5 -> 53.3 ms, benchmarks/swinv2_fused_ablation)
            q5 = qkv.reshape(b, pad_h, pad_w, 3, num_heads, dh)
            qn = _l2n(q5[..., 0, :, :]) * temp.reshape(
                num_heads, 1).astype(qkv.dtype)
            kn = _l2n(q5[..., 1, :, :])
            qkv = jnp.stack([qn, kn, q5[..., 2, :, :]], axis=3).reshape(
                b, pad_h, pad_w, 3 * c)
        else:
            # fused path: sections are lane-padded to 128; normalize the
            # real lanes per head and re-pad
            q6 = qkv.reshape(b, pad_h, pad_w, 3, sec)

            def _heads(t):  # real lanes of a section, per-head view
                return t[..., :c].reshape(b, pad_h, pad_w, num_heads, dh)

            def _flat(t):  # back to a (lane-padded) section
                t = t.reshape(b, pad_h, pad_w, c)
                return jnp.pad(t, ((0, 0),) * 3 + ((0, sec - c),))

            qn = _l2n(_heads(q6[..., 0, :])) * temp.reshape(
                num_heads, 1).astype(qkv.dtype)
            kn = _l2n(_heads(q6[..., 1, :]))
            qkv = jnp.concatenate(
                [_flat(qn), _flat(kn), q6[..., 2, :]], axis=-1)
        scale = 1.0

    # Combined additive bias: relative-position bias (shared by all windows)
    # + per-window shift mask (shared by batch and heads). Shape (nW', nH,
    # N, N) with nW' ∈ {1, n_win}; the kernel broadcasts over batch via its
    # leading-dim modulo.
    mask = shift_attn_mask(pad_h, pad_w, (wh, ww), shift)
    pad_mask = (
        edge_pad_key_mask(pad_h, pad_w, h, w, (wh, ww)) if mask_padding else None
    )
    bias = None
    if relative_position_bias is not None:
        bias = relative_position_bias[None]  # (1, nH, N, N)
    if mask is not None:
        m = jnp.asarray(mask)[:, None, :, :]  # (nW, 1, N, N)
        bias = m if bias is None else bias + m
    if pad_mask is not None:
        m = jnp.asarray(pad_mask)[:, None, :, :]
        bias = m if bias is None else bias + m
    if bias is not None and bias.shape != (bias.shape[0], num_heads, n, n):
        # materialize full (nW', nH, N, N): the Pallas wrapper flattens
        # (leading, head) and cannot carry size-1 broadcast dims
        bias = jnp.broadcast_to(bias, (bias.shape[0], num_heads, n, n))

    if fused_plan is not None:
        out = fused_window_attention(
            qkv, bias, num_heads, (wh, ww), tuple(shift), dh=dh,
            scale=scale, plan=fused_plan)
        # (B, Hp, Wp, sec) in un-rolled coordinates; real lanes [:c]
        out = out[:, :h, :w, :c]
        out = out @ proj_kernel
        if proj_bias is not None:
            out = out + proj_bias
        # (projection dropout applied by the caller module)
        return out

    qkv_packed = window_partition(qkv, wh, ww)
    # (B·nW, N, 3C), [q | k | v] lanes — kernel layout (x was rolled
    # before the projection on this path)

    # Batched kernel first (r5): at unshifted stage-1/2/4 shapes it beats
    # both the pack and fused kernels (window_variant_sweep_r05) — the
    # block-diagonal packing relayout isn't free, and the MXU is idle at
    # N=49 either way. Cosine (SwinV2) rides it too: normalization and
    # temperature are already folded into the packed q, scale=1. Only in
    # auto mode — FORCE_PACK_PATH=True pins the pack kernel for tests.
    batched_blk = None
    if (FORCE_PACK_PATH is None and drop == 0.0
            and _batched_preferred(n_win, nwp, drop)):
        batched_blk = window_batched_plan(
            g, n, num_heads, dh, nwp, qkv_packed.dtype.itemsize)
    if batched_blk is not None:
        out = window_batched_attention(
            qkv_packed, bias, num_heads, scale=scale, blk=batched_blk)
        out = window_reverse(out, wh, ww, pad_h, pad_w)
        if sum(shift) > 0:
            out = jnp.roll(out, shift=(shift[0], shift[1]), axis=(1, 2))
        out = out[:, :h, :w, :]
        out = out @ proj_kernel
        if proj_bias is not None:
            out = out + proj_bias
        return out

    pack_plan = None
    use_pack = (
        FORCE_PACK_PATH if FORCE_PACK_PATH is not None
        else jax.default_backend() == "tpu"
    )
    if use_pack:
        pack_plan = window_pack_plan(
            g, n, num_heads, dh, nwp, qkv_packed.dtype.itemsize)
    if pack_plan is not None and drop > 0.0:
        # the pack kernel has no in-kernel dropout; losing it changes the
        # perf class, so say so once instead of silently falling back
        _warn_pack_dropout_fallback()
        pack_plan = None
    if pack_plan is not None:
        # multi-window block-diagonal MXU packing: P = 128/dh windows per
        # matmul at full contraction depth, straight off the packed
        # projection output (flash_attention.py, _window_pack_kernel) —
        # the split-head path runs at ~4% of roofline at these shapes.
        # The cosine (SwinV2) case rides the same kernel: normalization
        # and temperature are already folded into the packed q, scale=1.
        out = window_packed_attention(
            qkv_packed, bias, num_heads, scale=scale, plan=pack_plan)
    else:
        qkv5 = qkv_packed.reshape(g, n, 3, num_heads, dh).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv5[0], qkv5[1], qkv5[2]  # (B·nW, nH, N, dh)
        out = dot_product_attention(
            q, k, v, bias=bias, scale=scale,
            dropout_rate=drop, dropout_rng=dropout_rng,
        )
        out = out.transpose(0, 2, 1, 3).reshape(g, n, c)

    out = window_reverse(out, wh, ww, pad_h, pad_w)
    if sum(shift) > 0:
        out = jnp.roll(out, shift=(shift[0], shift[1]), axis=(1, 2))
    out = out[:, :h, :w, :]
    # Dense output projection on the cropped map (exact: per-position,
    # and the cropped rows never reach downstream ops anyway).
    out = out @ proj_kernel
    if proj_bias is not None:
        out = out + proj_bias
    # (projection dropout applied by the caller module)
    return out


class ShiftedWindowAttention(nn.Module):
    """Module wrapper holding qkv/proj kernels and the relative-position
    bias table ((2wh-1)(2ww-1), nH), trunc-normal 0.02
    (swin_transformer.py:172-181)."""

    dim: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    attention_dropout: float = 0.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        idx = relative_position_index(wh, ww)
        n = wh * ww
        rel_bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)

        qkv_kernel = self.param(
            "qkv_kernel", trunc_normal_init(0.02), (self.dim, 3 * self.dim)
        )
        qkv_b = (
            self.param("qkv_bias", zeros_init, (3 * self.dim,))
            if self.qkv_bias else None
        )
        proj_kernel = self.param(
            "proj_kernel", trunc_normal_init(0.02), (self.dim, self.dim)
        )
        proj_b = (
            self.param("proj_bias", zeros_init, (self.dim,))
            if self.proj_bias else None
        )

        rng = None
        if not deterministic and self.attention_dropout > 0.0:
            rng = self.make_rng("dropout")
        out = shifted_window_attention(
            x.astype(self.dtype),
            qkv_kernel.astype(self.dtype),
            None if qkv_b is None else qkv_b.astype(self.dtype),
            proj_kernel.astype(self.dtype),
            None if proj_b is None else proj_b.astype(self.dtype),
            rel_bias,
            self.window_size, self.num_heads, self.shift_size,
            attention_dropout=self.attention_dropout,
            deterministic=deterministic, dropout_rng=rng,
        )
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


def relative_coords_table(wh: int, ww: int) -> np.ndarray:
    """Static (1, 2wh-1, 2ww-1, 2) log-spaced normalized coordinate table
    for the SwinV2 continuous position bias (torchvision
    ShiftedWindowAttentionV2 semantics): coords/(win-1) scaled to ±8, then
    sign(x)·log2(|x|+1)/3."""
    ch = np.arange(-(wh - 1), wh, dtype=np.float32)
    cw = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(ch, cw, indexing="ij"))  # (2, 2wh-1, 2ww-1)
    table = table.transpose(1, 2, 0)[None]
    if wh > 1:
        table[:, :, :, 0] /= wh - 1
    if ww > 1:
        table[:, :, :, 1] /= ww - 1
    table *= 8
    return np.sign(table) * np.log2(np.abs(table) + 1.0) / 3.0


class ShiftedWindowAttentionV2(nn.Module):
    """SwinV2 windowed attention: cosine similarity with a learned
    per-head temperature (clamped at 100) and a continuous relative
    position bias from a 2→512→nH MLP over log-spaced coordinates,
    squashed to (0, 16) by 16·sigmoid. The reference registers
    ``swinv2_*`` preset names but never implements the model
    (utils/args.py:29-41 — SURVEY §2.9.9); this completes the intent
    with torchvision-V2 math. Per V2, the k projection carries no bias."""

    dim: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    attention_dropout: float = 0.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        wh, ww = self.window_size
        n = wh * ww

        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.log(10.0)),
            (self.num_heads, 1, 1),
        )
        # CPB path stays fp32 whatever the model dtype: the log-spaced
        # coords and the tiny 2→512→nH MLP are precision-sensitive and
        # cost nothing at (2wh-1)(2ww-1) rows.
        coords = jnp.asarray(relative_coords_table(wh, ww), jnp.float32)
        hidden = nn.Dense(
            512, kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=jnp.float32, name="cpb_fc1",
        )(coords)
        bias_table = nn.Dense(
            self.num_heads, use_bias=False,
            kernel_init=trunc_normal_init(0.02),
            dtype=jnp.float32, name="cpb_fc2",
        )(nn.relu(hidden)).reshape(-1, self.num_heads)
        idx = relative_position_index(wh, ww)
        rel_bias = bias_table[idx].reshape(n, n, self.num_heads)
        rel_bias = 16.0 * jax.nn.sigmoid(rel_bias.transpose(2, 0, 1))

        qkv_kernel = self.param(
            "qkv_kernel", trunc_normal_init(0.02), (self.dim, 3 * self.dim)
        )
        if self.qkv_bias:
            # q and v biases are learned; the k bias is identically zero
            q_b = self.param("q_bias", zeros_init, (self.dim,))
            v_b = self.param("v_bias", zeros_init, (self.dim,))
            qkv_b = jnp.concatenate([q_b, jnp.zeros_like(q_b), v_b])
        else:
            qkv_b = None
        proj_kernel = self.param(
            "proj_kernel", trunc_normal_init(0.02), (self.dim, self.dim)
        )
        proj_b = (
            self.param("proj_bias", zeros_init, (self.dim,))
            if self.proj_bias else None
        )

        rng = None
        if not deterministic and self.attention_dropout > 0.0:
            rng = self.make_rng("dropout")
        out = shifted_window_attention(
            x.astype(self.dtype),
            qkv_kernel.astype(self.dtype),
            None if qkv_b is None else qkv_b.astype(self.dtype),
            proj_kernel.astype(self.dtype),
            None if proj_b is None else proj_b.astype(self.dtype),
            rel_bias,
            self.window_size, self.num_heads, self.shift_size,
            attention_dropout=self.attention_dropout,
            deterministic=deterministic, dropout_rng=rng,
            logit_scale=logit_scale,
        )
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class PatchMerging(nn.Module):
    """2×2 space-to-depth → LN(4C) → Linear(4C→2C)
    (swin_transformer.py:136-151); input (B, H, W, C), NHWC."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(
            2 * c,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="reduction",
        )(x)


class PatchMergingV2(nn.Module):
    """SwinV2 merge order: 2×2 space-to-depth → Linear(4C→2C) → LN(2C)
    (norm moves after the reduction, torchvision PatchMergingV2)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.Dense(
            2 * c,
            kernel_init=trunc_normal_init(0.02), bias_init=zeros_init,
            dtype=self.dtype, name="reduction",
        )(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
