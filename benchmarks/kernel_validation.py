"""On-hardware kernel validation (VERDICT r1 item 6).

Interpret-mode CI cannot catch Mosaic tiling/layout bugs, so this script
asserts kernel-vs-oracle agreement ON THE REAL TPU across the shape zoo and
records a JSON artifact (benchmarks/kernel_validation_results.json,
committed) that PERFORMANCE.md references.

Covers:
- packed-QKV kernel fwd/bwd vs the jnp oracle (fp32 + bf16), ViT shapes
- in-kernel dropout: mask-dump cross-check (jnp with the SAME mask must
  reproduce kernel fwd AND grads), determinism, drop-rate statistics
- legacy flash_attention: full, Swin-bias, SRA cross, streaming S=4200
  with runtime key-padding masks
- bf16 golden fingerprints (sum/absmax) for drift detection

Run: python benchmarks/kernel_validation.py   (foreground, on TPU)
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_transformers_tpu.ops.attention import mha_reference
from vision_transformers_tpu.ops import flash_attention as fa

RESULTS = []


def record(name, ok, detail):
    RESULTS.append({"name": name, "ok": bool(ok), "detail": detail})
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}")


def packed_oracle(qkv, heads, keep=None, rate=0.0):
    b, s, thd = qkv.shape
    d = thd // 3 // heads
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    q = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                    precision=jax.lax.Precision.HIGHEST) / (d ** 0.5)
    p = jax.nn.softmax(sc, axis=-1)
    if keep is not None:
        p = jnp.where(keep, p, 0.0) / (1.0 - rate)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                   precision=jax.lax.Precision.HIGHEST)
    return o.transpose(0, 2, 1, 3).reshape(b, s, heads * d)


def dump_packed_mask(b, s, heads, b_blk, seed, rate):
    """Replays the packed kernel's PRNG stream (seed, program, head order)
    and dumps the keep-mask as (B, H, S, S) int8."""

    def kernel(seed_ref, m_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        for h in range(heads):
            keep = fa._dropout_keep((b_blk, s, s), rate)
            m_ref[:, h, :, :] = keep.astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(b // b_blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((b_blk, heads, s, s), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, heads, s, s), jnp.int8),
    )(seed)


def validate_packed_fwd_bwd():
    for (b, s, heads, d, dtype, tol) in [
        (8, 197, 12, 64, jnp.float32, 8e-3),
        (8, 197, 12, 64, jnp.bfloat16, 3e-2),
        (4, 65, 4, 64, jnp.float32, 8e-3),
        (4, 65, 4, 64, jnp.bfloat16, 3e-2),
        (2, 577, 8, 64, jnp.bfloat16, 3e-2),   # 24x24 grid + CLS
    ]:
        assert fa.packed_flash_supported(b, s, 3 * heads * d,
                                         jnp.dtype(dtype).itemsize), (b, s)
        qkv = jax.random.normal(
            jax.random.PRNGKey(0), (b, s, 3 * heads * d)).astype(dtype)
        out = fa.packed_flash_attention(qkv, heads).astype(jnp.float32)
        ref = packed_oracle(qkv, heads)
        err = float(jnp.max(jnp.abs(out - ref)))
        record(f"packed_fwd b{b} s{s} h{heads} {jnp.dtype(dtype).name}",
               err < tol, f"max abs err {err:.2e} (tol {tol})")

        def loss_k(x):
            return jnp.sum(jnp.sin(
                fa.packed_flash_attention(x, heads).astype(jnp.float32)))

        def loss_r(x):
            return jnp.sum(jnp.sin(packed_oracle(x, heads)))

        gk = jax.grad(loss_k)(qkv).astype(jnp.float32)
        gr = jax.grad(loss_r)(qkv.astype(jnp.float32))
        gerr = float(jnp.max(jnp.abs(gk - gr)))
        gtol = tol * 4
        record(f"packed_bwd b{b} s{s} h{heads} {jnp.dtype(dtype).name}",
               gerr < gtol, f"max abs err {gerr:.2e} (tol {gtol})")


def validate_packed_dropout():
    b, s, heads, d, rate = 4, 65, 4, 32, 0.1
    qkv = jax.random.normal(jax.random.PRNGKey(3), (b, s, 3 * heads * d),
                            jnp.float32)
    seed = jnp.array([4242], jnp.int32)
    hd = heads * d

    # the kernel's blocking when dropout is active (fwd == bwd by design)
    b_blk = min(fa._pick_batch_block(b, s, hd, 4),
                fa._packed_bwd_block(b, s, hd, 4))
    keep = dump_packed_mask(b, s, heads, b_blk, seed, rate).astype(bool)

    out_k = fa.packed_flash_attention(qkv, heads, dropout_rate=rate,
                                      seed=seed)
    out_r = packed_oracle(qkv, heads, keep=keep, rate=rate)
    err = float(jnp.max(jnp.abs(out_k - out_r)))
    # tolerance class = Mosaic fp32 dot precision (same as packed_fwd) plus
    # the extra where/mul; 8.0e-3 observed
    record("packed_dropout_fwd_same_mask", err < 1.5e-2,
           f"max abs err {err:.2e}")

    gk = jax.grad(lambda x: jnp.sum(jnp.sin(
        fa.packed_flash_attention(x, heads, dropout_rate=rate,
                                  seed=seed))))(qkv)
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(
        packed_oracle(x, heads, keep=keep, rate=rate))))(qkv)
    gerr = float(jnp.max(jnp.abs(gk - gr)))
    record("packed_dropout_bwd_same_mask", gerr < 3e-2,
           f"max abs err {gerr:.2e}")

    # determinism + drop-rate statistics
    o1 = fa.packed_flash_attention(qkv, heads, dropout_rate=rate, seed=seed)
    o2 = fa.packed_flash_attention(qkv, heads, dropout_rate=rate, seed=seed)
    record("packed_dropout_deterministic", bool(jnp.all(o1 == o2)), "same seed")
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    record("packed_dropout_keep_rate", abs(frac - (1 - rate)) < 5e-3,
           f"keep fraction {frac:.4f} vs {1 - rate}")


def dump_split_mask(g, s_q, s_k, d, itemsize, seed, rate):
    """Replays the split-head dropout kernel's PRNG stream (seed, i·nq + j)
    on its exact (g_blk, q_blk) partitioning (fa._dropout_plan)."""
    g_blk, q_blk = fa._dropout_plan(g, s_q, s_k, d, itemsize)
    nq = -(-s_q // q_blk)

    def kernel(seed_ref, m_ref):
        pltpu.prng_seed(seed_ref[0],
                        pl.program_id(0) * nq + pl.program_id(1))
        keep = fa._dropout_keep((g_blk, q_blk, s_k), rate)
        m_ref[...] = keep.astype(jnp.int8)

    mask = pl.pallas_call(
        kernel,
        grid=(g // g_blk, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((g_blk, q_blk, s_k), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, nq * q_blk, s_k), jnp.int8),
    )(seed)
    return mask[:, :s_q].astype(bool)


def validate_split_dropout():
    """flash_dropout_attention (the DETR train-path kernel) on-chip:
    same-mask fwd/bwd cross-check, determinism, keep-rate — including the
    multi-q-block S=1024 DETR-encoder shape whose backward accumulates
    dk/dv across the sequential grid dim."""
    seed = jnp.array([4242], jnp.int32)
    for (b, h, sq, sk, d, rate, tag) in [
        (2, 8, 1024, 1024, 32, 0.1, "detr_enc_1024"),
        (2, 8, 100, 1024, 32, 0.1, "detr_dec_cross"),
        (4, 4, 300, 72, 16, 0.25, "padded_rows"),
    ]:
        q = jax.random.normal(jax.random.PRNGKey(40), (b, h, sq, d))
        k = jax.random.normal(jax.random.PRNGKey(41), (b, h, sk, d))
        v = jax.random.normal(jax.random.PRNGKey(42), (b, h, sk, d))
        keep = dump_split_mask(b * h, sq, sk, d, 4, seed, rate)

        def oracle(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           precision=jax.lax.Precision.HIGHEST) / (d ** 0.5)
            p = jax.nn.softmax(s, axis=-1)
            pd = jnp.where(keep.reshape(b, h, sq, sk), p, 0.0) / (1 - rate)
            return jnp.einsum("bhqk,bhkd->bhqd", pd, v,
                              precision=jax.lax.Precision.HIGHEST)

        out_k = fa.flash_dropout_attention(q, k, v, dropout_rate=rate,
                                           seed=seed)
        err = float(jnp.max(jnp.abs(out_k - oracle(q, k, v))))
        record(f"split_dropout_fwd_{tag}", err < 1.5e-2,
               f"max abs err {err:.2e}")

        gk = jax.grad(lambda *a: jnp.sum(jnp.sin(fa.flash_dropout_attention(
            *a, dropout_rate=rate, seed=seed))), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: jnp.sum(jnp.sin(oracle(*a))),
                      argnums=(0, 1, 2))(q, k, v)
        gerr = max(float(jnp.max(jnp.abs(a - b_))) for a, b_ in zip(gk, gr))
        # dropped probs carry a 1/(1-rate) amplification, so the Mosaic
        # fp32 dot error class scales with it (rate 0.25 measured 3.4e-2
        # against the packed-bwd 3e-2 class; the mask REPLAY itself is
        # proven bit-exactly by the same-mask CPU tests)
        gtol = 3e-2 / (1.0 - rate)
        record(f"split_dropout_bwd_{tag}", gerr < gtol,
               f"max abs err {gerr:.2e} (tol {gtol:.1e})")

        frac = float(jnp.mean(keep.astype(jnp.float32)))
        record(f"split_dropout_keep_rate_{tag}",
               abs(frac - (1 - rate)) < 5e-3,
               f"keep fraction {frac:.4f} vs {1 - rate}")

    o1 = fa.flash_dropout_attention(q, k, v, dropout_rate=rate, seed=seed)
    o2 = fa.flash_dropout_attention(q, k, v, dropout_rate=rate, seed=seed)
    record("split_dropout_deterministic", bool(jnp.all(o1 == o2)),
           "same seed")


def validate_legacy_kernels():
    # full self attention
    q = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 197, 64))
    k = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 197, 64))
    v = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 197, 64))
    err = float(jnp.max(jnp.abs(
        fa.flash_attention(q, k, v) - mha_reference(q, k, v))))
    record("flash_full_197", err < 8e-3, f"max abs err {err:.2e}")

    # Swin-like windowed bias (shared across batch)
    qw = jax.random.normal(jax.random.PRNGKey(7), (8, 3, 49, 32))
    kw = jax.random.normal(jax.random.PRNGKey(8), (8, 3, 49, 32))
    vw = jax.random.normal(jax.random.PRNGKey(9), (8, 3, 49, 32))
    bias = jax.random.normal(jax.random.PRNGKey(10), (1, 3, 49, 49))
    err = float(jnp.max(jnp.abs(
        fa.flash_attention(qw, kw, vw, bias)
        - mha_reference(qw, kw, vw, bias))))
    record("flash_swin_bias", err < 8e-3, f"max abs err {err:.2e}")

    # SRA cross attention Sk << Sq
    qs = jax.random.normal(jax.random.PRNGKey(11), (2, 2, 784, 64))
    ks = jax.random.normal(jax.random.PRNGKey(12), (2, 2, 49, 64))
    vs = jax.random.normal(jax.random.PRNGKey(13), (2, 2, 49, 64))
    err = float(jnp.max(jnp.abs(
        fa.flash_attention(qs, ks, vs) - mha_reference(qs, ks, vs))))
    record("flash_sra_cross", err < 8e-3, f"max abs err {err:.2e}")

    # streaming S=4200 with runtime key-padding mask (DETR encoder scale)
    b, h, s, d = 1, 4, 4200, 64
    ql = jax.random.normal(jax.random.PRNGKey(14), (b, h, s, d), jnp.bfloat16)
    kl = jax.random.normal(jax.random.PRNGKey(15), (b, h, s, d), jnp.bfloat16)
    vl = jax.random.normal(jax.random.PRNGKey(16), (b, h, s, d), jnp.bfloat16)
    kv_mask = (jnp.arange(s) < 3900)[None, :]
    out = fa.flash_attention(ql, kl, vl, kv_mask=kv_mask).astype(jnp.float32)
    ref = mha_reference(ql, kl, vl,
                        mask=kv_mask[:, None, None, :]).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    record("flash_streaming_4200_masked", err < 3e-2, f"max abs err {err:.2e}")


def validate_window_pack():
    """Multi-window block-diagonal pack kernel vs its jnp twin — fp32 and
    bf16, shared and per-window bias, Swin-T (49, 32) and CIFAR (16, 32)
    shapes, fwd + grads."""
    # fp32 at (n_win=64, N=49) correctly plans None (VMEM: the minimum
    # g_blk is the 16 bias groups) and falls back to split-head — the fp32
    # per-window case is validated at the CIFAR shape instead.
    for (g, n, heads, dh, n_win, dtype) in [
        (512, 49, 3, 32, 16, jnp.float32),
        (512, 49, 3, 32, 64, jnp.bfloat16),
        (256, 16, 2, 32, 16, jnp.float32),
        (128, 49, 12, 32, 1, jnp.bfloat16),
    ]:
        key = jax.random.PRNGKey(g + n)
        qkv = (jax.random.normal(key, (g, n, 3 * heads * dh)) * 0.5
               ).astype(dtype)
        bias = None
        if n_win > 1:
            bias = jax.random.normal(
                jax.random.PRNGKey(n_win), (n_win, heads, n, n)) * 0.1
        plan = fa.window_pack_plan(g, n, heads, dh, n_win,
                                   jnp.dtype(dtype).itemsize)
        assert plan is not None, (g, n, heads, dh, n_win)
        scale = 1.0 / dh ** 0.5
        out = fa.window_packed_attention(qkv, bias, heads,
                                         plan=plan).astype(jnp.float32)
        ref = fa._window_pack_ref(qkv, bias, heads, scale).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(out - ref)))
        tol = 8e-3 if dtype == jnp.float32 else 3e-2
        record(f"window_pack g{g} n{n} h{heads} nw{n_win} "
               f"{jnp.dtype(dtype).name}", err < tol, f"max abs err {err:.2e}")

    # grads through the custom vjp on-chip
    g, n, heads, dh, n_win = 64, 16, 2, 32, 16
    qkv = jax.random.normal(jax.random.PRNGKey(70), (g, n, 3 * heads * dh))
    bias = jax.random.normal(jax.random.PRNGKey(71),
                             (n_win, heads, n, n)) * 0.1
    gk = jax.grad(lambda x: jnp.sum(jnp.sin(
        fa.window_packed_attention(x, bias, heads))))(qkv)
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(
        fa._window_pack_ref(x, bias, heads, 1 / dh ** 0.5))))(qkv)
    err = float(jnp.max(jnp.abs(gk - gr)))
    record("window_pack_bwd", err < 1e-2, f"max abs err {err:.2e}")

    # r5 Pallas backward kernel: dqkv AND dbias at production Swin-T
    # shapes (bf16, shared + per-window + lcm-periodic bias tiles),
    # asserting the kernel path engages (not the jnp-ref fallback)
    for (g, n, heads, dh, nwp, dtype) in [
        (512, 49, 3, 32, 1, jnp.bfloat16),
        (512, 49, 3, 32, 64, jnp.bfloat16),
        (196, 49, 3, 32, 49, jnp.bfloat16),   # lcm(49,4) periodic tiles
        (256, 16, 2, 32, 16, jnp.float32),
    ]:
        tag = f"g{g} n{n} h{heads} nw{nwp} {jnp.dtype(dtype).name}"
        bg = fa._window_pack_bwd_gblk(g, n, heads, dh, nwp,
                                      jnp.dtype(dtype).itemsize)
        record(f"window_pack_bwd_plan {tag}", bg is not None,
               f"bwd g_blk={bg}")
        if bg is None:
            continue
        plan = fa.window_pack_plan(g, n, heads, dh, nwp,
                                   jnp.dtype(dtype).itemsize)
        qkv = (jax.random.normal(jax.random.PRNGKey(g + nwp),
                                 (g, n, 3 * heads * dh)) * 0.5).astype(dtype)
        bias = jax.random.normal(jax.random.PRNGKey(nwp),
                                 (nwp, heads, n, n)) * 0.1
        do = (jax.random.normal(jax.random.PRNGKey(g),
                                (g, n, heads * dh)) * 0.5).astype(dtype)
        scale = 1.0 / dh ** 0.5
        _, vjp = jax.vjp(
            lambda a, b: fa._window_pack(a, b, heads, scale, *plan),
            qkv, bias)
        dq, db = vjp(do)
        _, vjpr = jax.vjp(
            lambda a, b: fa._window_pack_ref(
                a, b.astype(a.dtype), heads, scale), qkv, bias)
        dqr, dbr = vjpr(do)
        edq = float(jnp.max(jnp.abs(dq.astype(jnp.float32)
                                    - dqr.astype(jnp.float32))))
        edb = float(jnp.max(jnp.abs(db - dbr)))
        tol = 1e-2 if dtype == jnp.float32 else 6e-2
        record(f"window_pack_bwd_kernel {tag}", edq < tol and edb < tol * 10,
               f"dqkv err {edq:.2e} dbias err {edb:.2e}")

    # fused backward now rides the pack bwd kernel behind the layout vjp.
    # Mirror the PRODUCTION layout exactly (windows.py): c=96 (Swin-T s1)
    # lane-pads each q/k/v section to sec=128 — the fused forward's slab
    # DMA requires 128-aligned sections (an unpadded 3·hd map is a
    # contract violation that Mosaic rejects).
    b, side, heads, dh, wh = 4, 28, 3, 32, 7
    hd = heads * dh          # 96 real lanes
    sec = -(-hd // 128) * 128  # 128
    nwp = 16
    fplan = fa.window_fused_plan(b, side, side, wh, wh, heads, dh, nwp, 2)
    if fplan is None:
        fplan = fa.window_fused_flat_plan(b, side, side, wh, wh, heads,
                                          dh, nwp, 2)
    if fplan is not None:
        qm_real = (jax.random.normal(jax.random.PRNGKey(3),
                                     (b, side, side, 3 * hd)) * 0.5
                   ).astype(jnp.bfloat16)
        qm = jnp.concatenate([
            jnp.pad(t, ((0, 0),) * 3 + ((0, sec - hd),))
            for t in jnp.split(qm_real, 3, axis=-1)], axis=-1)
        bias = jax.random.normal(jax.random.PRNGKey(4),
                                 (nwp, heads, wh * wh, wh * wh)) * 0.1
        dom = (jax.random.normal(jax.random.PRNGKey(5),
                                 (b, side, side, sec)) * 0.5
               ).astype(jnp.bfloat16)
        scale = 1.0 / dh ** 0.5
        _, vjp = jax.vjp(
            lambda a, c: fa._window_fused(a, c, heads, (wh, wh), (3, 3),
                                          scale, fplan), qm, bias)
        dq, db = vjp(dom)
        _, vjpr = jax.vjp(
            lambda a, c: fa._window_fused_ref(
                a, c.astype(a.dtype), heads, (wh, wh), (3, 3), scale, hd),
            qm, bias)
        dqr, dbr = vjpr(dom)
        edq = float(jnp.max(jnp.abs(dq.astype(jnp.float32)
                                    - dqr.astype(jnp.float32))))
        edb = float(jnp.max(jnp.abs(db - dbr)))
        record("window_fused_bwd_kernel", edq < 6e-2 and edb < 6e-1,
               f"dqkv err {edq:.2e} dbias err {edb:.2e}")


def bf16_fingerprints():
    qkv = jax.random.normal(jax.random.PRNGKey(20), (4, 197, 3 * 768)
                            ).astype(jnp.bfloat16)
    out = fa.packed_flash_attention(qkv, 12).astype(jnp.float32)
    fp = {"sum": float(jnp.sum(out)), "absmax": float(jnp.max(jnp.abs(out)))}
    record("packed_bf16_fingerprint", True, json.dumps(fp))



def validate_fused_block():
    """Fused LN+QKV+attn+out+residual sub-block vs its jnp twin, on-chip."""
    for s, hd, heads, dtype in ((197, 768, 12, jnp.bfloat16),
                                (65, 256, 4, jnp.float32)):
        if not fa.fused_block_supported(s, hd, jnp.dtype(dtype).itemsize):
            record(f"fused_block s{s} hd{hd} {jnp.dtype(dtype).name}",
                   False, "unexpectedly unsupported")
            continue
        ks = jax.random.split(jax.random.PRNGKey(30 + s), 7)
        x = jax.random.normal(ks[0], (3, s, hd), jnp.float32).astype(dtype)
        gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (1, hd), jnp.float32)
        beta = 0.1 * jax.random.normal(ks[2], (1, hd), jnp.float32)
        wqkv = (jax.random.normal(ks[3], (hd, 3 * hd), jnp.float32)
                * 0.05).astype(dtype)
        bqkv = 0.05 * jax.random.normal(ks[4], (1, 3 * hd), jnp.float32)
        wout = (jax.random.normal(ks[5], (hd, hd), jnp.float32)
                * 0.05).astype(dtype)
        bout = 0.05 * jax.random.normal(ks[6], (1, hd), jnp.float32)
        scale = 1.0 / ((hd // heads) ** 0.5)
        args = (x, gamma, beta, wqkv, bqkv, wout, bout)
        got = jax.jit(functools.partial(
            fa.fused_attention_block, heads=heads, scale=scale))(*args)
        ref = fa._fused_block_ref(*args, heads, scale, 1e-6)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        tol = 0.05 if dtype == jnp.bfloat16 else 5e-3
        record(f"fused_block s{s} hd{hd} {jnp.dtype(dtype).name}",
               err < tol, f"max abs err {err:.2e} (tol {tol})")


def main():
    assert jax.default_backend() == "tpu", "run on TPU hardware"
    validate_packed_fwd_bwd()
    validate_packed_dropout()
    validate_split_dropout()
    validate_legacy_kernels()
    validate_window_pack()
    validate_fused_block()
    bf16_fingerprints()
    ok = all(r["ok"] for r in RESULTS)
    artifact = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "all_ok": ok,
        "results": RESULTS,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "kernel_validation_results.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\n{'ALL PASS' if ok else 'FAILURES PRESENT'} -> {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
