"""Fused encoder-attention-block kernel prototype.

r2 state: packed-QKV attention (qkv matmul in XLA + packed Pallas attention)
runs ~1.8 ms/layer. The remaining overhead is the HBM round trips between
the block's stages: LN1 output, the (B,S,3HD) qkv tensor (written by XLA,
re-read by the kernel), the attention output (written by the kernel, re-read
by the out-projection), and the residual add. This prototype fuses the
whole pre-LN attention sub-block

    x + out_proj(attn(qkv_proj(LN(x))))        (vanilla_vit.py:73-78)

into ONE Pallas program: read x block once, keep Wqkv/Wout resident in VMEM
(constant index map -> Mosaic fetches them once, not per program), do LN on
the VPU, both projections and the per-head attention on the MXU, write the
residual-added output once. HBM traffic per layer drops from ~5 full
(B,S,*) tensors to 2.

Run on the real chip: python benchmarks/attn_fused_block.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_transformers_tpu.ops.flash_attention import packed_flash_attention

B, H, S, D = 256, 12, 197, 64
HD = H * D
SCALE = 1.0 / D ** 0.5
ITERS = 20
LAYERS = 12


def fused_block_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                       g_ref, b_ref, o_ref, *, heads, dh, scale, eps=1e-6):
    x = x_ref[...]                                    # (b_blk, S, HD)
    xf = x.astype(jnp.float32)

    # LayerNorm on the VPU (lane reduction over HD)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * g_ref[...].astype(jnp.float32)
          + b_ref[...].astype(jnp.float32)).astype(x.dtype)

    # QKV projection: (b_blk, S, HD) @ (HD, 3HD), weights VMEM-resident
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)

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
    attn = jnp.concatenate(attn_out, axis=-1)          # (b_blk, S, HD)

    # Out projection + residual
    out = jax.lax.dot_general(
        attn, wout_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + bout_ref[...].astype(jnp.float32) + xf
    o_ref[...] = out.astype(o_ref.dtype)


def fused_block(x, wqkv, bqkv, wout, bout, gamma, beta, b_blk):
    b, s, hd = x.shape
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(fused_block_kernel, heads=H, dh=D, scale=SCALE),
        grid=(b // b_blk,),
        in_specs=[
            pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, 3 * hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * hd * 4 * hd + 4 * b * H * s * s * D,
            bytes_accessed=2 * b * s * hd * x.dtype.itemsize,
            transcendentals=b * H * s * s,
        ),
    )(x, wqkv, bqkv, wout, bout, gamma, beta)


def current_path(x, wqkv, bqkv, wout, bout, gamma, beta):
    """r2 production: XLA LN + qkv matmul, packed kernel, XLA out proj."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta).astype(x.dtype)
    qkv = xn @ wqkv + bqkv
    attn = packed_flash_attention(qkv, H, SCALE)
    return x + (attn @ wout + bout).astype(x.dtype)


def bench(name, path, args):
    @jax.jit
    def chained(*a):
        x, rest = a[0], a[1:]

        def body(i, acc):
            return path(acc, *rest).astype(x.dtype)

        return jax.lax.fori_loop(0, LAYERS, body, x)

    out = chained(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chained(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS / LAYERS * 1e3
    print(f"{name:>16}: {dt:7.3f} ms/layer")
    return dt


def check_numerics(b_blk=2):
    # bf16 weights: fp32 weight blocks alone exceed the 16 MB VMEM budget
    # once Mosaic double-buffers them (measured OOM at 20.3M).
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 7)
    b = 4
    x = jax.random.normal(ks[0], (b, S, HD), jnp.bfloat16)
    wqkv = jax.random.normal(ks[1], (HD, 3 * HD), jnp.bfloat16) * 0.02
    bqkv = jax.random.normal(ks[2], (1, 3 * HD), jnp.bfloat16) * 0.02
    wout = jax.random.normal(ks[3], (HD, HD), jnp.bfloat16) * 0.02
    bout = jax.random.normal(ks[4], (1, HD), jnp.bfloat16) * 0.02
    gamma = jnp.ones((1, HD), jnp.bfloat16)
    beta = jnp.zeros((1, HD), jnp.bfloat16)

    ref = current_path(x, wqkv, bqkv[0], wout, bout[0],
                       gamma[0].astype(jnp.float32),
                       beta[0].astype(jnp.float32))
    got = fused_block(x, wqkv, bqkv, wout, bout, gamma, beta, b_blk)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"numerics (bf16, b_blk={b_blk}): max abs err = {err:.2e}")
    assert err < 5e-2, err


def main():
    check_numerics()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (B, S, HD), jnp.bfloat16)
    wqkv = jax.random.normal(ks[1], (HD, 3 * HD), jnp.bfloat16) * 0.02
    bqkv2 = jax.random.normal(ks[2], (1, 3 * HD), jnp.bfloat16) * 0.02
    wout = jax.random.normal(ks[3], (HD, HD), jnp.bfloat16) * 0.02
    bout2 = jax.random.normal(ks[4], (1, HD), jnp.bfloat16) * 0.02
    gamma2 = jnp.ones((1, HD), jnp.bfloat16)
    beta2 = jnp.zeros((1, HD), jnp.bfloat16)

    print(f"B={B} H={H} S={S} D={D} bf16; layer = LN+qkv+attn+out+residual")
    roof = (2 * B * S * HD * 4 * HD + 4 * B * H * S * S * D) / 197e12 * 1e3
    print(f"FLOP roofline: {roof:.3f} ms/layer")

    bench("current(r2)", current_path,
          (x, wqkv, bqkv2[0], wout, bout2[0],
           gamma2[0].astype(jnp.float32), beta2[0].astype(jnp.float32)))
    for b_blk in (1, 2, 4):
        try:
            bench(f"fused@{b_blk}",
                  lambda acc, *w, bb=b_blk: fused_block(acc, *w, bb),
                  (x, wqkv, bqkv2, wout, bout2, gamma2, beta2))
        except Exception as ex:
            print(f"fused@{b_blk}: FAILED {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
