"""MXU-summed softmax denominator experiment.

The packed kernel's phase ablation (PERFORMANCE.md) shows the VPU
cross-lane reductions (max + sum over the S^2 score matrix) cost
~0.35 ms/layer — the largest non-HBM term. The sum can ride the MXU
instead: append a ones-column to V, so

    [o | denom] = e @ [v | 1]

comes out of the PV matmul that runs anyway (dh=64 -> 65 lanes still
rounds to one 128-lane tile; marginal MXU cost is zero). The denominator
is then an fp32 MXU accumulation of the bf16-rounded e — ~0.4% relative
error, same order as the bf16 output rounding, and the e used for the
numerator is identical so the ratio stays consistent.

Run on the real chip: python benchmarks/attn_mxu_denom.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_transformers_tpu.ops.flash_attention import packed_flash_attention

B, H, S, D = 256, 12, 197, 64
HD = H * D
SCALE = 1.0 / D ** 0.5
ITERS = 50


def mxu_denom_kernel(qkv_ref, o_ref, *, heads, dh, scale):
    hd = heads * dh
    b_blk = qkv_ref.shape[0]
    s_len = qkv_ref.shape[1]
    ones = jnp.ones((b_blk, s_len, 1), qkv_ref.dtype)
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(v.dtype)
        v_ext = jnp.concatenate([v, ones], axis=-1)     # (b, Sk, dh+1)
        o_ext = jax.lax.dot_general(
            e, v_ext,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                               # (b, Sq, dh+1)
        denom = o_ext[:, :, dh:dh + 1]
        o_ref[:, :, h * dh:(h + 1) * dh] = (
            o_ext[:, :, :dh] / denom).astype(o_ref.dtype)


def mxu_denom_attention(qkv, heads=H, dh=D, scale=SCALE, b_blk=4):
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    return pl.pallas_call(
        functools.partial(mxu_denom_kernel, heads=heads, dh=dh, scale=scale),
        grid=(b // b_blk,),
        in_specs=[pl.BlockSpec((b_blk, s, three_hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * dh,
            bytes_accessed=4 * b * s * hd * qkv.dtype.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(qkv)


def bench(name, fn, qkv):
    out = fn(qkv)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(qkv)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:>18}: {dt:7.3f} ms")
    return dt


def main():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * HD),
                            jnp.bfloat16)
    ref = packed_flash_attention(qkv, H, SCALE)
    got = mxu_denom_attention(qkv)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - ref.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"numerics: max abs err = {err:.2e} (rel {rel:.2e})")

    current = jax.jit(lambda x: packed_flash_attention(x, H, SCALE))
    fused = jax.jit(mxu_denom_attention)
    base = bench("current(packed)", current, qkv)
    for b_blk in (2, 4, 8):
        try:
            dt = bench(f"mxu-denom@{b_blk}",
                       jax.jit(functools.partial(mxu_denom_attention,
                                                 b_blk=b_blk)), qkv)
            print(f"    vs current: {(base - dt) / base * 100:+.1f}%")
        except Exception as ex:
            print(f"mxu-denom@{b_blk}: FAILED {type(ex).__name__}")


if __name__ == "__main__":
    main()
