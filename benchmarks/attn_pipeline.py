"""Intra-program phase pipelining for the packed attention kernel.

The production kernel's per-head loop serializes MXU (QK), VPU (softmax),
MXU (PV) phases; measured in-chain cost ~1.1 ms/layer vs a ~0.7 ms
max(VPU, MXU+DMA) floor. Variants (all bit-exact vs production unless
noted):

  base       — production packed kernel
  scalefold  — q *= scale before the QK dot (exact: 1/sqrt(64) = 0.125 is
               a power of two, a bf16 exponent shift), deleting the
               full-S^2 VPU scale pass
  pipelined  — scalefold + software-pipelined head loop: PV of head h-1
               issues between QK of head h and its softmax, giving Mosaic
               independent MXU/VPU work to overlap
  pack2      — scalefold + 2 heads per QK/PV matmul via block-diagonal
               lane packing (full 128-deep contraction)

Run on the chip: python benchmarks/attn_pipeline.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, D, MLP, H = 256, 197, 768, 3072, 12
DT = jnp.bfloat16
DH = 64


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[0]))
    return (time.perf_counter() - t0) / iters


def _mk_call(kernel_fn, b, s, hd, dtype, b_blk=4):
    three_hd = 3 * hd
    return pl.pallas_call(
        kernel_fn,
        grid=(b // b_blk,),
        in_specs=[pl.BlockSpec((b_blk, s, three_hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((b_blk, s, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, s, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, hd), dtype),
            jax.ShapeDtypeStruct((b, s, H), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * H * s * s * DH,
            bytes_accessed=4 * b * s * hd * dtype.itemsize,
            transcendentals=b * H * s * s,
        ),
    )


def kern_scalefold(qkv_ref, o_ref, lse_ref, *, scale):
    hd = H * DH
    sc = jnp.asarray(scale, qkv_ref.dtype)
    for h in range(H):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH] * sc
        k = qkv_ref[:, :, hd + h * DH:hd + (h + 1) * DH]
        v = qkv_ref[:, :, 2 * hd + h * DH:2 * hd + (h + 1) * DH]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * DH:(h + 1) * DH] = (o / denom).astype(o_ref.dtype)
        lse_ref[:, :, h:h + 1] = m + jnp.log(denom)


def kern_pipelined(qkv_ref, o_ref, lse_ref, *, scale):
    hd = H * DH
    sc = jnp.asarray(scale, qkv_ref.dtype)

    def qk(h):
        q = qkv_ref[:, :, h * DH:(h + 1) * DH] * sc
        k = qkv_ref[:, :, hd + h * DH:hd + (h + 1) * DH]
        return jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def pv(h, e, denom, m):
        v = qkv_ref[:, :, 2 * hd + h * DH:2 * hd + (h + 1) * DH]
        o = jax.lax.dot_general(
            e, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * DH:(h + 1) * DH] = (o / denom).astype(o_ref.dtype)
        lse_ref[:, :, h:h + 1] = m + jnp.log(denom)

    prev = None
    for h in range(H):
        s = qk(h)                      # MXU  (head h)
        if prev is not None:
            pv(*prev)                  # MXU  (head h-1), independent of s
        m = jnp.max(s, axis=-1, keepdims=True)   # VPU (head h)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        prev = (h, e.astype(qkv_ref.dtype), denom, m)
    pv(*prev)


def kern_pack2(qkv_ref, o_ref, lse_ref, *, scale):
    hd = H * DH
    sc = jnp.asarray(scale, qkv_ref.dtype)
    bb = qkv_ref.shape[0]
    for hp in range(H // 2):
        h0, h1 = 2 * hp, 2 * hp + 1
        q2 = qkv_ref[:, :, h0 * DH:(h1 + 1) * DH] * sc   # (b, S, 128)
        k2 = qkv_ref[:, :, hd + h0 * DH:hd + (h1 + 1) * DH]
        v2 = qkv_ref[:, :, 2 * hd + h0 * DH:2 * hd + (h1 + 1) * DH]
        # block-diagonal Q: rows [0,S) hold head0 lanes 0..64, rows [S,2S)
        # head1 lanes 64..128 -> one (2S,128)x(128,S) full-depth QK matmul
        zero = jnp.zeros_like(q2)
        top = jnp.concatenate(
            [q2[:, :, :DH], zero[:, :, :DH]], axis=2)
        bot = jnp.concatenate(
            [zero[:, :, DH:], q2[:, :, DH:]], axis=2)
        qbd = jnp.concatenate([top, bot], axis=1)        # (b, 2S, 128)
        s = jax.lax.dot_general(
            qbd, k2, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (b, 2S, S)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o2 = jax.lax.dot_general(
            e.astype(v2.dtype), v2,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (b, 2S, 128)
        o2 = o2 / denom
        o_ref[:, :, h0 * DH:(h0 + 1) * DH] = (
            o2[:, :S, :DH]).astype(o_ref.dtype)
        o_ref[:, :, h1 * DH:(h1 + 1) * DH] = (
            o2[:, S:, DH:]).astype(o_ref.dtype)
        lse_ref[:, :, h0:h0 + 1] = (m + jnp.log(denom))[:, :S]
        lse_ref[:, :, h1:h1 + 1] = (m + jnp.log(denom))[:, S:]


def main():
    from vision_transformers_tpu.ops.flash_attention import (
        packed_flash_attention,
    )

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, S, D) * 0.02, DT)
    qkv0 = jnp.asarray(rng.randn(B, S, 3 * D), DT)
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)
    wqkv = jnp.asarray(rng.randn(D, 3 * D) * 0.02, DT)
    bqkv = jnp.zeros((3 * D,), DT)
    wout = jnp.asarray(rng.randn(D, D) * 0.02, DT)
    bout = jnp.zeros((D,), DT)
    w1 = jnp.asarray(rng.randn(D, MLP) * 0.02, DT)
    b1 = jnp.zeros((MLP,), DT)
    w2 = jnp.asarray(rng.randn(MLP, D) * 0.02, DT)
    b2 = jnp.zeros((D,), DT)
    scale = 1.0 / DH ** 0.5

    variants = {}
    for name, kern in [("scalefold", kern_scalefold),
                       ("pipelined", kern_pipelined),
                       ("pack2", kern_pack2)]:
        call = _mk_call(functools.partial(kern, scale=scale),
                        B, S, D, jnp.dtype(DT))
        variants[name] = lambda y, call=call: call(y)[0]

    ref = packed_flash_attention(qkv0, H)
    for name, fn in variants.items():
        got = fn(qkv0)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(json.dumps({"variant": name, "max_abs_diff": err}))

    def ln(x):
        return (jax.nn.standardize(
            x.astype(jnp.float32), axis=-1, epsilon=1e-6)
            * gamma + beta).astype(DT)

    def chain(attn):
        def layer(x):
            y = ln(x) @ wqkv + bqkv
            y = attn(y)
            x = x + (y @ wout + bout)
            y = jax.nn.gelu((ln(x) @ w1 + b1), approximate=True)
            return x + (y @ w2 + b2)

        def f(x):
            for _ in range(12):
                x = layer(x)
            return x
        return jax.jit(f)

    t = timeit(chain(lambda y: packed_flash_attention(y, H)), x0)
    print(json.dumps({"variant": "base", "ms_12layers": round(t * 1e3, 2)}))
    for name, fn in variants.items():
        t = timeit(chain(fn), x0)
        print(json.dumps({"variant": name,
                          "ms_12layers": round(t * 1e3, 2)}))


if __name__ == "__main__":
    main()
