"""Packed-QKV attention kernel prototype vs the production path.

Finding from attn_ablation.py: the current kernel is HBM-pipeline-bound
(copy-only == full == ~1.4 ms/layer) and the REST of the attention path —
XLA split/transpose of q/k/v to (B,H,S,D), the kt pre-transpose, and the
output transpose back to (B,S,768) — roughly doubles that in materialized
HBM passes. This prototype consumes the QKV matmul output (B,S,3HD)
directly and emits (B,S,HD): no transposes anywhere, no half-lane (D=64)
blocks in HBM.

Each timed "layer" = x @ Wqkv + attention-path, chained 12x in one jit
(per-call tunnel dispatch otherwise dominates; see axon quirks).
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

from vision_transformers_tpu.ops.flash_attention import flash_attention

B, H, S, D = 256, 12, 197, 64
HD = H * D
SCALE = 1.0 / D ** 0.5
ITERS = 20
LAYERS = 12


def packed_attn_kernel(qkv_ref, o_ref, *, heads, dh, scale):
    """One program: (b_blk, S, 3·H·dh) → (b_blk, S, H·dh)."""
    hd = heads * dh
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                  # (b_blk, S, S)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * dh:(h + 1) * dh] = (
            o / denom).astype(o_ref.dtype)


def packed_attention(qkv, heads, dh, b_blk):
    b, s, _ = qkv.shape
    grid = (b // b_blk,)
    return pl.pallas_call(
        functools.partial(packed_attn_kernel, heads=heads, dh=dh,
                          scale=SCALE),
        grid=grid,
        in_specs=[pl.BlockSpec((b_blk, s, 3 * heads * dh),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b_blk, s, heads * dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, heads * dh), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qkv)


def current_path(x, w):
    """Production round-1 path: matmul + split/transpose + kernel + back."""
    b, s, _ = x.shape
    qkv = x @ w
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, H, D).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, H, D).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, H, D).transpose(0, 2, 1, 3)
    out = flash_attention(q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(b, s, HD)


def make_packed_path(b_blk):
    def packed_path(x, w):
        qkv = x @ w
        return packed_attention(qkv, H, D, b_blk)
    return packed_path


def matmul_only(x, w):
    return (x @ w)[:, :, :HD]


def bench(name, path, x, w):
    @jax.jit
    def chained(x, w):
        def body(i, acc):
            return path(acc, w).astype(x.dtype)
        return jax.lax.fori_loop(0, LAYERS, body, x)

    out = chained(x, w)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chained(x, w)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS / LAYERS * 1e3
    print(f"{name:>16}: {dt:7.3f} ms/layer")
    return dt


def check_numerics(b_blk=2):
    """Packed kernel vs the jnp oracle on small shapes."""
    key = jax.random.PRNGKey(7)
    qkv = jax.random.normal(key, (4, S, 3 * HD), jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(4, S, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(4, S, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(4, S, H, D).transpose(0, 2, 1, 3)
    hi = jax.lax.Precision.HIGHEST
    sc = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, precision=hi) * SCALE
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), vh,
                     precision=hi)
    ref = ref.transpose(0, 2, 1, 3).reshape(4, S, HD)
    got = packed_attention(qkv, H, D, b_blk)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"numerics (fp32, b_blk={b_blk}): max abs err = {err:.2e}")
    assert err < 5e-3, err  # Mosaic fp32 dot precision differs from HIGHEST


def main():
    check_numerics()
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (B, S, HD), jnp.bfloat16)
    w = jax.random.normal(kw, (HD, 3 * HD), jnp.bfloat16) * 0.02

    print(f"B={B} H={H} S={S} D={D} bf16; each layer = qkv-matmul + attn")
    print(f"qkv matmul roofline: {2*B*S*HD*3*HD/197e12*1e3:.3f} ms")
    bench("matmul_only", matmul_only, x, w)
    bench("current(r1)", current_path, x, w)
    for b_blk in (1, 2, 4, 8):
        if B % b_blk == 0:
            try:
                bench(f"packed@{b_blk}", make_packed_path(b_blk), x, w)
            except Exception as ex:  # VMEM OOM etc.
                print(f"packed@{b_blk}: FAILED {type(ex).__name__}")


if __name__ == "__main__":
    main()
