"""Prototype: head-pair-grid variant of the packed attention kernel.

The production packed kernel runs grid=(B/4,) with a serial 12-head loop
per program (~17 us each): the VPU softmax phases and MXU matmuls of
successive heads serialize, and in-chain it measures ~1.1 ms/layer vs a
0.38 ms HBM bound. This variant splits the grid over (batch, head-pairs)
with q/k/v delivered as three separate 128-lane BlockSpec slices of the
same packed qkv array (clean tile reads, no head-split transposes) so
Mosaic can pipeline many small programs instead of few big ones.

Run on the chip: python benchmarks/attn_packed2.py
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


def _pair_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, hp):
    for h in range(hp):
        q = q_ref[:, :, h * DH:(h + 1) * DH]
        k = k_ref[:, :, h * DH:(h + 1) * DH]
        v = v_ref[:, :, h * DH:(h + 1) * DH]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * DH:(h + 1) * DH] = (o / denom).astype(o_ref.dtype)
        lse_ref[:, h, :, :] = m + jnp.log(denom)


def packed2(qkv, heads, b_blk=8, hp=2, scale=None):
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    assert dh == DH
    if scale is None:
        scale = 1.0 / dh ** 0.5
    lanes = hp * dh
    grid = (b // b_blk, heads // hp)
    nq = hd // lanes
    out, lse = pl.pallas_call(
        functools.partial(_pair_kernel, scale=scale, hp=hp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_blk, s, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, s, lanes),
                         lambda i, j, nq=nq: (i, 0, nq + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, s, lanes),
                         lambda i, j, nq=nq: (i, 0, 2 * nq + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_blk, s, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_blk, hp, s, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, heads, s, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * dh,
            bytes_accessed=4 * b * s * hd * qkv.dtype.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(qkv, qkv, qkv)
    return out


def main():
    from vision_transformers_tpu.ops.flash_attention import (
        packed_flash_attention,
    )

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, S, D) * 0.02, DT)
    qkv0 = jnp.asarray(rng.randn(B, S, 3 * D) * 0.02, DT)
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

    # correctness vs production kernel
    ref = packed_flash_attention(qkv0, H)
    got = packed2(qkv0, H)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(json.dumps({"max_abs_diff_vs_packed": err}))

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
    print(json.dumps({"variant": "packed(base)",
                      "ms_12layers": round(t * 1e3, 2)}))
    for b_blk in (4, 8, 16):
        for hp in (2, 4, 6):
            try:
                t = timeit(chain(functools.partial(
                    packed2, heads=H, b_blk=b_blk, hp=hp)), x0)
                print(json.dumps({
                    "variant": f"packed2 b{b_blk} hp{hp}",
                    "ms_12layers": round(t * 1e3, 2)}))
            except Exception as e:  # VMEM OOM etc.
                print(json.dumps({
                    "variant": f"packed2 b{b_blk} hp{hp}",
                    "error": str(e)[:120]}))


if __name__ == "__main__":
    main()
