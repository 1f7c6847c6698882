"""Per-op residue profile of the ViT-B/16 @224 bf16 forward (batch 256).

Times each stage of the encoder layer in isolation (own jit, queued iters,
one host sync — bench.py methodology) and compares against its roofline
bound, to locate the remaining gap between the measured forward and the
95%-of-roofline target (VERDICT r2 item 1).

Run on the chip: python benchmarks/vit_residue.py
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

B, S, D, MLP, H = 256, 197, 768, 3072, 12
DT = jnp.bfloat16
PEAK = 197e12       # v5e bf16 FLOP/s
HBM_BW = 819e9      # v5e HBM bytes/s


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(jax.device_get(a.ravel()[0])), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # one host sync for the queued chain (axon tunnel: block_until_ready
    # does not synchronize)
    jax.tree.map(lambda a: np.asarray(jax.device_get(a.ravel()[0])), out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, D) * 0.02, DT)
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
    qkv = jnp.asarray(rng.randn(B, S, 3 * D) * 0.02, DT)

    from vision_transformers_tpu.ops.flash_attention import (
        packed_flash_attention,
    )

    gb = lambda *t: sum(a.size * a.dtype.itemsize for a in t) / 1e9

    ln = jax.jit(lambda x: (
        jax.nn.standardize(x.astype(jnp.float32), axis=-1, epsilon=1e-6)
        * gamma + beta).astype(DT))
    qkv_mm = jax.jit(lambda x: x @ wqkv + bqkv)
    ln_qkv = jax.jit(lambda x: ln(x) @ wqkv + bqkv)
    attn = jax.jit(functools.partial(packed_flash_attention, heads=H))
    outproj_res = jax.jit(lambda o, x: x + (o @ wout + bout))

    def mlp_fn(x):
        y = x @ w1 + b1
        y = jax.nn.gelu(y, approximate=True)
        return y @ w2 + b2
    mlp = jax.jit(mlp_fn)
    ln_mlp_res = jax.jit(lambda x: x + mlp_fn(ln(x)))

    rows = []

    def rep(name, t, flops=0.0, mem=0.0):
        bound = max(flops / PEAK, mem / HBM_BW)
        rows.append({
            "op": name, "ms": round(t * 1e3, 3),
            "bound_ms": round(bound * 1e3, 3),
            "pct_of_bound": round(100 * bound / t, 1) if t else 0.0,
        })

    t = timeit(ln, x)
    rep("LN (256,197,768)", t, mem=2 * x.size * 2 + x.size * 0)
    t = timeit(qkv_mm, x)
    rep("QKV matmul", t, flops=2 * B * S * D * 3 * D,
        mem=gb(x) * 1e9 + B * S * 3 * D * 2 + wqkv.size * 2)
    t = timeit(ln_qkv, x)
    rep("LN+QKV chain (XLA)", t, flops=2 * B * S * D * 3 * D,
        mem=2 * (x.size * 2) + B * S * 3 * D * 2 + wqkv.size * 2)
    t = timeit(attn, qkv)
    rep("packed attention kernel", t, flops=4 * B * H * S * S * (D // H),
        mem=qkv.size * 2 + B * S * D * 2)
    o = jnp.asarray(rng.randn(B, S, D) * 0.02, DT)
    t = timeit(outproj_res, o, x)
    rep("out proj + residual", t, flops=2 * B * S * D * D,
        mem=3 * B * S * D * 2 + wout.size * 2)
    t = timeit(mlp, x)
    rep("MLP fc1+gelu+fc2", t, flops=4 * B * S * D * MLP,
        mem=2 * B * S * D * 2 + (w1.size + w2.size) * 2)
    t = timeit(ln_mlp_res, x)
    rep("LN+MLP+residual chain (XLA)", t, flops=4 * B * S * D * MLP,
        mem=4 * B * S * D * 2 + (w1.size + w2.size) * 2)

    # full single layer, chained (XLA context): ln->qkv->attn->proj->res->
    # ln->mlp->res
    def layer(x):
        y = ln(x)
        y = y @ wqkv + bqkv
        y = packed_flash_attention(y, H)
        x = x + (y @ wout + bout)
        return x + mlp_fn(ln(x))
    layer_j = jax.jit(layer)
    t = timeit(layer_j, x)
    fl = 2 * B * S * D * 3 * D + 4 * B * H * S * S * (D // H) \
        + 2 * B * S * D * D + 4 * B * S * D * MLP
    rep("FULL LAYER (chained)", t, flops=fl)

    def twelve(x):
        for _ in range(12):
            x = layer(x)
        return x
    t = timeit(jax.jit(twelve), x, iters=10)
    rep("12 LAYERS (chained)", t, flops=12 * fl)

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
