"""Measure the S=197 tile-quantization cost in the ViT-B/16 forward.

bf16 arrays tile at (16, 128): a (B, 197, D) activation physically
occupies (B, 208, D), and the ragged logical edge blocks XLA from
treating the batched projections as one flat (B*S, D) matmul without a
relayout. Variants (12-layer encoder chain, batch 256):

  s197        — production shapes (logical S=197)
  s208_mask   — S padded to 208, pad keys masked in the packed kernel
                (numerically exact vs s197 on the 197 real tokens)
  s208_nomask — S=208, no mask (numerically wrong; isolates mask cost)
  s224_mask   — S=224 (a 2*sublane multiple), masked

Run on the chip: python benchmarks/seq_pad.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, D, MLP, H = 256, 768, 3072, 12
DT = jnp.bfloat16


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main():
    from vision_transformers_tpu.ops.flash_attention import (
        packed_flash_attention,
    )

    rng = np.random.RandomState(0)
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

    def ln(x):
        return (jax.nn.standardize(
            x.astype(jnp.float32), axis=-1, epsilon=1e-6)
            * gamma + beta).astype(DT)

    def make_chain(kv_valid):
        def layer(x):
            y = ln(x) @ wqkv + bqkv
            y = packed_flash_attention(y, H, kv_valid=kv_valid)
            x = x + (y @ wout + bout)
            y = jax.nn.gelu((ln(x) @ w1 + b1), approximate=True)
            return x + (y @ w2 + b2)

        def chain(x):
            for _ in range(12):
                x = layer(x)
            return x
        return jax.jit(chain)

    variants = [
        ("s197", 197, None),
        ("s208_mask", 208, 197),
        ("s208_nomask", 208, None),
        ("s224_mask", 224, 197),
    ]
    for name, s, kv_valid in variants:
        x = jnp.asarray(rng.randn(B, s, D) * 0.02, DT)
        t = timeit(make_chain(kv_valid), x)
        print(json.dumps({
            "variant": name, "S": s, "ms_12layers": round(t * 1e3, 2),
            "img_per_s_equiv": round(B / t, 1),
        }))


if __name__ == "__main__":
    main()
