"""A/B the fused LN+Dense kernel in a 12-layer ViT-B/16 chain (batch 256).

Variants:
  base  — the current production layer (XLA LayerNorm feeding the packed
          attention path and XLA MLP)
  noln  — LayerNorms deleted (lower bound for what LN fusion can recover)
  fused — ln_dense for [ln_1 + QKV] and [ln_2 + fc1 + GELU]

Run on the chip: python benchmarks/ln_fused.py
"""

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
    from vision_transformers_tpu.ops.fused_dense import ln_dense

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, D) * 0.02, DT)
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)
    wqkv = jnp.asarray(rng.randn(D, 3 * D) * 0.02, DT)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wout = jnp.asarray(rng.randn(D, D) * 0.02, DT)
    bout = jnp.zeros((D,), DT)
    w1 = jnp.asarray(rng.randn(D, MLP) * 0.02, DT)
    b1 = jnp.zeros((MLP,), jnp.float32)
    w2 = jnp.asarray(rng.randn(MLP, D) * 0.02, DT)
    b2 = jnp.zeros((D,), DT)

    def ln(x):
        return (jax.nn.standardize(
            x.astype(jnp.float32), axis=-1, epsilon=1e-6)
            * gamma + beta).astype(DT)

    def layer_base(x):
        y = ln(x) @ wqkv + bqkv.astype(DT)
        y = packed_flash_attention(y, H)
        x = x + (y @ wout + bout)
        y = jax.nn.gelu((ln(x) @ w1 + b1.astype(DT)), approximate=True)
        return x + (y @ w2 + b2)

    def layer_noln(x):
        y = x @ wqkv + bqkv.astype(DT)
        y = packed_flash_attention(y, H)
        x = x + (y @ wout + bout)
        y = jax.nn.gelu((x @ w1 + b1.astype(DT)), approximate=True)
        return x + (y @ w2 + b2)

    def layer_fused(x):
        y = ln_dense(x, gamma, beta, wqkv, bqkv)
        y = packed_flash_attention(y, H)
        x = x + (y @ wout + bout)
        y = ln_dense(x, gamma, beta, w1, b1, activation="gelu_tanh")
        return x + (y @ w2 + b2)

    for name, layer in [("base", layer_base), ("noln", layer_noln),
                        ("fused", layer_fused)]:
        def chain(x, layer=layer):
            for _ in range(12):
                x = layer(x)
            return x
        t = timeit(jax.jit(chain), x)
        print(json.dumps({"variant": name, "ms_12layers": round(t * 1e3, 2),
                          "ms_per_layer": round(t * 1e3 / 12, 3)}))


if __name__ == "__main__":
    main()
