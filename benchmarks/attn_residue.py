"""In-chain cost of the packed attention kernel at ViT-B/16 shapes.

The isolated per-op numbers in vit_residue.py carry ~1 ms of dispatch
overhead through the tunnel; this script measures marginal in-context
costs by differencing 12-layer chains:

  base      — production layer
  attn_id   — attention kernel replaced by a lane slice of qkv
              (base - attn_id = the kernel's true in-chain cost)
  mlp_only  — x + mlp(ln(x)) halves only
  attn_only — x + proj(attn(ln(x) @ Wqkv)) halves only

plus a b_blk sweep of the packed kernel inside the full chain.

Run on the chip: python benchmarks/attn_residue.py
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
    import vision_transformers_tpu.ops.flash_attention as fa

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, S, D) * 0.02, DT)
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

    def mlp_half(x):
        y = jax.nn.gelu((ln(x) @ w1 + b1), approximate=True)
        return x + (y @ w2 + b2)

    def attn_half(x, attn):
        y = ln(x) @ wqkv + bqkv
        y = attn(y)
        return x + (y @ wout + bout)

    kernel_attn = lambda y: fa.packed_flash_attention(y, H)
    id_attn = lambda y: y[..., :D]

    def chain(layer):
        def f(x):
            for _ in range(12):
                x = layer(x)
            return x
        return jax.jit(f)

    rows = []
    for name, layer in [
        ("base", lambda x: mlp_half(attn_half(x, kernel_attn))),
        ("attn_id", lambda x: mlp_half(attn_half(x, id_attn))),
        ("mlp_only", mlp_half),
        ("attn_only", lambda x: attn_half(x, kernel_attn)),
        ("attn_only_id", lambda x: attn_half(x, id_attn)),
    ]:
        t = timeit(chain(layer), x0)
        rows.append((name, t))
        print(json.dumps({"variant": name,
                          "ms_12layers": round(t * 1e3, 2),
                          "ms_per_layer": round(t * 1e3 / 12, 3)}))
    d = dict(rows)
    print(json.dumps({
        "attn_kernel_in_chain_ms_per_layer":
            round((d["base"] - d["attn_id"]) * 1e3 / 12, 3),
        "attn_kernel_in_half_ms_per_layer":
            round((d["attn_only"] - d["attn_only_id"]) * 1e3 / 12, 3),
    }))

    # b_blk sweep inside the full chain
    orig = fa._pick_batch_block
    try:
        for blk in (2, 4, 8, 16):
            fa._pick_batch_block = (
                lambda b, s, hd, i, n_score_bufs=3, _blk=blk: _blk)
            t = timeit(chain(
                lambda x: mlp_half(attn_half(x, kernel_attn))), x0)
            print(json.dumps({"b_blk": blk,
                              "ms_12layers": round(t * 1e3, 2)}))
    finally:
        fa._pick_batch_block = orig


if __name__ == "__main__":
    main()
