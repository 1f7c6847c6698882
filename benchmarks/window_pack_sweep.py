"""Per-stage window-attention kernel shootout (r3, VERDICT #2).

swin_residue.py shows every Swin-T stage far below its own HBM bound and
the pack kernel ~4.4 ms of the 5.3 ms stage-1 block. Candidates, timed on
12-op in-context chains at each stage's (g, n, heads, dh):

  pack        current multi-window block-diagonal kernel (production plan)
  pack_vmem   same kernel, g_blk doubled under a 32 MB scoped-VMEM option
  xla         split-head dot_product_attention jnp fallback (XLA fused)
  batched     Pallas kernel with a plain batched dot_general per head
              (no block-diag pad/concat; MXU runs (N,dh) batched matmuls)

Run: python benchmarks/window_pack_sweep.py
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

from vision_transformers_tpu.ops.flash_attention import (
    window_pack_plan,
    window_packed_attention,
    _window_pack_ref,
)

STAGES = [  # (g = B·nW, n, heads, dh) — Swin-T @224 batch 128
    ("s1", 128 * 64, 49, 3, 32),
    ("s2", 128 * 16, 49, 6, 32),
    ("s3", 128 * 4, 49, 12, 32),
    ("s4", 128 * 1, 49, 24, 32),
]


def timed_chain(fn, qkv, iters=8, chain=8):
    def chained(x):
        out = None
        for i in range(chain):
            out = fn(x)
            # feed a cheap mix of the output back so ops serialize
            x = x.at[:, :, : out.shape[-1]].add(out * 1e-6)
        return x

    g = jax.jit(chained)
    g = g.lower(qkv).compile(
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"})
    out = g(qkv)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(qkv)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / chain * 1e3


def _batched_kernel(qkv_ref, o_ref, *, heads, dh, scale):
    hd = heads * dh
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        probs = (e / denom).astype(v.dtype)
        o = jax.lax.dot_general(
            probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def batched_attention(qkv, heads, scale, blk):
    g, n, three_hd = qkv.shape
    hd = three_hd // 3
    dh = hd // heads
    return pl.pallas_call(
        functools.partial(_batched_kernel, heads=heads, dh=dh, scale=scale),
        grid=(g // blk,),
        in_specs=[pl.BlockSpec((blk, n, three_hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, n, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qkv)


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "window_pack_sweep_r04.json")
    rows = []
    for name, g, n, heads, dh in STAGES:
        hd = heads * dh
        qkv = jnp.asarray(
            np.random.RandomState(0).randn(g, n, 3 * hd), jnp.bfloat16)
        scale = 1.0 / dh ** 0.5
        row = {"stage": name, "g": g, "heads": heads}

        def record(key, fn):
            try:
                row[key] = round(timed_chain(fn, qkv), 3)
            except Exception as e:  # noqa: BLE001
                row[key] = str(e)[:60]
            rows.append(None)  # placeholder so the flush below always runs
            rows.pop()
            with open(out_path, "w") as f:
                json.dump(rows + [row], f, indent=1)
            print(json.dumps({key: row[key], "stage": name}), flush=True)

        plan = window_pack_plan(g, n, heads, dh, 1, 2)
        if plan:
            record("pack", lambda x: window_packed_attention(
                x, None, heads, scale, plan))

        record("xla", lambda x: _window_pack_ref(x, None, heads, scale))

        for blk in (32, 128):
            if g % blk == 0:
                record(f"batched{blk}",
                       lambda x, b=blk: batched_attention(x, heads, scale, b))
        rows.append(row)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
