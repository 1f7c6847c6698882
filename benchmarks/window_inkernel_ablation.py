"""Where does Swin stage-1 window attention's time actually go?

Every window-attention kernel variant clusters at ~4.9-5.2 ms for s1
(window_variant_sweep_r05) against a ~0.38 ms HBM floor (231 MB qkv in +
77 MB out at 819 GB/s) — a shared in-kernel bound, not a dataflow one.
This ablation differences the batched kernel's internal costs by
compiling stripped variants at the s1 shape (g=8192, N=49, H=3, dh=32,
bf16, shared bias):

  full          production semantics (bias + fp32 softmax)
  no_bias       skip the bias add
  no_softmax    skip max/exp/sum/div (scores straight to the AV matmul)
  softmax_bf16  exp/sum/div in bf16 after the fp32 max-subtract
  matmuls_only  no bias, no softmax — MXU + slicing cost
  copy_v        o = v slice — pure DMA + slicing floor

Writes benchmarks/window_inkernel_ablation_r05.json.
Run: python benchmarks/window_inkernel_ablation.py
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "window_inkernel_ablation_r05.json")


def kernel(qkv_ref, bias_ref, o_ref, *, heads, dh, scale, variant):
    hd = heads * dh
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, hd + h * dh:hd + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * hd + h * dh:2 * hd + (h + 1) * dh]
        if variant == "copy_v":
            o_ref[:, :, h * dh:(h + 1) * dh] = v
            continue
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if variant not in ("no_bias", "matmuls_only"):
            s = s + bias_ref[:, h].astype(jnp.float32)
        if variant in ("no_softmax", "matmuls_only"):
            probs = s.astype(v.dtype)
        elif variant == "softmax_bf16":
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp((s - m).astype(jnp.bfloat16))
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        else:  # full / no_bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        o = jax.lax.dot_general(
            probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def run_variant(variant, qkv, bias, heads, dh, blk, iters=20):
    g, n, three_hd = qkv.shape
    hd = three_hd // 3
    scale = 1.0 / dh ** 0.5
    f = pl.pallas_call(
        functools.partial(kernel, heads=heads, dh=dh, scale=scale,
                          variant=variant),
        grid=(g // blk,),
        in_specs=[pl.BlockSpec((blk, n, three_hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, heads, n, n), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, n, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    jf = jax.jit(lambda a, b: f(a, b)).lower(qkv, bias).compile(
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "32768"})
    out = jf(qkv, bias)
    float(jnp.sum(out.astype(jnp.float32)))  # tunnel sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(qkv, bias)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    report = {"backend": jax.default_backend(), "stages": {}}
    rng = np.random.RandomState(0)
    # (name, g, n, heads, dh, blk): Swin-T @224 B=128 s1 and s2
    for name, g, n, heads, dh, blk in [
        ("s1", 128 * 64, 49, 3, 32, 32),
        ("s2", 128 * 16, 49, 6, 32, 32),
    ]:
        hd = heads * dh
        qkv = jnp.asarray(rng.randn(g, n, 3 * hd) * 0.5, jnp.bfloat16)
        bias = jnp.asarray(rng.randn(1, heads, n, n) * 0.1, jnp.bfloat16)
        row = {}
        for variant in ("full", "no_bias", "no_softmax", "softmax_bf16",
                        "matmuls_only", "copy_v"):
            try:
                row[variant] = round(
                    run_variant(variant, qkv, bias, heads, dh, blk), 3)
            except Exception as e:  # noqa: BLE001
                row[variant] = str(e)[:80]
            print(json.dumps({name: {variant: row[variant]}}), flush=True)
            report["stages"][name] = row
            tmp = OUT + ".tmp"
            with open(tmp, "w") as f:
                json.dump(report, f, indent=1)
            os.replace(tmp, OUT)
    # HBM context for the differencing
    report["hbm_floor_ms"] = {
        "s1": round((128 * 64 * 49 * (3 + 1) * 96 * 2) / 819e9 * 1e3, 3),
        "s2": round((128 * 16 * 49 * (3 + 1) * 192 * 2) / 819e9 * 1e3, 3),
    }
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, OUT)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
