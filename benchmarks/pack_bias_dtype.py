"""Measure the gradient effect of storing the window-pack bias in the
compute dtype (ADVICE r2 residue / VERDICT r3 weak #6).

The multi-window pack kernel keeps the combined rel-pos + shift-mask bias
VMEM-resident in the COMPUTE dtype (bf16 for bf16 models) to fit Mosaic's
scoped-VMEM line (ops/flash_attention.py, _WINDOW_PACK_VMEM_TARGET); the
recompute backward rounds the bias through the same dtype so forward and
backward see identical values. This script records the residual effect:

  A) fp32 oracle              — fp32 qkv, fp32 bias (ground truth)
  B) pack path at bf16        — Pallas fwd + recompute bwd, bf16 bias
  C) jnp ref at bf16, fp32 bias — isolates the bias-rounding term (B vs C)
  D) jnp ref at bf16, bf16 bias — B's math without the kernel (kernel check)

Reported: max/mean relative gradient deviation (dqkv) and forward-output
deviation for B-vs-A (total bf16 effect), B-vs-C (bias dtype term alone),
B-vs-D (kernel-vs-ref consistency). Shapes = Swin-T stage 1 (N=49, dh=32,
P=4 windows/tile) with per-window shift masks. Writes
benchmarks/pack_bias_dtype_r04.json; runs on CPU (interpret) or TPU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rel_dev(a, b):
    """(normalized L2 ||a-b||/||b||, max |a-b| / RMS(b)) — scale-free
    without the near-zero-denominator blowups of elementwise relative
    error."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    l2 = float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))
    rms = float(np.sqrt(np.mean(b * b)))
    mx = float(np.abs(a - b).max() / max(rms, 1e-30))
    return l2, mx


def main():
    from vision_transformers_tpu.ops.flash_attention import (
        _window_pack, _window_pack_ref, window_pack_plan,
    )

    heads, n, dh = 3, 49, 32
    p = 128 // dh  # 4 windows per MXU tile
    nwp = 2 * p    # per-window shift-mask bias groups
    g = nwp * 16   # windows
    scale = dh ** -0.5
    rng = np.random.RandomState(0)
    qkv32 = jnp.asarray(rng.randn(g, n, 3 * heads * dh) * 0.5, jnp.float32)
    # rel-pos-bias-scale values plus a shift mask (-100 on masked pairs)
    bias32 = jnp.asarray(rng.randn(nwp, heads, n, n) * 2.0, jnp.float32)
    mask = (rng.rand(nwp, 1, n, n) < 0.15) * -100.0
    bias32 = bias32 + jnp.asarray(mask, jnp.float32)
    do = jnp.asarray(rng.randn(g, n, heads * dh), jnp.float32)

    plan = window_pack_plan(g, n, heads, dh, nwp)
    assert plan is not None, "shape must qualify for the pack kernel"
    p_, g_blk = plan

    def grads(fn, qkv, bias):
        out, vjp = jax.vjp(fn, qkv, bias)
        dqkv, _ = vjp(do.astype(out.dtype))
        return np.asarray(out, np.float64), np.asarray(dqkv, np.float64)

    # A: fp32 oracle
    out_a, g_a = grads(
        lambda a, b: _window_pack_ref(a, b, heads, scale), qkv32, bias32)
    # B: pack path at bf16 (kernel fwd, recompute bwd w/ bias rounded)
    qkv16 = qkv32.astype(jnp.bfloat16)
    out_b, g_b = grads(
        lambda a, b: _window_pack(a, b, heads, scale, p_, g_blk),
        qkv16, bias32)
    # C: jnp ref, bf16 inputs, fp32 bias
    out_c, g_c = grads(
        lambda a, b: _window_pack_ref(a, b, heads, scale), qkv16, bias32)
    # D: jnp ref, bf16 inputs, bf16-rounded bias (B's math, no kernel)
    out_d, g_d = grads(
        lambda a, b: _window_pack_ref(
            a, b.astype(jnp.bfloat16), heads, scale), qkv16, bias32)

    report = {
        "backend": jax.default_backend(),
        "shape": {"g": g, "n": n, "heads": heads, "dh": dh,
                  "bias_windows": nwp, "plan": [p_, g_blk]},
        "grad_dev": {
            "pack_bf16_vs_fp32_oracle": rel_dev(g_b, g_a),
            "bias_dtype_term (B_vs_C)": rel_dev(g_b, g_c),
            "kernel_vs_ref_same_rounding (B_vs_D)": rel_dev(g_b, g_d),
            "bf16_inputs_only (C_vs_A)": rel_dev(g_c, g_a),
        },
        "fwd_dev": {
            "pack_bf16_vs_fp32_oracle": rel_dev(out_b, out_a),
            "bias_dtype_term (B_vs_C)": rel_dev(out_b, out_c),
        },
        "note": ("dev = (||a-b||/||b||, max|a-b|/rms(b)); the bias-dtype term is the "
                 "marginal cost of storing the bias in bf16 given bf16 "
                 "inputs; masked (-100) entries round exactly in bf16"),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pack_bias_dtype_r04.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
