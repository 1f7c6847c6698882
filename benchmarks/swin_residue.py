"""Per-stage, per-op residue accounting for Swin-T @224 (VERDICT r2 #2c).

Layout ops measured free (swin_layout_ablation.py); this script breaks a
block into halves per stage via in-context differenced chains (the
attn_residue.py methodology — isolated op timings carry ~1 ms of tunnel
dispatch and are unusable).

Run: python benchmarks/swin_residue.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.models.image_classification.swin_transformer import (
    SwinTransformerBlock,
)

BATCH = int(os.environ.get("SWIN_BATCH", 128))
DT = jnp.bfloat16
PEAK = 197e12
HBM = 819e9  # v5e HBM bandwidth


def timed(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def chain(block, params_list, x, k):
    def f(ps, x):
        for p in ps:
            x = block.apply({"params": p}, x, deterministic=True)
        return x

    opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    g = jax.jit(f).lower(params_list[:k], x).compile(compiler_options=opts)
    return timed(g, params_list[:k], x)


STAGES = [  # (H, W, C, heads, n_blocks in Swin-T)
    (56, 56, 96, 3, 2),
    (28, 28, 192, 6, 2),
    (14, 14, 384, 12, 6),
    (7, 7, 768, 24, 2),
]


def stage_report(h, w, c, heads, blocks, window=7):
    x = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, h, w, c), DT)
    block = SwinTransformerBlock(
        c, heads, window_size=[window, window], shift_size=[0, 0],
        stochastic_depth_prob=0.0, dtype=DT)
    params = []
    for i in range(8):
        params.append(block.init(jax.random.PRNGKey(i), x)["params"])

    t4 = chain(block, params, x, 4)
    t8 = chain(block, params, x, 8)
    per_block = (t8 - t4) / 4

    t = h * w
    macs = BATCH * (12 * t * c * c + 2 * t * (window * window) * c)
    flops = 2 * macs
    # activation traffic model (bf16): x in/out per fused group; see
    # PERFORMANCE.md r3 Swin section for the derivation
    act = BATCH * t * c * 2
    bytes_model = act * (2 + 3 + 3 + 1 + 2 + 1 + 4 + 4 + 1)
    return {
        "stage": f"{h}x{w}x{c}", "blocks": blocks,
        "ms_per_block": round(per_block, 3),
        "stage_ms": round(per_block * blocks, 2),
        "flop_ms": round(flops / PEAK * 1e3, 3),
        "hbm_ms": round(bytes_model / HBM * 1e3, 3),
        "mfu": round(flops / (per_block / 1e3) / PEAK, 3),
    }


def main():
    total = 0.0
    for h, w, c, heads, blocks in STAGES:
        r = stage_report(h, w, c, heads, blocks)
        total += r["stage_ms"]
        print(json.dumps(r))
    print(json.dumps({"sum_stage_ms": round(total, 2),
                      "note": "full model 34.0 ms incl merges/embed/head"}))


if __name__ == "__main__":
    main()
