"""Hierarchical-model throughput + per-stage MFU accounting (VERDICT r2 #2).

Measures full-model bf16 inference for Swin-T/224 (window 7) and
SwinV2-T/224 (window 8) at batch 128 on the real chip, and computes the
analytic FLOP model used for the MFU numbers in PERFORMANCE.md.

Run: python benchmarks/hier_bench.py [--models swint_224,swinv2t_224]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12


def swin_flops_per_image(image=224, patch=4, embed=96, depths=(2, 2, 6, 2),
                         window=7, mlp_ratio=4.0):
    """mult+add FLOPs (2·MACs) per image for the Swin family."""
    macs = 0
    t = (image // patch) ** 2
    macs += t * (patch * patch * 3) * embed          # patch-embed conv
    n = window * window
    for i, depth in enumerate(depths):
        c = embed * 2 ** i
        ti = t // 4 ** i
        per_block = (
            3 * ti * c * c          # qkv projection
            + 2 * ti * n * c        # scores + PV (window attention)
            + ti * c * c            # out projection
            + int(2 * mlp_ratio) * ti * c * c  # fc1 + fc2
        )
        macs += depth * per_block
        if i < len(depths) - 1:
            macs += (ti // 4) * (4 * c) * (2 * c)    # patch merge reduction
    return 2 * macs


def bench_model(name, batch, iters=20, image=224):
    from vision_transformers_tpu.models.image_classification import (
        SwinTransformer, SwinTransformerV2,
    )
    from vision_transformers_tpu.utils.args import get_args

    args = get_args(f"{name}_imagenet")
    cls = SwinTransformerV2 if "v2" in name else SwinTransformer
    model = cls(**args, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, image, image, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    fwd = fwd.lower(params, x).compile(compiler_options=opts)
    out = fwd(params, x)
    float(jnp.sum(out.astype(jnp.float32)))  # sync (block_until_ready no-op)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    flops = swin_flops_per_image(
        image=image, patch=args["patch_size"][0], embed=args["embed_dim"],
        depths=tuple(args["depths"]), window=args["window_size"][0],
        mlp_ratio=args["mlp_ratio"])
    return {
        "model": name, "batch": batch, "ms": round(dt * 1e3, 1),
        "img_per_s": round(ips, 1),
        "gflop_per_img": round(flops / 1e9, 2),
        "mfu": round(ips * flops / V5E_PEAK_FLOPS, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="swint_224,swinv2t_224")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    for name in args.models.split(","):
        print(json.dumps(bench_model(name.strip(), args.batch)))


if __name__ == "__main__":
    main()
