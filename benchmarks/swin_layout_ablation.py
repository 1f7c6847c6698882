"""Measure what Swin's LAYOUT ops (window partition/reverse, cyclic rolls)
cost in-context, by replacing them with memory-order reshapes (identical
shapes + traffic pattern class, wrong numerics — measurement only).

If the delta is large, the next kernel move is windowed BlockSpec index
maps (the pack kernel reading (B, H, W, 3C) directly) rather than more
matmul work.

Run: python benchmarks/swin_layout_ablation.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vision_transformers_tpu.ops.windows as W
from vision_transformers_tpu.models.image_classification import SwinTransformer
from vision_transformers_tpu.utils.args import get_args

BATCH = int(os.environ.get("SWIN_BATCH", 128))


def timed(fwd, params, x, iters=20):
    out = fwd(params, x)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def run(tag):
    args = get_args("swint_224_imagenet")
    model = SwinTransformer(**args, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(BATCH, 224, 224, 3),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    fwd = fwd.lower(params, x).compile(compiler_options=opts)
    ms = timed(fwd, params, x)
    print(json.dumps({"variant": tag, "ms": round(ms, 2),
                      "img_per_s": round(BATCH / ms * 1e3, 1)}))
    return ms


def main():
    real_part, real_rev = W.window_partition, W.window_reverse
    real_roll = jnp.roll

    run("baseline")

    # layout-free partition/reverse: memory-order reshapes (wrong windows)
    W.window_partition = lambda x, wh, ww: x.reshape(
        x.shape[0] * (x.shape[1] // wh) * (x.shape[2] // ww), wh * ww,
        x.shape[3])
    W.window_reverse = lambda x, wh, ww, h, w: x.reshape(
        x.shape[0] // ((h // wh) * (w // ww)), h, w, x.shape[2])
    run("free_partition")

    # additionally delete the cyclic rolls
    W.jnp = type(sys)("fake_jnp")
    W.jnp.__dict__.update(jnp.__dict__)
    W.jnp.roll = lambda x, shift, axis: x
    run("free_partition_no_roll")

    W.window_partition, W.window_reverse = real_part, real_rev
    W.jnp = jnp


if __name__ == "__main__":
    main()
