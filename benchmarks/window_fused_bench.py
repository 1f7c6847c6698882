"""Fused NHWC window kernel: measured keep-or-kill on the chip.

swin_layout_ablation.py put Swin-T/224's window partition/reverse at
~2.8 ms/fwd and the cyclic roll pair at ~1.4 ms (12% of the forward, pure
HBM layout traffic). The fused kernel (flash_attention.py,
_window_fused_kernel) folds all of it into the attention program's DMA
indexing. This measures full-model forwards with the kernel ON vs OFF
(same weights, same everything else) for the windowed families, plus a
Swin-T train step, and writes benchmarks/window_fused_r04.json.

Run: python benchmarks/window_fused_bench.py
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
from vision_transformers_tpu.models.image_classification import (
    SwinTransformer,
    SwinTransformerV2,
    TwinSVT,
)
from vision_transformers_tpu.utils.args import get_args

BATCH = int(os.environ.get("FUSED_BATCH", 128))
OPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def build(name):
    if name == "swint_224":
        return SwinTransformer(**get_args("swint_224_imagenet"),
                               dtype=jnp.bfloat16)
    if name == "swinv2t_224":
        return SwinTransformerV2(**get_args("swinv2t_224_imagenet"),
                                 dtype=jnp.bfloat16)
    if name == "twins_svts224":
        return TwinSVT(img_size=224, num_classes=1000, dtype=jnp.bfloat16)
    raise ValueError(name)


def fwd_ms(model, params, x, fused):
    W.FORCE_FUSED_WINDOW = fused
    f = jax.jit(lambda p, v: model.apply(p, v))
    g = f.lower(params, x).compile(compiler_options=OPTS)
    return timed(g, params, x)


def train_ms(model, params, x, y, fused):
    W.FORCE_FUSED_WINDOW = fused

    def loss(p, v, t):
        logits = model.apply(p, v, deterministic=True)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, t[:, None], -1))

    f = jax.jit(jax.grad(loss))
    g = f.lower(params, x, y).compile(compiler_options=OPTS)
    return timed(g, params, x, y)


def main():
    backend = jax.default_backend()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 1000, (BATCH,)), jnp.int32)
    out = {"backend": backend, "batch": BATCH, "models": {}}
    for name in ("swint_224", "swinv2t_224", "twins_svts224"):
        model = build(name)
        params = model.init(jax.random.PRNGKey(0), x[:1])
        row = {}
        for fused in (False, True):
            ms = fwd_ms(model, params, x, fused)
            key = "fused" if fused else "baseline"
            row[key + "_ms"] = round(ms, 2)
            row[key + "_img_per_s"] = round(BATCH / ms * 1e3, 1)
            print(json.dumps({"model": name, "fused": fused,
                              "ms": round(ms, 2)}), flush=True)
        if name == "swint_224":
            for fused in (False, True):
                ms = train_ms(model, params, x, y, fused)
                key = ("fused" if fused else "baseline") + "_grad_ms"
                row[key] = round(ms, 2)
                print(json.dumps({"model": name, "grad": True,
                                  "fused": fused, "ms": round(ms, 2)}),
                      flush=True)
        row["speedup"] = round(row["baseline_ms"] / row["fused_ms"], 3)
        out["models"][name] = row
    W.FORCE_FUSED_WINDOW = None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.environ.get("FUSED_OUT", "window_fused_r04.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
