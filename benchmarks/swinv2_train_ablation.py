"""SwinV2-T train-step ablation: where do 246 ms go? (r5)

SwinV2-T trains at 246 ms / 7.2% MFU while Swin-T (same depths/heads,
window 7 vs 8, no cosine attention) trains at 119 ms / 14.7%
(hier_train_r05.json). The backward is ~6.1x the forward vs Swin's
~3.1x. The config delta is exactly: cosine attention (dense-map fp32
l2-normalization + per-head temperature, windows.py:266-310), the
CPB-MLP bias (vs a direct table), and window 8 vs 7. This script times
the full production train step (train_step_fn, donated state, 64 MB
scoped VMEM — same harness as hier_bench.time_train) under targeted
monkeypatches of `windows.shifted_window_attention` that change ONE
term at a time:

- baseline        : as shipped
- sg_bias         : stop_gradient(rel_bias) -> kills the dS->CPB-MLP
                    bias backward (the kernel still emits dS; XLA DCEs
                    the consumer)
- no_cosine       : logit_scale=None -> Swin semantics at window 8;
                    removes the l2norm/temperature fwd+bwd entirely
- no_cosine+sg_bias: both (the remaining delta vs Swin-T is window
                    8 geometry + post-norm only)

Timing-only ablations: sg_bias / no_cosine change training semantics;
losses are not comparable, wall time is.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "swinv2_train_ablation_r05.json")


def time_train(model, batch=128, image=224, iters=8):
    from vision_transformers_tpu.training.trainer import (
        make_train_state, train_step_fn,
    )

    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, image, image, 3), jnp.float32)
    labels = jnp.zeros((batch,), jnp.int32)
    w = jnp.ones((batch,), jnp.float32)
    state = make_train_state(model, jax.random.PRNGKey(0), x[:1], lr=1e-3)
    rng = jax.random.PRNGKey(1)
    step = jax.jit(train_step_fn(model), donate_argnums=0)
    if jax.default_backend() == "tpu":
        step = step.lower(state, x, labels, w, rng).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    state, l, _, _ = step(state, x, labels, w, rng)
    float(l)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, l, _, _ = step(state, x, labels, w, rng)
    float(l)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from vision_transformers_tpu.models.image_classification import (
        SwinTransformerV2,
    )
    from vision_transformers_tpu.ops import windows as W
    from vision_transformers_tpu.utils.args import get_args

    model = SwinTransformerV2(
        **get_args("swinv2t_224_imagenet"), dtype=jnp.bfloat16)
    orig = W.shifted_window_attention

    def patched(sg_bias=False, no_cosine=False):
        def fn(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
               relative_position_bias, window_size, num_heads, shift_size,
               **kw):
            if sg_bias and relative_position_bias is not None:
                relative_position_bias = jax.lax.stop_gradient(
                    relative_position_bias)
            if no_cosine:
                kw["logit_scale"] = None
            return orig(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                        relative_position_bias, window_size, num_heads,
                        shift_size, **kw)
        return fn

    report = {"backend": jax.default_backend(), "batch": 128,
              "iters": 8, "variants": {}}
    variants = [
        ("baseline", {}),
        ("sg_bias", {"sg_bias": True}),
        ("no_cosine", {"no_cosine": True}),
        ("no_cosine+sg_bias", {"no_cosine": True, "sg_bias": True}),
    ]
    for name, kwargs in variants:
        W.shifted_window_attention = patched(**kwargs) if kwargs else orig
        try:
            ms = time_train(model)
        finally:
            W.shifted_window_attention = orig
        report["variants"][name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)
        with open(OUT + ".tmp", "w") as f:
            json.dump(report, f, indent=1)
        os.replace(OUT + ".tmp", OUT)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
