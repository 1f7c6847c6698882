"""Headline benchmark: ViT-B/16 @224 images/sec/chip (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is measured throughput / target, where target = 95% of the
single-chip bf16 roofline (the driver-defined north star; the PyTorch
reference publishes no throughput numbers at all — BASELINE.md).

Roofline model: ViT-B/16 @224 forward ≈ 35.1 GFLOP/image (mult+add
convention) — per layer 2S·D·3D (QKV) + 4S²·D (attention) + 2S·D² (out) +
4S·D·4D (MLP) with S=197, D=768, L=12, plus the patch projection. TPU v5e
peak ≈ 197 TFLOP/s bf16.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def vit_b16_flops_per_image(s=197, d=768, mlp=3072, layers=12, patches=196):
    per_layer = (
        2 * s * d * (3 * d)      # QKV projection
        + 4 * s * s * d          # QK^T and PV
        + 2 * s * d * d          # out projection
        + 2 * 2 * s * d * mlp    # MLP fc1+fc2
    )
    patch_proj = 2 * patches * (16 * 16 * 3) * d
    return layers * per_layer + patch_proj


V5E_PEAK_FLOPS = 197e12  # bf16


def main():
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.utils.args import get_args

    on_tpu = jax.default_backend() == "tpu"
    args = get_args("vitb16_224_imagenet")
    model = ViT(**args, dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    batch = 256 if on_tpu else 8
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 224, 224, 3), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1],
    )

    # NOTE axon tunnel: block_until_ready does NOT synchronize; only a host
    # transfer does. Queue all iterations (device executes in order), then
    # force one scalar back to the host to time the whole run.
    #
    # Scoped-VMEM compiler option: raising the 16 MB default lets XLA pick
    # larger fusion tiles around the Pallas calls. Measured sweep (r3):
    # fwd best at 32 MB (61.3 -> 60.9 ms; 64 MB regresses to 62.6), train
    # step best at 64 MB (153.1 -> 148.3 ms).
    fwd_opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"} if on_tpu else None
    train_opts = {"xla_tpu_scoped_vmem_limit_kib": "65536"} if on_tpu else None

    fwd = jax.jit(
        lambda v, x: jnp.sum(model.apply(v, x).astype(jnp.float32)))
    if fwd_opts is not None:
        fwd = fwd.lower(variables, x).compile(compiler_options=fwd_opts)
    float(fwd(variables, x))  # compile + warm

    n_iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    s = None
    for _ in range(n_iters):
        s = fwd(variables, x)
    float(s)  # one sync for the whole queued chain
    dt = time.perf_counter() - t0
    images_per_sec = batch * n_iters / dt

    flops = vit_b16_flops_per_image()
    roofline_ips = V5E_PEAK_FLOPS / flops
    target = 0.95 * roofline_ips
    mfu = images_per_sec * flops / V5E_PEAK_FLOPS

    # training step throughput (fwd+bwd+Adam ≈ 3× fwd FLOPs)
    train_ips = train_mfu = None
    if on_tpu:
        from vision_transformers_tpu.training.trainer import (
            make_train_state, train_step_fn,
        )

        tb = 192  # measured sweep: 128/192/256 -> 64.1/67.1/66.7% MFU
        xt = x[:tb]
        labels = jnp.zeros((tb,), jnp.int32)
        w = jnp.ones((tb,), jnp.float32)
        state = make_train_state(model, jax.random.PRNGKey(0), xt[:1], lr=1e-3)
        rng = jax.random.PRNGKey(1)
        step = jax.jit(train_step_fn(model), donate_argnums=0)
        if train_opts is not None:
            step = step.lower(state, xt, labels, w, rng).compile(
                compiler_options=train_opts)
        state, l, _, _ = step(state, xt, labels, w, rng)
        float(l)
        t0 = time.perf_counter()
        for _ in range(10):
            state, l, _, _ = step(state, xt, labels, w, rng)
        float(l)
        train_ips = tb * 10 / (time.perf_counter() - t0)
        train_mfu = train_ips * 3 * flops / V5E_PEAK_FLOPS

    print(json.dumps({
        "metric": "vit_b16_224_bf16_infer",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / target, 4),
        "mfu": round(mfu, 4),
        "train_images_per_sec": None if train_ips is None else round(train_ips, 1),
        "train_mfu": None if train_mfu is None else round(train_mfu, 4),
        "batch": batch,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    # The tunnel to the chip occasionally wedges transiently; one retry
    # keeps a flaky moment from zeroing out a round's benchmark.
    try:
        main()
    except Exception:
        import traceback

        traceback.print_exc()
        time.sleep(20)
        main()
