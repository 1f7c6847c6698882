"""Per-op receipts for the ViT-B/16 train step's BACKWARD (VERDICT r4 #9).

The forward got a per-op ceiling proof (PERFORMANCE.md r3 table); training
sits at ~69.7% MFU with one prose line ("backward is 2.11x forward").
This bench differences the backward per stage, vit_residue.py
methodology (own jit per variant, queued iters, one host sync):

  for each stage f (packed attention, MLP, LN, patch embed, head):
    fwd_ms       = time f(x)
    grad_ms      = time jax.grad(sum∘f)(x[, w])   (fwd + full bwd)
    bwd_ms       = grad_ms - fwd_ms
    vs roofline  = bwd FLOPs (2x fwd for GEMMs: dgrad + wgrad) / peak

plus the whole-step split: full train step vs grads-only vs fwd-only on
the production trainer — so "2.11x" decomposes into stage terms instead
of a single unexplained residue.

Run on the chip: python benchmarks/vit_train_residue.py
(writes benchmarks/vit_train_residue_r05.json)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("VIT_B", 256))
S, D, MLP, H = 197, 768, 3072, 12
DT = jnp.bfloat16
PEAK = 197e12
HBM_BW = 819e9

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "vit_train_residue_r05.json")
REPORT = {"config": f"ViT-B/16 224 bf16 batch {B}",
          "backend": jax.default_backend(), "stages": {}}


def _write():
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(REPORT, f, indent=1)
    os.replace(tmp, OUT)


def timeit(fn, *args, iters=20, scoped_vmem=False):
    f = jax.jit(fn)
    if scoped_vmem and jax.default_backend() == "tpu":
        f = f.lower(*args).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    out = f(*args)
    jax.tree.map(lambda a: np.asarray(jax.device_get(a.ravel()[0])), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.tree.map(lambda a: np.asarray(jax.device_get(a.ravel()[0])), out)
    return (time.perf_counter() - t0) / iters * 1e3


def stage(name, fwd_fn, args, grad_argnums, fwd_flops, bwd_flops,
          bwd_bytes=0.0):
    fwd_ms = timeit(fwd_fn, *args)

    def loss(*a):
        return jnp.sum(fwd_fn(*a).astype(jnp.float32))

    grad_ms = timeit(jax.grad(loss, argnums=grad_argnums), *args)
    bwd_ms = grad_ms - fwd_ms
    bound_ms = max(bwd_flops / PEAK, bwd_bytes / HBM_BW) * 1e3
    REPORT["stages"][name] = {
        "fwd_ms": round(fwd_ms, 3),
        "fwd+bwd_ms": round(grad_ms, 3),
        "bwd_ms": round(bwd_ms, 3),
        "bwd_over_fwd": round(bwd_ms / fwd_ms, 2) if fwd_ms > 0 else None,
        "bwd_roofline_ms": round(bound_ms, 3),
        "bwd_mfu": round(bwd_flops / PEAK * 1e3 / bwd_ms, 4)
        if bwd_ms > 0 else None,
    }
    print(name, REPORT["stages"][name], flush=True)
    _write()


def main():
    from vision_transformers_tpu.ops.flash_attention import (
        packed_flash_attention,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, D) * 0.02, DT)
    qkv = jnp.asarray(rng.randn(B, S, 3 * D) * 0.02, DT)
    wqkv = jnp.asarray(rng.randn(D, 3 * D) * 0.02, DT)
    wout = jnp.asarray(rng.randn(D, D) * 0.02, DT)
    w1 = jnp.asarray(rng.randn(D, MLP) * 0.02, DT)
    w2 = jnp.asarray(rng.randn(MLP, D) * 0.02, DT)
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)

    n = B * S
    # GEMM bwd = dgrad + wgrad = 2x fwd FLOPs
    stage("qkv_proj", lambda x, w: x @ w, (x, wqkv), (0, 1),
          2 * n * D * 3 * D, 4 * n * D * 3 * D)
    stage("attn_packed", lambda q: packed_flash_attention(q, H), (qkv,),
          (0,),
          4 * B * H * S * S * (D // H),
          # bwd recompute (fwd again) + 6 matmul-halves ~ 2.5x fwd
          10 * B * H * S * S * (D // H))
    stage("out_proj", lambda x, w: x @ w, (x, wout), (0, 1),
          2 * n * D * D, 4 * n * D * D)
    stage("mlp", lambda x, w1, w2: jax.nn.gelu(x @ w1) @ w2,
          (x, w1, w2), (0, 1, 2),
          4 * n * D * MLP, 8 * n * D * MLP)

    def ln(x, g, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        return (((xf - mu) * jax.lax.rsqrt(var + 1e-6)) * g + b).astype(x.dtype)

    stage("layernorm", ln, (x, gamma, beta), (0, 1, 2),
          0, 0, bwd_bytes=6 * n * D * 2)

    img = jnp.asarray(rng.randn(B, 224, 224, 3), DT)
    wpe = jnp.asarray(rng.randn(16 * 16 * 3, D) * 0.02, DT)

    def patch_embed(img, w):
        p = jax.lax.conv_general_dilated_patches(
            img, (16, 16), (16, 16), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return p.reshape(B, -1, 16 * 16 * 3) @ w

    # wgrad only: images are leaves in the real train step, so dL/d(img)
    # (a 224x224x3 scatter through the patch extraction) is never computed
    # there — differentiating argnum 0 here measured a phantom 215 ms op
    stage("patch_embed", patch_embed, (img, wpe), (1,),
          2 * B * 196 * 768 * D, 2 * B * 196 * 768 * D)

    # ---- whole-step split on the production trainer -----------------
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.training.trainer import (
        make_train_state, train_step_fn,
    )
    from vision_transformers_tpu.utils.args import get_args

    model = ViT(**get_args("vitb16_224_imagenet"), dtype=DT)
    imgs = jnp.asarray(rng.randn(B, 224, 224, 3), jnp.float32)
    labels = jnp.zeros((B,), jnp.int32)
    wts = jnp.ones((B,), jnp.float32)
    state = make_train_state(model, jax.random.PRNGKey(0), imgs[:1], lr=1e-3)
    rkey = jax.random.PRNGKey(1)

    step = jax.jit(train_step_fn(model), donate_argnums=0)
    if jax.default_backend() == "tpu":
        step = step.lower(state, imgs, labels, wts, rkey).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    state, l, _, _ = step(state, imgs, labels, wts, rkey)
    float(l)
    t0 = time.perf_counter()
    for _ in range(10):
        state, l, _, _ = step(state, imgs, labels, wts, rkey)
    float(l)
    full_ms = (time.perf_counter() - t0) / 10 * 1e3

    def fwd_only(p, x):
        logits = model.apply({"params": p}, x, deterministic=False,
                             rngs={"dropout": rkey})
        lab1 = jax.nn.one_hot(labels, logits.shape[-1])
        return jnp.mean(jnp.sum(
            -lab1 * jax.nn.log_softmax(logits.astype(jnp.float32)), -1))

    fwd_ms = timeit(fwd_only, state.params, imgs, iters=10, scoped_vmem=True)

    def grads_only(p, x):
        g = jax.grad(fwd_only)(p, x)
        # reduce over EVERY leaf: returning a single leaf lets XLA
        # dead-code-eliminate the other wgrads (the r05a artifact's
        # implied bwd MFU was >100%, which is how we caught it)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))

    gr_ms = timeit(grads_only, state.params, imgs, iters=10, scoped_vmem=True)

    fl = 3 * (2 * 196 * 768 * D + 12 * (8 * S * D * D + 4 * S * S * D
                                        + 4 * S * D * MLP)) * B
    REPORT["train_step"] = {
        "grads_all_leaves": True,
        "full_ms": round(full_ms, 2),
        "fwd_loss_ms": round(fwd_ms, 2),
        "fwd+bwd_ms": round(gr_ms, 2),
        "backward_ms": round(gr_ms - fwd_ms, 2),
        "optimizer_ms": round(full_ms - gr_ms, 2),
        "bwd_over_fwd": round((gr_ms - fwd_ms) / fwd_ms, 2),
        "img_per_s": round(B / full_ms * 1e3, 1),
        "train_mfu": round(fl / PEAK / (full_ms / 1e3), 4),
    }
    print(REPORT["train_step"], flush=True)
    _write()
    print("wrote", OUT)


if __name__ == "__main__":
    main()
