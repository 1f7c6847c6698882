"""Hierarchical-model throughput + per-stage MFU accounting (VERDICT r2 #2).

Covers the four hierarchical families: Swin-T/224 (window 7),
SwinV2-T/224 (window 8), PVT-Tiny/224, Twins-SVT-S/224 — full-model bf16
inference at batch 128 on the real chip, an analytic per-stage FLOP
model for each family, and per-stage times via truncated-model
differencing (stage k time = T(stages 1..k) − T(stages 1..k−1); stage 1
includes the patch embed; merges/patch-embeds between stages are charged
to the later stage).

Writes benchmarks/hier_bench_r04.json.
Run: python benchmarks/hier_bench.py [--models swint_224,...] [--stages]
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


# --- analytic per-stage MACs per image -----------------------------------

def swin_stage_macs(image=224, patch=4, embed=96, depths=(2, 2, 6, 2),
                    window=7, mlp_ratio=4.0):
    """Per-stage MACs for Swin; stage 1 includes the patch-embed conv,
    stages 2+ include the preceding patch merge."""
    t = (image // patch) ** 2
    n = window * window
    stages = []
    for i, depth in enumerate(depths):
        c = embed * 2 ** i
        ti = t // 4 ** i
        macs = 0
        if i == 0:
            macs += t * (patch * patch * 3) * embed
        else:
            macs += ti * (4 * c // 2) * c  # merge: (t/4, 4·c_prev)→(·, 2·c_prev)
        per_block = (
            3 * ti * c * c                       # qkv
            + 2 * ti * n * c                     # scores + PV
            + ti * c * c                         # out projection
            + int(2 * mlp_ratio) * ti * c * c    # fc1 + fc2
        )
        stages.append(macs + depth * per_block)
    return stages


def pvt_stage_macs(image=224, patch=4, embed=(64, 128, 320, 512),
                   heads=(1, 2, 5, 8), mlp=(8, 8, 4, 4),
                   depths=(2, 2, 2, 2), sr=(8, 4, 2, 1)):
    """Per-stage MACs for PVT (SRA attention; CLS token ignored, <0.5%)."""
    stages = []
    c_prev, t = 3, (image // patch) ** 2
    for i, depth in enumerate(depths):
        c = embed[i]
        k = patch if i == 0 else 2
        macs = t * (k * k * c_prev) * c  # patch embed i
        r = sr[i]
        tk = t // (r * r)
        per_block = (
            t * c * c                            # q
            + (t * c * c if r > 1 else 0)        # sr reduction conv
            + 2 * tk * c * c                     # kv
            + 2 * t * tk * c                     # scores + PV
            + t * c * c                          # out projection
            + 2 * int(mlp[i]) * t * c * c        # fc1 + fc2
        )
        stages.append(macs + depth * per_block)
        c_prev, t = c, t // 4
    return stages


def twins_stage_macs(image=224, patch=4, embed=(64, 128, 256, 512),
                     heads=(2, 4, 8, 16), mlp=(4, 4, 4, 4),
                     depths=(2, 2, 10, 4), sr=(8, 4, 2, 1),
                     wss=(7, 7, 7, 7)):
    """Per-stage MACs for Twins-SVT: blocks alternate LSA (even j,
    window wss) and GSA (odd j, SRA with sr)."""
    stages = []
    c_prev, t = 3, (image // patch) ** 2
    for i, depth in enumerate(depths):
        c = embed[i]
        k = patch if i == 0 else 2
        macs = t * (k * k * c_prev) * c  # patch embed i
        macs += t * 9 * c                # PEG depthwise 3x3 (after block 0)
        r, n = sr[i], wss[i] * wss[i]
        tk = t // (r * r)
        lsa = (3 * t * c * c + 2 * t * n * c + t * c * c
               + 2 * int(mlp[i]) * t * c * c)
        gsa = (t * c * c + (t * c * c if r > 1 else 0) + 2 * tk * c * c
               + 2 * t * tk * c + t * c * c + 2 * int(mlp[i]) * t * c * c)
        n_lsa = (depth + 1) // 2
        stages.append(macs + n_lsa * lsa + (depth - n_lsa) * gsa)
        c_prev, t = c, t // 4
    return stages


def vit_stage_macs(image=224, patch=16, layers=12, d=768, mlp=3072):
    """ViT as a single 'stage' (for the --train columns, VERDICT r4 #6)."""
    t = (image // patch) ** 2 + 1
    per_block = 4 * t * d * d + 2 * t * t * d + 2 * t * d * mlp
    return [t * (patch * patch * 3) * d + layers * per_block]


# --- model builders (full + truncated to the first k stages) -------------

def build(name, k=None):
    """Model truncated to its first k stages (k=None: full)."""
    from vision_transformers_tpu.models.image_classification import (
        PVT, SwinTransformer, SwinTransformerV2, TwinSVT, ViT,
    )
    from vision_transformers_tpu.utils.args import get_args

    args = get_args(f"{name}_imagenet")
    if name.startswith("vit"):
        return ViT(**args, dtype=jnp.bfloat16), args
    if name.startswith("swin"):
        cls = SwinTransformerV2 if "v2" in name else SwinTransformer
        if k is not None:
            args["depths"] = args["depths"][:k]
            args["num_heads"] = args["num_heads"][:k]
        return cls(**args, dtype=jnp.bfloat16), args
    if name.startswith("pvt"):
        if k is not None:
            args["num_stages"] = k
        return PVT(**args, dtype=jnp.bfloat16), args
    if name.startswith("twins"):
        if k is not None:
            for key in ("embed_dims", "num_heads", "mlp_ratios", "depths",
                        "sr_ratios", "wss"):
                args[key] = args[key][:k]
        return TwinSVT(**args, dtype=jnp.bfloat16), args
    raise ValueError(name)


def stage_macs_for(name, args):
    if name.startswith("vit"):
        return vit_stage_macs(
            image=args["image_size"], patch=args["patch_size"],
            layers=args["num_layers"], d=args["hidden_dim"],
            mlp=args["mlp_dim"])
    if name.startswith("swin"):
        return swin_stage_macs(
            image=args["image_size"], patch=args["patch_size"][0],
            embed=args["embed_dim"], depths=tuple(args["depths"]),
            window=args["window_size"][0], mlp_ratio=args["mlp_ratio"])
    if name.startswith("pvt"):
        return pvt_stage_macs(
            image=args["image_size"], patch=args["patch_size"],
            embed=args["embed_dims"], heads=args["num_heads"],
            mlp=args["mlp_ratios"], depths=args["depths"],
            sr=args["sr_ratios"])
    return twins_stage_macs(
        image=args["img_size"], patch=args["patch_size"],
        embed=args["embed_dims"], heads=args["num_heads"],
        mlp=args["mlp_ratios"], depths=args["depths"],
        sr=args["sr_ratios"], wss=args["wss"])


def time_model(model, batch, image, iters=20):
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, image, image, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    if jax.default_backend() == "tpu":
        opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
        fwd = fwd.lower(params, x).compile(compiler_options=opts)
    out = fwd(params, x)
    float(jnp.sum(out.astype(jnp.float32)))  # sync (block_until_ready no-op)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def time_train(model, batch, image, iters=10):
    """Full production train step (fwd+bwd+AdamW via train_step_fn) ms."""
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
        # train step best at 64 MB scoped VMEM (bench.py measured sweep)
        step = step.lower(state, x, labels, w, rng).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    state, l, _, _ = step(state, x, labels, w, rng)
    float(l)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, l, _, _ = step(state, x, labels, w, rng)
    float(l)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_model(name, batch, per_stage=False, iters=20, train=False,
                train_batch=None):
    model, args = build(name)
    image = args.get("image_size") or args.get("img_size")
    ms = time_model(model, batch, image, iters)
    stages = stage_macs_for(name, args)
    flops = 2 * sum(stages)
    row = {
        "model": name, "batch": batch, "ms": round(ms, 1),
        "img_per_s": round(batch / ms * 1e3, 1),
        "gflop_per_img": round(flops / 1e9, 2),
        "gflop_per_stage": [round(2 * m / 1e9, 2) for m in stages],
        "mfu": round(batch / ms * 1e3 * flops / V5E_PEAK_FLOPS, 4),
    }
    if per_stage:
        n_stages = len(stages)
        cum = []
        for k in range(1, n_stages):  # k = n_stages is the full model
            mk, _ = build(name, k)
            cum.append(time_model(mk, batch, image, iters))
        cum.append(ms)
        stage_ms = [cum[0]] + [cum[i] - cum[i - 1] for i in range(1, n_stages)]
        row["stage_ms"] = [round(v, 2) for v in stage_ms]
        row["stage_mfu"] = [
            round(2 * m * batch / (v / 1e3) / V5E_PEAK_FLOPS, 4)
            if v > 0 else None
            for m, v in zip(stages, stage_ms)]
    if train:
        tb = train_batch or batch
        tms = time_train(model, tb, image, iters=max(iters // 2, 5))
        row["train_batch"] = tb
        row["train_ms"] = round(tms, 1)
        row["train_img_per_s"] = round(tb / tms * 1e3, 1)
        # train ≈ 3× fwd FLOPs (fwd + 2× bwd), the bench.py convention
        row["train_mfu"] = round(
            tb / tms * 1e3 * 3 * flops / V5E_PEAK_FLOPS, 4)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models",
        default="swint_224,swinv2t_224,pvt_tiny224,twins_svts224")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--stages", action="store_true",
                    help="per-stage timing via truncated models")
    ap.add_argument("--train", action="store_true",
                    help="also time the full train step (fwd+bwd+AdamW)")
    ap.add_argument("--train-batch", type=int, default=None,
                    help="train-step batch (default: --batch)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.environ.get("HIER_OUT", "hier_bench_r04.json"))
    rows = []
    for name in args.models.split(","):
        row = bench_model(name.strip(), args.batch, per_stage=args.stages,
                          iters=args.iters, train=args.train,
                          train_batch=args.train_batch)
        rows.append(row)
        print(json.dumps(row), flush=True)
        # atomic write (ADVICE r4 #3): a killed run must never leave a
        # half-rewritten receipt that a done-check could accept
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rows, f, indent=1)
        os.replace(tmp, out_path)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
