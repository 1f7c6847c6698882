"""DETR-R50 512px per-phase timing + FLOP accounting (VERDICT r2 #6).

RETIRED (r5): this methodology times standalone phases through the tunnel
(per-call dispatch ~1 ms dominates small phases; the committed artifact's
phase_sum_vs_forward=2.642 is self-refuting), its shape model is wrong
(S=(IMG//32)^2, but the model taps the dilated stride-16 C5 so the encoder
runs at S=1024), and pixel_mask=ones means all-padding per Detr.__call__.
Kept only as history; use benchmarks/detr_train_residue.py instead.

Gives the 68 img/s headline a denominator: analytic FLOPs per phase
(backbone / encoder / decoder / heads / criterion+matcher) and measured
per-phase times, reconciled against the full forward and train step.

Run: python benchmarks/detr_phase.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12
# Smoke knobs (CPU dry-run before burning TPU-window time on a crash).
B = int(os.environ.get("DETR_PHASE_B", 8))
IMG = int(os.environ.get("DETR_PHASE_IMG", 512))
ITERS = int(os.environ.get("DETR_PHASE_ITERS", 10))
D, NQ, NH, DFF, L = 256, 100, 8, 2048, 6
NUM_CLASSES = 91
S = (IMG // 32) ** 2  # backbone stride 32 -> 16x16 = 256 tokens


def timed(fn, *args, iters=ITERS):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def flops():
    """mult+add FLOPs per image (MACs x2), analytic."""
    r50_224 = 4.09e9                       # standard ResNet-50 MACs @224
    backbone = r50_224 * (IMG / 224) ** 2
    enc_layer = 4 * S * D * D + 2 * S * S * D + 2 * S * D * DFF
    dec_layer = (
        4 * NQ * D * D + 2 * NQ * NQ * D            # self-attention
        + 2 * NQ * D * D + 2 * S * D * D            # cross q + kv proj
        + 2 * NQ * S * D                            # cross scores + PV
        + 2 * NQ * D * DFF                          # ffn
    )
    heads = NQ * D * (NUM_CLASSES + 1) + NQ * (2 * D * D + D * 4)
    return {k: 2 * v for k, v in {
        "backbone": backbone, "encoder": L * enc_layer,
        "decoder": L * dec_layer, "heads": heads,
    }.items()}


def main():
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.models.object_detection.criterion import (
        SetCriterion,
    )
    from vision_transformers_tpu.models.object_detection.transformer import (
        TransformerDecoder, TransformerEncoder,
    )

    model = Detr(num_classes=NUM_CLASSES, num_queries=NQ, hidden_dim=D,
                 nheads=NH, num_encoder_layers=L, num_decoder_layers=L,
                 dim_feedforward=DFF, dropout=0.1, backbone_norm="group",
                 aux_loss=True, dtype=jnp.bfloat16)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(B, IMG, IMG, 3), jnp.float32)
    mask = jnp.ones((B, IMG, IMG), bool)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, imgs[:1], mask[:1])["params"]

    fl = flops()
    report = {"config": f"DETR-R50 {IMG}px batch {B} bf16, "
                        f"{NUM_CLASSES} classes, {NQ} queries",
              "gflop_per_img": {k: round(v / 1e9, 2) for k, v in fl.items()}}

    # full forward
    fwd = jax.jit(lambda p, x, m: model.apply({"params": p}, x, m))
    ms_fwd = timed(fwd, params, imgs, mask)

    # backbone + position encoding (joiner)
    joiner = jax.jit(lambda p, x, m: model.apply(
        {"params": p}, x, m, method=lambda mod, a, b: mod.joiner(a, b)))
    ms_backbone = timed(joiner, params, imgs, mask)

    # encoder / decoder standalone on the real intermediate shapes
    enc = TransformerEncoder(d_model=D, nhead=NH, num_layers=L,
                             dim_feedforward=DFF, dropout=0.1,
                             dtype=jnp.bfloat16)
    src = jnp.asarray(np.random.RandomState(1).randn(B, S, D), jnp.bfloat16)
    pos = jnp.asarray(np.random.RandomState(2).randn(B, S, D), jnp.bfloat16)
    enc_fn = jax.jit(lambda p, s, ps: enc.apply({"params": p}, s, pos=ps))
    ms_encoder = timed(enc_fn, params["transformer"]["encoder"], src, pos)

    dec = TransformerDecoder(d_model=D, nhead=NH, num_layers=L,
                             dim_feedforward=DFF, dropout=0.1,
                             return_intermediate=True, dtype=jnp.bfloat16)
    tgt = jnp.zeros((B, NQ, D), jnp.bfloat16)
    qpos = jnp.asarray(np.random.RandomState(3).randn(B, NQ, D), jnp.bfloat16)
    dec_fn = jax.jit(lambda p, t, m, ps, qp: dec.apply(
        {"params": p}, t, m, pos=ps, query_pos=qp))
    ms_decoder = timed(dec_fn, params["transformer"]["decoder"],
                       tgt, src, pos, qpos)

    # criterion + auction matcher on representative outputs
    crit = SetCriterion(num_classes=NUM_CLASSES)
    max_t = 16
    rng = np.random.RandomState(4)
    out_like = fwd(params, imgs, mask)
    labels = jnp.asarray(rng.randint(0, NUM_CLASSES, (B, max_t)))
    cxy = rng.uniform(0.2, 0.8, (B, max_t, 2))
    wh = rng.uniform(0.05, 0.3, (B, max_t, 2))
    boxes = jnp.asarray(np.concatenate([cxy, wh], -1), jnp.float32)
    valid = jnp.asarray(rng.rand(B, max_t) < 0.5)
    crit_fn = jax.jit(lambda o, l, bx, v: crit.total_loss(crit(o, l, bx, v)))
    ms_criterion = timed(crit_fn, out_like, labels, boxes, valid)

    # train step (fwd + criterion + bwd + adamw)
    import optax
    from flax.training import train_state as ts
    state = ts.TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(1e-4)))

    @jax.jit
    def train_step(st, x, m, l, bx, v, r):
        def loss_fn(p):
            out = model.apply({"params": p}, x, m, deterministic=False,
                              rngs={"dropout": r})
            return crit.total_loss(crit(out, l, bx, v))

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return st.apply_gradients(grads=grads), loss

    r = jax.random.PRNGKey(5)
    ms_step = timed(lambda st: train_step(st, imgs, mask, labels, boxes,
                                          valid, r)[1], state)

    phases = {
        "backbone+pos": ms_backbone, "encoder": ms_encoder,
        "decoder": ms_decoder, "criterion+matcher": ms_criterion,
    }
    report["measured_ms"] = {k: round(v, 2) for k, v in phases.items()}
    report["measured_ms"]["forward_total"] = round(ms_fwd, 2)
    report["measured_ms"]["train_step"] = round(ms_step, 2)
    report["phase_sum_vs_forward"] = round(
        (ms_backbone + ms_encoder + ms_decoder) / ms_fwd, 3)
    report["img_per_s_train"] = round(B / ms_step * 1e3, 1)
    report["img_per_s_infer"] = round(B / ms_fwd * 1e3, 1)
    total_fl = sum(fl.values())
    report["train_mfu"] = round(
        3 * total_fl * B / (ms_step / 1e3) / PEAK, 4)
    report["infer_mfu"] = round(
        total_fl * B / (ms_fwd / 1e3) / PEAK, 4)
    for k in phases:
        if k in ("criterion+matcher",):
            continue
        key = {"backbone+pos": "backbone"}.get(k, k)
        report.setdefault("phase_mfu", {})[k] = round(
            fl[key] * B / (phases[k] / 1e3) / PEAK, 4)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "detr_phase_r04.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
