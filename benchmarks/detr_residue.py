"""DETR per-phase DEVICE time via in-graph iteration (r4).

PARTIALLY SUPERSEDED (r5): the scan methodology stands (train_step_ms /
forward_ms are good), but the standalone encoder/decoder cells here run
S=(IMG//32)^2=256 while the model's dilated stride-16 C5 gives S=1024,
the FLOP model understates encoder/decoder work for the same reason, and
pixel_mask=ones means ALL-PADDING per Detr.__call__ (True=pad). The
authoritative train-step receipts are benchmarks/detr_train_residue.py.

detr_phase_r04.json showed a paradox: backbone-alone (23.95 ms) ~= full
forward (23.7 ms), yet standalone encoder/decoder measured 19.6/19.1 ms
each — the sum is 2.6x the whole. Queued-dispatch overhead is tiny for
plain jitted fns (swin stage-4 blocks time at 0.15 ms through the same
harness), so the standalone numbers are suspect some other way. This
bench removes the question entirely: every phase runs K times inside ONE
jit via lax.scan (output fed back as input, so iterations serialize),
and the reported time is (scan_time - dispatch_floor) / K.

Also ablates the encoder's attention backend (pallas flash vs jnp
reference at dh=32, S=256) and splits criterion vs matcher.

Run: python benchmarks/detr_residue.py  (writes detr_residue_r04.json)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12
B = int(os.environ.get("DETR_B", 8))
IMG = int(os.environ.get("DETR_IMG", 512))
K = int(os.environ.get("DETR_SCAN_K", 32))
D, NQ, NH, DFF, L = 256, 100, 8, 2048, 6
NUM_CLASSES = 91
S = (IMG // 32) ** 2


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed_scan(step, init, iters=3):
    """step: carry -> carry, executed K times inside one jit."""

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda cc, _: (step(cc), None), c,
                            None, length=K)[0]

    out = run(init)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(out)
    sync(out)
    return (time.perf_counter() - t0) / iters / K * 1e3


def main():
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.models.object_detection.criterion import (
        SetCriterion,
    )
    from vision_transformers_tpu.models.object_detection.matcher import (
        HungarianMatcher,
    )
    from vision_transformers_tpu.models.object_detection.transformer import (
        TransformerDecoder, TransformerEncoder,
    )
    import vision_transformers_tpu.ops.attention as A

    report = {"config": f"DETR-R50 {IMG}px batch {B} bf16, scan K={K}",
              "backend": jax.default_backend()}

    # dispatch floor: a trivial scan so the per-phase numbers can be read
    # as pure device time
    report["scan_dispatch_floor_ms"] = round(
        timed_scan(lambda c: c + 1.0, jnp.zeros((8, 128), jnp.float32)), 4)

    model = Detr(num_classes=NUM_CLASSES, num_queries=NQ, hidden_dim=D,
                 nheads=NH, num_encoder_layers=L, num_decoder_layers=L,
                 dim_feedforward=DFF, dropout=0.1, backbone_norm="group",
                 aux_loss=True, dtype=jnp.bfloat16)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(B, IMG, IMG, 3), jnp.float32)
    mask = jnp.ones((B, IMG, IMG), bool)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, imgs[:1], mask[:1])["params"]

    # --- full forward: imgs -> outputs; chain via a scalar tap ------------
    fwd = lambda p, x, m: model.apply({"params": p}, x, m)

    def fwd_step(x):
        out = fwd(params, x, mask)
        tap = jnp.sum(out["pred_logits"].astype(jnp.float32)) * 0.0
        return x + tap.astype(x.dtype)

    report["forward_ms"] = round(timed_scan(fwd_step, imgs), 2)

    # --- backbone + joiner -------------------------------------------------
    def joiner_step(x):
        feats = model.apply({"params": params}, x, mask,
                            method=lambda mod, a, b: mod.joiner(a, b))
        tap = jnp.sum(
            jax.tree_util.tree_leaves(feats)[0].astype(jnp.float32)) * 0.0
        return x + tap.astype(x.dtype)

    report["backbone_ms"] = round(timed_scan(joiner_step, imgs), 2)

    # --- encoder: output shape == input shape, direct chain ----------------
    enc = TransformerEncoder(d_model=D, nhead=NH, num_layers=L,
                             dim_feedforward=DFF, dropout=0.1,
                             dtype=jnp.bfloat16)
    src = jnp.asarray(np.random.RandomState(1).randn(B, S, D), jnp.bfloat16)
    pos = jnp.asarray(np.random.RandomState(2).randn(B, S, D), jnp.bfloat16)
    ep = params["transformer"]["encoder"]

    def enc_step(s):
        return enc.apply({"params": ep}, s, pos=pos)

    report["encoder_ms"] = round(timed_scan(enc_step, src), 3)

    # encoder with the jnp attention backend (flash-kernel ablation)
    orig_backend = A._use_pallas

    def enc_jnp_step(s):
        return enc.apply({"params": ep}, s, pos=pos)

    A._use_pallas = lambda: False
    try:
        report["encoder_jnp_attn_ms"] = round(timed_scan(enc_jnp_step, src),
                                              3)
    finally:
        A._use_pallas = orig_backend

    # --- decoder ------------------------------------------------------------
    dec = TransformerDecoder(d_model=D, nhead=NH, num_layers=L,
                             dim_feedforward=DFF, dropout=0.1,
                             return_intermediate=True, dtype=jnp.bfloat16)
    tgt = jnp.zeros((B, NQ, D), jnp.bfloat16)
    qpos = jnp.asarray(np.random.RandomState(3).randn(B, NQ, D),
                       jnp.bfloat16)
    dp = params["transformer"]["decoder"]

    def dec_step(t):
        out = dec.apply({"params": dp}, t, src, pos=pos, query_pos=qpos)
        return out[-1].astype(t.dtype)  # last intermediate, same shape

    report["decoder_ms"] = round(timed_scan(dec_step, tgt), 3)

    # --- criterion total vs matcher alone ----------------------------------
    crit = SetCriterion(num_classes=NUM_CLASSES)
    max_t = 16
    rng = np.random.RandomState(4)
    out_like = jax.jit(fwd)(params, imgs, mask)
    sync(out_like)
    labels = jnp.asarray(rng.randint(0, NUM_CLASSES, (B, max_t)))
    cxy = rng.uniform(0.2, 0.8, (B, max_t, 2))
    wh = rng.uniform(0.05, 0.3, (B, max_t, 2))
    boxes = jnp.asarray(np.concatenate([cxy, wh], -1), jnp.float32)
    valid = jnp.asarray(rng.rand(B, max_t) < 0.5)

    def crit_step(bx):
        loss = crit.total_loss(crit(out_like, labels, bx, valid))
        return bx * (1.0 + 0.0 * loss)

    report["criterion_total_ms"] = round(timed_scan(crit_step, boxes), 3)

    # matcher alone on the real shapes: cost matrix (B, NQ, max_t)
    matcher = HungarianMatcher()
    ml_outputs = {"pred_logits": out_like["pred_logits"],
                  "pred_boxes": out_like["pred_boxes"]}

    def match_step(bx):
        idx = matcher(ml_outputs, labels, bx, valid)
        tap = jnp.sum(idx.astype(jnp.float32)) * 0.0
        return bx * (1.0 + tap)

    report["matcher_ms"] = round(timed_scan(match_step, boxes), 3)

    # --- train step ----------------------------------------------------------
    import optax
    from flax.training import train_state as ts
    state = ts.TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(1e-4)))
    r = jax.random.PRNGKey(5)

    def train_step(st):
        def loss_fn(p):
            out = model.apply({"params": p}, imgs, mask,
                              deterministic=False, rngs={"dropout": r})
            return crit.total_loss(crit(out, labels, boxes, valid))

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return st.apply_gradients(grads=grads)

    report["train_step_ms"] = round(timed_scan(train_step, state,
                                               iters=1), 2)

    fl_img = 2 * (4.09e9 * (IMG / 224) ** 2
                  + L * (4 * S * D * D + 2 * S * S * D + 2 * S * D * DFF)
                  + L * (6 * NQ * D * D + 2 * NQ * NQ * D + 2 * S * D * D
                         + 2 * NQ * S * D + 2 * NQ * D * DFF))
    report["img_per_s_train"] = round(B / report["train_step_ms"] * 1e3, 1)
    report["img_per_s_infer"] = round(B / report["forward_ms"] * 1e3, 1)
    report["train_mfu"] = round(
        3 * fl_img * B / (report["train_step_ms"] / 1e3) / PEAK, 4)
    report["infer_mfu"] = round(
        fl_img * B / (report["forward_ms"] / 1e3) / PEAK, 4)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "detr_residue_r04.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
