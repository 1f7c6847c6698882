"""DETR train-step receipts: split the 99.7 ms step by in-graph differencing.

VERDICT r4 #1: the DETR train step (detr_residue_r04.json) is 99.73 ms at
batch 8 / 512px with a 13.3 ms forward — the ~86 ms backward+update is
6.5x the forward against a 2x FLOP ideal, and nothing explains it. This
bench produces the per-term table with the scan methodology (every variant
runs K times inside ONE jit; time = scan/K), differencing the FULL train
step rather than timing standalone modules (the r4 mistake: standalone
encoder cells ran S=256 while the model's dilated stride-16 C5 gives
S=1024, and pixel_mask=ones meant all-padding).

Terms (each is full train step minus one suspect):
  full                 the production step: bf16, dropout 0.1, aux losses,
                       auction matcher, adamw+clip — deterministic=False
  no_dropout           deterministic=True in the loss fn. Training-mode
                       dropout forces attention off the Pallas kernel onto
                       the jnp path, materializing (B,H,S,S) scores at
                       S=1024 in all 6 encoder layers — both forward AND
                       as backward residuals (~268 MB fp32 per layer each
                       way). Suspect #1.
  frozen_backbone      stop_gradient on the joiner output: removes the
                       ResNet conv dgrads/wgrads (suspect #2) but keeps
                       the backbone forward.
  no_aux               main-layer criterion only (1 matcher instead of 6).
  fixed_match          matcher replaced by a constant assignment: removes
                       the auction while_loop from the (re)computed loss.
  grads_only           loss+grads without clip/adamw: the optimizer term.
  fwd_train_mode       forward+loss only (train mode): the backward is
                       full − fwd_train_mode − (optimizer term).

Reference intent: /root/reference/models/object_detection/detr.py:108-134,
transformer.py:26-247 (the reference never trained DETR — these are the
numbers its completed TPU-native counterpart must explain).

Run: python benchmarks/detr_train_residue.py  (writes
benchmarks/detr_train_residue_r05.json; DETR_B/DETR_IMG/DETR_SCAN_K env
knobs for CPU smoke runs)
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
B = int(os.environ.get("DETR_B", 8))
IMG = int(os.environ.get("DETR_IMG", 512))
K = int(os.environ.get("DETR_SCAN_K", 16))
ITERS = int(os.environ.get("DETR_ITERS", 3))
D, NQ, NH, DFF, L = 256, 100, 8, 2048, 6
NUM_CLASSES = 91
S = (IMG // 16) ** 2  # dilated stride-16 C5 (detr.py __call__: features[-1])


def flops_per_img():
    """Analytic fwd FLOPs (mult+add) with the CORRECT S for the dilated C5.
    ResNet-50 @224 ~ 4.09 GMAC; dilation doubles layer4's spatial work
    (stride 16 instead of 32 on ~1.49 GMAC of layer4) -> ~5.58 GMAC @224."""
    backbone = 2 * 5.58e9 * (IMG / 224) ** 2
    enc = L * (8 * S * D * D + 4 * S * S * D + 4 * S * D * DFF)
    dec = L * (12 * NQ * D * D + 4 * NQ * NQ * D + 4 * S * D * D
               + 4 * NQ * S * D + 4 * NQ * D * DFF)
    return backbone + enc + dec


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed_scan(step, init, iters=ITERS):
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
    import optax
    from flax.training import train_state as ts

    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.models.object_detection.criterion import (
        SetCriterion,
    )

    report = {"config": f"DETR-R50 {IMG}px batch {B} bf16 S={S}, scan K={K}",
              "backend": jax.default_backend()}

    model = Detr(num_classes=NUM_CLASSES, num_queries=NQ, hidden_dim=D,
                 nheads=NH, num_encoder_layers=L, num_decoder_layers=L,
                 dim_feedforward=DFF, dropout=0.1, backbone_norm="group",
                 aux_loss=True, dtype=jnp.bfloat16)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(B, IMG, IMG, 3), jnp.float32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, imgs[:1])["params"]
    crit = SetCriterion(num_classes=NUM_CLASSES)

    max_t = 16
    rng = np.random.RandomState(4)
    labels = jnp.asarray(rng.randint(0, NUM_CLASSES, (B, max_t)))
    cxy = rng.uniform(0.2, 0.8, (B, max_t, 2))
    wh = rng.uniform(0.05, 0.3, (B, max_t, 2))
    boxes = jnp.asarray(np.concatenate([cxy, wh], -1), jnp.float32)
    valid = jnp.asarray(rng.rand(B, max_t) < 0.5)
    r = jax.random.PRNGKey(5)
    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(1e-4))
    state0 = ts.TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    class FixedMatcher:
        """Constant assignment: target t -> query t (bypasses the auction)."""

        def __call__(self, outputs, lb, bx, vd):
            t = lb.shape[1]
            return jnp.where(vd, jnp.arange(t, dtype=jnp.int32)[None, :], -1)

    def make_loss(*, deterministic, aux, fixed_match, frozen_backbone):
        c = crit
        if fixed_match:
            import dataclasses
            c = dataclasses.replace(crit, matcher=FixedMatcher())

        def loss_fn(p):
            if frozen_backbone:
                # stop_gradient on the joiner output only: forward kept,
                # conv dgrads/wgrads removed
                feats, pos = model.apply(
                    {"params": p}, imgs, None,
                    method=lambda mod, a, b: mod.joiner(a, b))
                feats = jax.lax.stop_gradient(feats)
                pos = jax.lax.stop_gradient(pos)
                src, m = feats[-1]
                kw = ({} if deterministic
                      else {"rngs": {"dropout": r}})
                hs, _ = model.apply(
                    {"params": p}, src, m, pos[-1],
                    deterministic=deterministic,
                    method=lambda mod, s, mm, pp, **k: mod.transformer(
                        mod.input_proj(s), mm, mod.query_embed, pp, **k),
                    **kw)
                logits = model.apply({"params": p}, hs,
                                     method=lambda mod, h: mod.class_embed(h))
                bxs = jax.nn.sigmoid(model.apply(
                    {"params": p}, hs,
                    method=lambda mod, h: mod.bbox_embed(h)))
                out = {"pred_logits": logits[-1], "pred_boxes": bxs[-1]}
                if aux:
                    out["aux_outputs"] = [
                        {"pred_logits": logits[i], "pred_boxes": bxs[i]}
                        for i in range(logits.shape[0] - 1)]
            else:
                kw = ({"deterministic": True} if deterministic
                      else {"deterministic": False, "rngs": {"dropout": r}})
                out = model.apply({"params": p}, imgs, None, **kw)
            if not aux:
                out = {k: v for k, v in out.items() if k != "aux_outputs"}
            return c.total_loss(c(out, labels, boxes, valid))

        return loss_fn

    def train_variant(name, *, deterministic=False, aux=True,
                      fixed_match=False, frozen_backbone=False,
                      update=True):
        loss_fn = make_loss(deterministic=deterministic, aux=aux,
                            fixed_match=fixed_match,
                            frozen_backbone=frozen_backbone)

        if update:
            def step(st):
                _, grads = jax.value_and_grad(loss_fn)(st.params)
                return st.apply_gradients(grads=grads)

            ms = timed_scan(step, state0)
        else:
            def step(p):
                _, grads = jax.value_and_grad(loss_fn)(p)
                # chain params <- params + 0*grads so iterations serialize
                return jax.tree_util.tree_map(
                    lambda a, g: a + 0.0 * g.astype(a.dtype), p, grads)

            ms = timed_scan(step, params)
        report[name + "_ms"] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)
        _write(report)
        return ms

    def _write(rep):
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            os.environ.get("DETR_RESIDUE_OUT", "detr_train_residue_r05.json"))
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rep, f, indent=1)
        os.replace(tmp, out)

    # forward+loss only, train mode (the baseline the backward sits on)
    def fwd_step(x):
        loss_fn = make_loss(deterministic=False, aux=True, fixed_match=False,
                            frozen_backbone=False)
        tap = loss_fn(params) * 0.0
        return x + tap.astype(x.dtype)

    report["fwd_train_mode_ms"] = round(timed_scan(fwd_step, imgs), 2)
    print("fwd_train_mode:", report["fwd_train_mode_ms"], flush=True)
    _write(report)

    def fwd_eval_step(x):
        loss_fn = make_loss(deterministic=True, aux=True, fixed_match=False,
                            frozen_backbone=False)
        tap = loss_fn(params) * 0.0
        return x + tap.astype(x.dtype)

    report["fwd_eval_mode_ms"] = round(timed_scan(fwd_eval_step, imgs), 2)
    print("fwd_eval_mode:", report["fwd_eval_mode_ms"], flush=True)
    _write(report)

    full = train_variant("full")
    nodrop = train_variant("no_dropout", deterministic=True)
    frozen = train_variant("frozen_backbone", frozen_backbone=True)
    train_variant("no_aux", aux=False)
    train_variant("fixed_match", fixed_match=True)
    grads = train_variant("grads_only", update=False)
    # combined: both suspects removed at once (how far the floor is)
    train_variant("no_dropout_frozen_backbone", deterministic=True,
                  frozen_backbone=True)

    fl = flops_per_img()
    report["terms"] = {
        "dropout_attention_path_ms": round(full - nodrop, 2),
        "backbone_backward_ms": round(full - frozen, 2),
        "optimizer_update_ms": round(full - grads, 2),
        "backward_ms": round(full - report["fwd_train_mode_ms"]
                             - (full - grads), 2),
    }
    report["img_per_s_train"] = round(B / full * 1e3, 1)
    report["train_mfu"] = round(3 * fl * B / (full / 1e3) / PEAK, 4)
    report["gflop_per_img_fwd"] = round(fl / 1e9, 1)
    _write(report)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
