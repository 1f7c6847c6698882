"""int8 serving receipts (VERDICT r4 #7): what actually runs in s8.

serving_bench_r04.json showed int8 at 1.08x bf16 (best bucket) against
the README's ~2x s8xs8 MXU rate claim, with batch-1 int8 SLOWER — and no
evidence of which matmuls execute s8xs8->s32. This script produces that
evidence:

1. HLO receipts: compile the quantized ViT-B serving forward and count
   dot/convolution ops by operand dtype (s8 vs bf16/f32) in the OPTIMIZED
   HLO — the ground truth of what the MXU actually executes.
2. Per-op receipts: at each ViT-B serving GEMM shape, time bf16 vs the
   full int8 path (dynamic activation quant + s8 dot + rescale) vs the
   s8 dot alone (pre-quantized activations) — isolating the VPU
   quant/rescale overhead that eats the 2x MXU rate.
3. Trained-weights accuracy: train ViT-tiny on the procedural task on
   chip, quantize, and report bf16-vs-int8 test accuracy + argmax
   agreement (serving_bench's random-weight agreement number was not
   load-bearing).

Writes benchmarks/int8_receipts_r05.json.
Run: python benchmarks/int8_receipts.py  (INT8_SKIP_TRAIN=1 to skip #3)
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "int8_receipts_r05.json")
# merge into the existing artifact so a partial re-run (e.g.
# INT8_SKIP_TRAIN=1 to redo only the per-op table) keeps prior sections
try:
    with open(OUT) as _f:
        REPORT = json.load(_f)
except Exception:
    REPORT = {}
REPORT["backend"] = jax.default_backend()


def _write():
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(REPORT, f, indent=1)
    os.replace(tmp, OUT)


def _dot_dtype_census(hlo_text):
    """Count dot/conv ops by operand element type in (optimized) HLO.

    Optimized HLO prints operands as bare names (`convolution(%fusion.1,
    %fusion.2)`), so operand dtypes must be resolved through each
    operand's own definition line. A fusion's element type is its OUTPUT
    type — which is exactly what feeds the MXU, so `s32 =
    convolution(s8-typed operand, s8-typed operand)` is the s8×s8→s32
    signature."""
    def_type = {}
    for m in re.finditer(r"(%[\w.-]+)\s*=\s*(\w+)\[", hlo_text):
        def_type[m.group(1)] = m.group(2)

    census = {}
    for m in re.finditer(
            r"=\s*(\w+)\[[^\]]*\]\{?[^=]*?\b(dot|convolution)"
            r"\(([^)]*)\)", hlo_text):
        out_t, kind, operands = m.group(1), m.group(2), m.group(3)
        op_ts = []
        for name in re.findall(r"%[\w.-]+", operands):
            op_ts.append(def_type.get(name, "?"))
        # inline-typed operands (e.g. `s8[...] %p`) take precedence
        inline = re.findall(r"(\w+)\[[^\]]*\]\s*%", operands)
        if len(inline) == len(op_ts) and inline:
            op_ts = inline
        key = f"{kind}:{'x'.join(op_ts) or '?'}->{out_t}"
        census[key] = census.get(key, 0) + 1
    return census


def hlo_receipts():
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.serving import quantize_classifier
    from vision_transformers_tpu.utils.args import get_args

    model = ViT(**get_args("vitb16_224_imagenet"), dtype=jnp.bfloat16)
    x1 = jnp.zeros((8, 224, 224, 3), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           x1[:1])["params"])
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    qmodel, qparams = quantize_classifier(model, params)

    for tag, mdl, prm in (("bf16", model, params), ("int8", qmodel, qparams)):
        fwd = jax.jit(lambda p, x, m=mdl: m.apply(
            {"params": p}, x, deterministic=True))
        lowered = fwd.lower(prm, x1)
        try:
            txt = lowered.compile().as_text()
            src = "optimized_hlo"
        except Exception as e:  # noqa: BLE001
            txt = lowered.as_text()
            src = f"stablehlo (compile text unavailable: {str(e)[:40]})"
        REPORT[f"hlo_census_{tag}"] = {
            "source": src, "dots": _dot_dtype_census(txt)}
        print(tag, REPORT[f"hlo_census_{tag}"], flush=True)
        _write()


CHAIN_K = 32


def _timed_chain(fn, xs, *consts, iters=5):
    """Amortized per-op time: scan fn over K stacked inputs inside ONE jit.

    Single-dispatch per-op timings through this environment's tunnel carry
    ~1 ms of dispatch noise each (PERFORMANCE.md r3) — the v1 artifact's
    per_op table measured dispatch, not compute (every op read 1-2 ms
    regardless of shape). The scan amortizes dispatch over CHAIN_K
    applications on DIFFERENT inputs (so XLA cannot CSE), reduced to a
    scalar so nothing is DCE'd."""
    @jax.jit
    def chain(xs, *consts):
        def body(acc, x):
            return acc + jnp.sum(fn(x, *consts).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc
    float(chain(xs, *consts))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        v = chain(xs, *consts)
    float(v)
    return (time.perf_counter() - t0) / (iters * CHAIN_K) * 1e3


def per_op_receipts():
    """ViT-B serving GEMMs: (rows, in, out) at batch 1 / 8 / 32."""
    from vision_transformers_tpu.ops.quant import (
        dynamic_quant_rows, int8_matmul, quantize_kernel,
    )

    shapes = [("qkv", 768, 2304), ("proj", 768, 768),
              ("mlp_in", 768, 3072), ("mlp_out", 3072, 768)]
    rows_per_img = 197
    rng = np.random.RandomState(0)
    table = {}
    for b in (1, 8, 32):
        rows = b * rows_per_img
        for name, cin, cout in shapes:
            xs = jnp.asarray(
                rng.randn(CHAIN_K, rows, cin), jnp.bfloat16)
            k = jnp.asarray(rng.randn(cin, cout) * 0.02, jnp.bfloat16)
            kq, ks = quantize_kernel(k)
            xqs, xss = jax.jit(jax.vmap(dynamic_quant_rows))(xs)

            bf16_ms = _timed_chain(lambda x, k: x @ k, xs, k)
            int8_ms = _timed_chain(
                lambda x, kq, ks: int8_matmul(x, kq, ks), xs, kq, ks)

            def s8_dot_rescale(xq_xs, kq, ks):
                xq, x_scale = xq_xs
                acc = jax.lax.dot_general(
                    xq, kq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc.astype(jnp.float32) * (x_scale * ks)

            s8_dot_ms = _timed_chain(s8_dot_rescale, (xqs, xss), kq, ks)
            quant_ms = _timed_chain(lambda x: dynamic_quant_rows(x)[0], xs)
            flops = 2 * rows * cin * cout
            table[f"b{b}_{name}"] = {
                "bf16_ms": round(bf16_ms, 4),
                "int8_full_ms": round(int8_ms, 4),
                "int8_dot_rescale_ms": round(s8_dot_ms, 4),
                "dyn_quant_ms": round(quant_ms, 4),
                "int8_vs_bf16": round(bf16_ms / int8_ms, 3),
                "bf16_mfu": round(flops / (bf16_ms * 1e-3) / 197e12, 3),
                "s8_rate_vs_394T": round(
                    flops / (s8_dot_ms * 1e-3) / 394e12, 3),
            }
            print(f"b{b} {name}: bf16 {bf16_ms:.3f} int8 {int8_ms:.3f} "
                  f"(dot+rescale {s8_dot_ms:.3f}, quant {quant_ms:.3f})",
                  flush=True)
    REPORT["per_op"] = table
    REPORT["per_op_methodology"] = f"scan_chain_k{CHAIN_K}"
    _write()


def trained_accuracy():
    from convergence_soak import make_procedural_dataset

    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.serving import quantize_classifier
    from vision_transformers_tpu.training.device_data import fit_on_device
    from vision_transformers_tpu.utils.args import get_args

    (tr_x, tr_y), (te_x, te_y) = make_procedural_dataset(
        n_train=20_000, n_test=4_000, classes=100, seed=5)
    norm = ((0.5071, 0.4865, 0.4409), (0.2673, 0.2564, 0.2762))
    model = ViT(**get_args("vit_tiny_cifar100"))
    hist = fit_on_device(model, (tr_x, tr_y), (te_x, te_y), 30,
                         batch_size=256, normalize=norm, augment=True,
                         lr=1e-3, optimizer="adam", seed=0, verbose=False)
    params = hist["final_state"].params
    qmodel, qparams = quantize_classifier(model, params)

    mean = jnp.asarray(norm[0]) * 255.0
    std = jnp.asarray(norm[1]) * 255.0

    def logits(mdl, prm, x):
        xn = (x.astype(jnp.float32) - mean) / std
        return mdl.apply({"params": prm}, xn, deterministic=True)

    f_bf = jax.jit(lambda x: logits(model, params, x))
    f_q = jax.jit(lambda x: logits(qmodel, qparams, x))
    agree = correct_bf = correct_q = 0
    for i in range(0, len(te_y), 512):
        xb = jnp.asarray(te_x[i:i + 512])
        yb = te_y[i:i + 512]
        pb = np.asarray(jnp.argmax(f_bf(xb), -1))
        pq = np.asarray(jnp.argmax(f_q(xb), -1))
        agree += int((pb == pq).sum())
        correct_bf += int((pb == yb).sum())
        correct_q += int((pq == yb).sum())
    n = len(te_y)
    REPORT["trained_accuracy"] = {
        "train_epochs": 30,
        "bf16_test_acc": round(correct_bf / n, 4),
        "int8_test_acc": round(correct_q / n, 4),
        "argmax_agreement": round(agree / n, 4),
        "final_train_acc": round(float(hist["train_accuracy"][-1]), 4),
    }
    print(REPORT["trained_accuracy"], flush=True)
    _write()


def main():
    hlo_receipts()
    per_op_receipts()
    if os.environ.get("INT8_SKIP_TRAIN") != "1":
        trained_accuracy()
    _write()
    print("wrote", OUT)


if __name__ == "__main__":
    main()
