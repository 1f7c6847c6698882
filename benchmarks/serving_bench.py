"""Serving-path benchmark: AOT artifact latency/throughput per batch bucket.

Exports the flagship classifier (ViT-B/16 @224, bf16 on TPU) with
``serving.export_classifier``, reloads it the way a serving process would
(no model code), then measures per-bucket predict latency. Inputs are
device-resident: this measures the serving path, not the ~36 MB/s axon
host tunnel (a real deployment feeds the chip over real links).

Timing uses the queue-N-then-sync-once protocol (`block_until_ready` does
not synchronize through the axon tunnel; only a host transfer does).

Writes benchmarks/serving_bench_r04.json.
Env: SERVING_MODEL (args.py key, default vitb16_224_imagenet),
     SERVING_BUCKETS (csv, default 1,8,32,128,256), SERVING_ITERS.
Run: python benchmarks/serving_bench.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MODEL = os.environ.get("SERVING_MODEL", "vitb16_224_imagenet")
BUCKETS = tuple(
    int(b) for b in os.environ.get("SERVING_BUCKETS", "1,8,32,128,256").split(",")
)
ITERS = int(os.environ.get("SERVING_ITERS", "20"))


def main():
    from vision_transformers_tpu import serving
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.utils.args import get_args

    backend = jax.default_backend()
    args = get_args(MODEL)
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    model = ViT(**args, dtype=dtype)
    size = args["image_size"]
    shape = (size, size, 3)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *shape), jnp.float32)
    )["params"]
    # zero-init head would make the int8 logit-deviation stats degenerate
    params["head"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(1), params["head"]["kernel"].shape,
        params["head"]["kernel"].dtype)

    results = {"backend": backend, "model": MODEL,
               "dtype": str(jnp.dtype(dtype)), "buckets": {}}

    def measure(clf, section):
        for b in BUCKETS:
            x = jnp.asarray(
                np.random.RandomState(0).randn(b, *shape), jnp.float32)
            float(jnp.sum(clf.predict(x).astype(jnp.float32)))  # warm
            t0 = time.perf_counter()
            out = None
            for _ in range(ITERS):
                out = clf.predict(x)
            float(jnp.sum(out.astype(jnp.float32)))  # one sync for the chain
            dt = (time.perf_counter() - t0) / ITERS
            results[section][str(b)] = {
                "latency_ms": round(dt * 1e3, 3),
                "images_per_sec": round(b / dt, 1),
            }
            print(f"{section} bucket {b}: {dt*1e3:.2f} ms, {b/dt:.0f} img/s",
                  flush=True)

    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        serving.export_classifier(model, params, shape, d, buckets=BUCKETS)
        results["export_wall_s"] = round(time.time() - t0, 2)
        results["artifact_mb"] = round(sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        ) / 1e6, 1)

        t0 = time.time()
        clf = serving.load_classifier(d)
        clf.warmup()  # compile every bucket up front, like a real server
        results["load_and_warmup_wall_s"] = round(time.time() - t0, 2)
        measure(clf, "buckets")

        # --- int8 w8a8 PTQ artifact: 2x MXU rate ceiling on v5e ---------
        qmodel, qparams = serving.quantize_classifier(model, params)
        results["int8_buckets"] = {}
        with tempfile.TemporaryDirectory() as dq:
            serving.export_classifier(qmodel, qparams, shape, dq,
                                      buckets=BUCKETS)
            results["int8_artifact_mb"] = round(sum(
                os.path.getsize(os.path.join(dq, f)) for f in os.listdir(dq)
            ) / 1e6, 1)
            qclf = serving.load_classifier(dq)
            qclf.warmup()
            measure(qclf, "int8_buckets")
            # accuracy effect: relative logit deviation on one bucket
            b = BUCKETS[-1]
            x = jnp.asarray(
                np.random.RandomState(0).randn(b, *shape), jnp.float32)
            fp = np.asarray(clf.predict(x), np.float64)
            q8 = np.asarray(qclf.predict(x), np.float64)
            denom = max(float(np.linalg.norm(fp)), 1e-12)
            results["int8_logit_rel_l2"] = round(
                float(np.linalg.norm(q8 - fp)) / denom, 5)
            results["int8_argmax_agreement"] = round(float(
                (fp.argmax(-1) == q8.argmax(-1)).mean()), 4)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "serving_bench_r04.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
