"""Measured keep-or-kill for superleaf Adam (VERDICT r3 next #7).

Compares three full ViT-B/16 train-step variants on the real chip at the
bench batch (192):
  a) optax adam (the shipping default; r3: Adam term ~4.4 ms under the
     64 MB scoped-VMEM option, vs 2.96 ms HBM roofline for 2.4 GB),
  b) per-leaf fused Pallas Adam (r3: rejected, ~50 dispatches),
  c) superleaf Adam (training/superleaf.py: master params/mu/nu as one
     flat fp32 buffer, one kernel dispatch, slice-view unflatten).

Also isolates the optimizer term by timing a grads-only step (forward +
backward, no update) and differencing. Writes
benchmarks/adam_superleaf_r04.json. Run on TPU:
  python benchmarks/adam_superleaf.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(step, state, x, y, w, key, iters=20):
    """Time a (state, ...) -> (state', scalar, ...) step, threading the
    donated state, queued `iters` times with ONE host sync at the end
    (axon: block_until_ready does not synchronize; a scalar transfer
    does)."""
    out = step(state, x, y, w, key)
    state = out[0]
    float(jnp.sum(jnp.asarray(out[1]).astype(jnp.float32)))  # sync compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(state, x, y, w, key)
        state = out[0]
    float(jnp.sum(jnp.asarray(out[1]).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.training import trainer as tr
    from vision_transformers_tpu.training.optimizers import make_optimizer
    from vision_transformers_tpu.training.superleaf import (
        build_meta, init_state, superleaf_train_step_fn,
    )
    from vision_transformers_tpu.utils.args import get_args

    on_tpu = jax.default_backend() == "tpu"
    args = get_args("vitb16_224_imagenet")
    if not on_tpu:  # CPU smoke: shrink
        args.update(image_size=32, patch_size=8, num_layers=2, num_heads=2,
                    hidden_dim=64, mlp_dim=128)
    model = ViT(**args, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    tb = 192 if on_tpu else 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(tb, args["image_size"], args["image_size"], 3),
                    jnp.float32)
    y = jnp.asarray(rng.randint(0, args.get("num_classes", 1000), tb),
                    jnp.int32)
    w = jnp.ones((tb,), jnp.float32)
    key = jax.random.PRNGKey(1)
    opts = ({"xla_tpu_scoped_vmem_limit_kib": "65536"} if on_tpu else None)
    iters = 15 if on_tpu else 2

    def compile_step(step, state):
        jitted = jax.jit(step, donate_argnums=0)
        if opts:
            return jitted.lower(state, x, y, w, key).compile(
                compiler_options=opts)
        return jitted

    results = {"batch": tb, "backend": jax.default_backend(), "steps": {}}

    # (a) optax adam
    state_a = tr.make_train_state(model, jax.random.PRNGKey(0), x[:1],
                                  lr=1e-3)
    step_a = compile_step(tr.train_step_fn(model), state_a)
    results["steps"]["optax_adam_ms"] = round(
        timed(step_a, state_a, x, y, w, key, iters=iters), 2)

    # grads-only step (no optimizer) — isolates the update term
    def grads_only(state, images, labels, weights, rng_):
        import jax.numpy as jnp_
        from vision_transformers_tpu.training.trainer import (
            _default_preprocess, cross_entropy_with_weights,
        )
        xx = _default_preprocess(images, None)

        def loss_fn(p):
            logits = model.apply({"params": p}, xx, deterministic=False,
                                 rngs={"dropout": rng_})
            return cross_entropy_with_weights(logits, labels, weights)

        loss, g = jax.value_and_grad(loss_fn)(state.params)
        gsum = sum(jnp_.sum(jnp_.abs(l).astype(jnp_.float32))
                   for l in jax.tree.leaves(g))
        return state, loss + 0 * gsum
    state_g = tr.make_train_state(model, jax.random.PRNGKey(0), x[:1],
                                  lr=1e-3)
    step_g = compile_step(grads_only, state_g)
    results["steps"]["grads_only_ms"] = round(
        timed(step_g, state_g, x, y, w, key, iters=iters), 2)

    # (b) per-leaf fused
    state_b = tr.make_train_state(
        model, jax.random.PRNGKey(0), x[:1],
        tx=make_optimizer("adam", 1e-3, fused=True))
    step_b = compile_step(tr.train_step_fn(model), state_b)
    results["steps"]["perleaf_fused_ms"] = round(
        timed(step_b, state_b, x, y, w, key, iters=iters), 2)

    # (c) superleaf
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1])
    meta = build_meta(variables["params"])
    sl_state, _ = init_state(variables["params"], meta)
    step_c = compile_step(superleaf_train_step_fn(model, meta, lr=1e-3),
                          sl_state)
    results["steps"]["superleaf_ms"] = round(
        timed(step_c, sl_state, x, y, w, key, iters=iters), 2)

    base = results["steps"]["grads_only_ms"]
    for k in ("optax_adam_ms", "perleaf_fused_ms", "superleaf_ms"):
        results["steps"][k.replace("_ms", "_adam_term_ms")] = round(
            results["steps"][k] - base, 2)
    results["roofline_adam_ms"] = 2.96  # 2.4 GB / 819 GB/s (PERFORMANCE.md)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "adam_superleaf_r04.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
