import os, sys
sys.path.insert(0, "/root/repo")
import time, json
import jax, jax.numpy as jnp, numpy as np

from vision_transformers_tpu.models.image_classification import ViT
from vision_transformers_tpu.utils.args import get_args
from vision_transformers_tpu.training.trainer import make_train_state, train_step_fn
from bench import vit_b16_flops_per_image, V5E_PEAK_FLOPS

args = get_args("vitb16_224_imagenet")
model = ViT(**args, dtype=jnp.bfloat16)
flops = vit_b16_flops_per_image()
opts = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
x_full = jnp.asarray(np.random.RandomState(0).randn(320, 224, 224, 3), jnp.float32)

for tb in (160, 192, 224, 256, 320):
    xt = x_full[:tb]
    labels = jnp.zeros((tb,), jnp.int32)
    w = jnp.ones((tb,), jnp.float32)
    state = make_train_state(model, jax.random.PRNGKey(0), xt[:1], lr=1e-3)
    rng = jax.random.PRNGKey(1)
    step = jax.jit(train_step_fn(model), donate_argnums=0)
    step = step.lower(state, xt, labels, w, rng).compile(compiler_options=opts)
    state, l, _, _ = step(state, xt, labels, w, rng)
    float(l)
    t0 = time.perf_counter()
    for _ in range(10):
        state, l, _, _ = step(state, xt, labels, w, rng)
    float(l)
    dt = time.perf_counter() - t0
    ips = tb * 10 / dt
    print(json.dumps({"tb": tb, "ms": round(dt/10*1000,1), "ips": round(ips,1),
                      "mfu": round(ips*3*flops/V5E_PEAK_FLOPS, 4)}))
    del state, step
