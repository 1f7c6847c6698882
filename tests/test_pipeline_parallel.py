"""GPipe pipeline parallelism vs sequential application.

Runs on the 8-device virtual CPU mesh (conftest). The reference has no
pipeline parallelism (SURVEY.md §2.7).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.parallel import make_mesh
from vision_transformers_tpu.parallel.pipeline import pipeline_apply


def test_pipeline_matches_sequential_toy_stages():
    n_stages, b, d = 4, 8, 16
    rng = np.random.RandomState(0)
    ws = jnp.asarray(rng.randn(n_stages, d, d).astype(np.float32) * 0.3)
    bs = jnp.asarray(rng.randn(n_stages, d).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(b, d).astype(np.float32))

    def stage_fn(params, x):
        w, c = params
        return jnp.tanh(x @ w + c)

    seq = x
    for i in range(n_stages):
        seq = stage_fn((ws[i], bs[i]), seq)

    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    out = pipeline_apply(stage_fn, (ws, bs), x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_more_microbatches_than_stages():
    n_stages, b, d = 2, 12, 8
    rng = np.random.RandomState(1)
    ws = jnp.asarray(rng.randn(n_stages, d, d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(b, d).astype(np.float32))

    def stage_fn(w, x):
        return jnp.tanh(x @ w)

    seq = x
    for i in range(n_stages):
        seq = stage_fn(ws[i], seq)

    mesh = make_mesh((2,), ("stage",), devices=jax.devices()[:2])
    out = pipeline_apply(stage_fn, ws, x, mesh, n_micro=6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_vit_encoder_blocks():
    """Real model stages: one ViT EncoderBlock per pipeline stage, stacked
    params sharded over the stage axis — output must match the sequential
    encoder stack."""
    from vision_transformers_tpu.models.image_classification.vanilla_vit import (
        EncoderBlock,
    )

    n_stages, b, s, d = 4, 4, 10, 16
    block = EncoderBlock(num_heads=2, hidden_dim=d, mlp_dim=32)
    x = jnp.asarray(np.random.RandomState(2).randn(b, s, d).astype(np.float32))

    keys = jax.random.split(jax.random.PRNGKey(0), n_stages)
    per_stage = [block.init({"params": k}, x)["params"] for k in keys]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_stage)

    seq = x
    for p in per_stage:
        seq = block.apply({"params": p}, seq)

    def stage_fn(params, x):
        return block.apply({"params": params}, x)

    mesh = make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    out = pipeline_apply(stage_fn, stacked, x, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-4, atol=1e-5)
