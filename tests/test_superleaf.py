"""Superleaf Adam (training/superleaf.py): flat-buffer round-trip and
training-trajectory parity with the optax reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vision_transformers_tpu.models.image_classification import ViT
from vision_transformers_tpu.training import trainer as tr
from vision_transformers_tpu.training.superleaf import (
    adam_flat, build_meta, flatten_tree, init_state, superleaf_train_step_fn,
    unflatten_tree,
)


def _tiny_model_and_data():
    model = ViT(image_size=16, patch_size=4, num_layers=2, num_heads=2,
                hidden_dim=32, mlp_dim=64, num_classes=4,
                dropout=0.0, attention_dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 16, 16, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 4, 8), jnp.int32)
    w = jnp.ones((8,), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1])
    return model, variables["params"], x, y, w


def test_flatten_roundtrip():
    _, params, _, _, _ = _tiny_model_and_data()
    meta = build_meta(params)
    flat = flatten_tree(params, meta)
    assert flat.shape[0] % 1024 == 0
    back = unflatten_tree(flat, meta)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back)


def test_adam_flat_matches_optax():
    _, params, _, _, _ = _tiny_model_and_data()
    state, meta = init_state(params)
    g_tree = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.RandomState(3).standard_normal(p.shape), jnp.float32),
        params)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    ref_p = params
    for _ in range(3):
        upd, opt_state = opt.update(g_tree, opt_state, ref_p)
        ref_p = optax.apply_updates(ref_p, upd)
        state = adam_flat(state, flatten_tree(g_tree, meta), 1e-3)
    got = unflatten_tree(state.flat, meta)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        got, ref_p)


def test_superleaf_training_trajectory_matches_reference_step():
    model, params, x, y, w = _tiny_model_and_data()
    meta = build_meta(params)
    sl_state, _ = init_state(params, meta)
    sl_step = jax.jit(superleaf_train_step_fn(model, meta, lr=1e-3))

    ref_state = tr.TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3))
    ref_step = jax.jit(tr.train_step_fn(model))

    rng = jax.random.PRNGKey(7)
    for i in range(3):
        sl_state, sl_loss, sl_correct, _ = sl_step(sl_state, x, y, w, rng)
        ref_state, ref_loss, ref_correct, _ = ref_step(ref_state, x, y, w,
                                                       rng)
        np.testing.assert_allclose(float(sl_loss), float(ref_loss),
                                   rtol=1e-4)
        assert float(sl_correct) == float(ref_correct)
    got = unflatten_tree(sl_state.flat, meta)
    # after 3 Adam steps tiny fp32 order-of-ops differences accumulate to
    # a few 1e-5 on near-zero params — atol covers those, rtol the rest
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=6e-5),
        got, ref_state.params)


def test_superleaf_requires_fp32():
    _, params, _, _, _ = _tiny_model_and_data()
    bad = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    with pytest.raises(ValueError):
        build_meta(bad)
