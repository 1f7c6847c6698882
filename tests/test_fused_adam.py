"""Fused Adam(W) vs optax — trajectory equality and wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vision_transformers_tpu.ops import fused_adam as fa_mod
from vision_transformers_tpu.training.optimizers import (
    _fused_adam, make_optimizer,
)


def _params(big=False):
    rng = np.random.RandomState(0)
    big_shape = (520, 128) if big else (6, 16)
    return {
        "w": jnp.asarray(rng.randn(*big_shape), jnp.float32),
        "b": jnp.asarray(rng.randn(32), jnp.float32),
        "nested": {"k": jnp.asarray(rng.randn(4, 8, 16), jnp.float32)},
    }


def _grads(params, seed):
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return treedef.unflatten(
        [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(ks, leaves)])


@pytest.mark.parametrize("weight_decay", [0.0, 0.05])
def test_fused_apply_matches_optax_trajectory(weight_decay, monkeypatch):
    # force some leaves through the Pallas kernel (interpret mode on CPU)
    monkeypatch.setattr(fa_mod, "_MIN_FUSED_SIZE", 512)
    params = _params()
    tx_ref = (optax.adamw(1e-3, weight_decay=weight_decay)
              if weight_decay else optax.adam(1e-3))
    tx_fused = _fused_adam(1e-3, weight_decay=weight_decay)

    p_ref, p_fused = params, params
    s_ref = tx_ref.init(p_ref)
    s_fused = tx_fused.init(p_fused)
    for step in range(4):
        g = _grads(params, step)
        upd, s_ref = tx_ref.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_fused, s_fused = tx_fused.fused_apply(p_fused, g, s_fused)
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_ref, p_fused)
    assert max(jax.tree.leaves(err)) < 1e-6, err


def test_update_fallback_matches_fused_apply():
    params = _params()
    tx = _fused_adam(1e-3, weight_decay=0.01)
    state = tx.init(params)
    g = _grads(params, 7)
    upd, s2 = tx.update(g, state, params)
    p_via_update = optax.apply_updates(params, upd)
    p_via_fused, s3 = tx.fused_apply(params, g, state)
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        p_via_update, p_via_fused)
    assert max(jax.tree.leaves(err)) < 1e-6
    assert int(s2.count) == int(s3.count) == 1


def test_fused_adam_with_schedule():
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    params = _params()
    tx_ref = optax.adam(sched)
    tx_fused = _fused_adam(sched)
    p_ref, p_fused = params, params
    s_ref, s_fused = tx_ref.init(p_ref), tx_fused.init(p_fused)
    for step in range(3):
        g = _grads(params, 10 + step)
        upd, s_ref = tx_ref.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_fused, s_fused = tx_fused.fused_apply(p_fused, g, s_fused)
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_ref, p_fused)
    assert max(jax.tree.leaves(err)) < 1e-6, err


def test_make_optimizer_fused_selection():
    tx = make_optimizer("adam", 1e-3, fused=True)
    assert hasattr(tx, "fused_apply")
    tx = make_optimizer("adam", 1e-3, fused=False)
    assert not hasattr(tx, "fused_apply")
    # chained transforms refuse the fused path explicitly
    with pytest.raises(ValueError):
        make_optimizer("adam", 1e-3, fused=True, grad_clip_norm=1.0)
    # default is plain optax (fused path is opt-in; measured slower
    # per-leaf at ViT-B/16 — see make_optimizer docstring)
    tx = make_optimizer("adam", 1e-3)
    assert not hasattr(tx, "fused_apply")


def test_trainstate_dispatches_to_fused():
    from vision_transformers_tpu.training.trainer import TrainState

    params = _params()
    state = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params,
        tx=_fused_adam(1e-3))
    ref_state = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params,
        tx=optax.adam(1e-3))
    g = _grads(params, 3)
    s1 = state.apply_gradients(grads=g)
    s2 = ref_state.apply_gradients(grads=g)
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree.leaves(err)) < 1e-6
    assert int(s1.step) == 1
