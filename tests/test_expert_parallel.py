"""Expert-parallel MoE MLP vs the dense single-device oracle.

Runs on the 8-device virtual CPU mesh (conftest). The reference has no
MoE anywhere (SURVEY.md §2.7) — EP is capability surplus.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.parallel import make_mesh
from vision_transformers_tpu.parallel.expert import (
    expert_parallel_mlp,
    moe_mlp_reference,
)

pytestmark = pytest.mark.slow  # full-model / multi-device integration tier


def _params(e=8, d=16, h=32, seed=0):
    rng = np.random.RandomState(seed)
    f = lambda *sh: jnp.asarray(rng.randn(*sh).astype(np.float32) * 0.3)
    return (f(d, e), f(e, d, h), f(e, h), f(e, h, d), f(e, d))


def test_expert_parallel_matches_dense():
    rk, w1, b1, w2, b2 = _params()
    x = jnp.asarray(np.random.RandomState(1).randn(24, 16).astype(np.float32))
    ref = moe_mlp_reference(x, rk, w1, b1, w2, b2)
    mesh = make_mesh((8,), ("expert",))
    out = expert_parallel_mlp(x, rk, w1, b1, w2, b2, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_expert_parallel_fewer_shards_than_experts():
    rk, w1, b1, w2, b2 = _params(e=8)
    x = jnp.asarray(np.random.RandomState(2).randn(12, 16).astype(np.float32))
    ref = moe_mlp_reference(x, rk, w1, b1, w2, b2)
    mesh = make_mesh((4,), ("expert",), devices=jax.devices()[:4])
    out = expert_parallel_mlp(x, rk, w1, b1, w2, b2, mesh)  # 2 experts/dev
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_expert_parallel_every_expert_used_and_grads():
    rk, w1, b1, w2, b2 = _params(e=4, seed=3)
    x = jnp.asarray(np.random.RandomState(4).randn(64, 16).astype(np.float32))
    # with 64 random tokens over 4 experts, every expert should win some
    probs = jax.nn.softmax(x @ rk, axis=-1)
    assert len(np.unique(np.asarray(jnp.argmax(probs, -1)))) == 4

    mesh = make_mesh((4,), ("expert",), devices=jax.devices()[:4])

    def loss(w1):
        return jnp.sum(
            expert_parallel_mlp(x, rk, w1, b1, w2, b2, mesh) ** 2)

    g = jax.grad(loss)(w1)

    def loss_ref(w1):
        return jnp.sum(moe_mlp_reference(x, rk, w1, b1, w2, b2) ** 2)

    g_ref = jax.grad(loss_ref)(w1)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    # routing means every expert's weights received gradient
    per_expert = np.abs(np.asarray(g)).sum(axis=(1, 2))
    assert (per_expert > 0).all()
