"""Fused LayerNorm+Dense kernel vs its jnp twin.

The kernel was built for VERDICT r2 item 1 (fuse LN into the adjacent
matmul) and MEASURED SLOWER in the 12-layer ViT-B context (105 vs 62 ms,
benchmarks/ln_fused.py): XLA's full-batch matmul runs ~91% of roofline
while the per-block in-kernel matmul serializes with the LN phase. It
stays in-tree as a correct, tested building block (PERFORMANCE.md records
the rejection), so its oracle tests live here.
"""

import jax
import jax.numpy as jnp
import pytest

from vision_transformers_tpu.ops.fused_dense import ln_dense, _ln_dense_ref


def _inputs(r=48, d=64, n=128, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (r, d), dtype)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (d,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[2], (d,), jnp.float32)
    w = (jax.random.normal(ks[3], (d, n), jnp.float32) * 0.1).astype(dtype)
    bias = 0.1 * jax.random.normal(ks[4], (n,), jnp.float32)
    return x, gamma, beta, w, bias


@pytest.mark.parametrize("activation", [None, "gelu_tanh", "gelu_erf"])
def test_ln_dense_matches_ref(activation):
    x, gamma, beta, w, bias = _inputs()
    out = ln_dense(x, gamma, beta, w, bias, activation=activation)
    ref = _ln_dense_ref(x, gamma, beta, w, bias, 1e-6, activation)
    assert out.shape == ref.shape
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_ln_dense_no_bias_3d_batch():
    x, gamma, beta, w, _ = _inputs()
    x3 = x.reshape(4, 12, -1)
    out = ln_dense(x3, gamma, beta, w)
    ref = _ln_dense_ref(x, gamma, beta, w, None, 1e-6, None)
    assert out.shape == (4, 12, w.shape[1])
    assert jnp.max(jnp.abs(out.reshape(-1, w.shape[1]) - ref)) < 1e-5


def test_ln_dense_gradients_match_ref():
    x, gamma, beta, w, bias = _inputs(r=16, d=32, n=64)

    def loss_kernel(x, gamma, beta, w, bias):
        return jnp.sum(
            jnp.sin(ln_dense(x, gamma, beta, w, bias,
                             activation="gelu_tanh")))

    def loss_ref(x, gamma, beta, w, bias):
        return jnp.sum(
            jnp.sin(_ln_dense_ref(x, gamma, beta, w, bias, 1e-6,
                                  "gelu_tanh")))

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, w, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, w, bias)
    for a, b in zip(g1, g2):
        assert jnp.max(jnp.abs(a - b)) < 1e-4
