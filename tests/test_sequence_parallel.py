"""Ring attention (sequence parallelism) vs the jnp oracle.

Runs on the 8-device virtual CPU mesh (conftest). The reference has no
sequence sharding of any kind (SURVEY.md §5.7 — sequence cost is managed
architecturally only); this capability is TPU-native surplus.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.ops.attention import mha_reference
from vision_transformers_tpu.parallel import make_mesh
from vision_transformers_tpu.parallel.sequence import (
    ring_attention_local,
    sequence_parallel_attention,
)

pytestmark = pytest.mark.slow  # full-model / multi-device integration tier


def _qkv(b=2, h=2, s=64, d=8, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    return mk(), mk(), mk()


def test_ring_attention_matches_oracle():
    q, k, v = _qkv()
    mesh = make_mesh((8,), ("seq",))
    out = sequence_parallel_attention(q, k, v, mesh)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_attention_data_and_seq_axes():
    q, k, v = _qkv(b=4, s=32)
    mesh = make_mesh((2, 4), ("data", "seq"))
    out = sequence_parallel_attention(q, k, v, mesh, data_axis="data")
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_attention_key_padding_mask():
    """Padded keys must not receive probability mass — the DETR
    NestedTensor case (padded COCO batches) at sequence-parallel scale."""
    q, k, v = _qkv(b=2, s=64, seed=3)
    valid = 40
    kv_mask = jnp.arange(64)[None, :] < valid          # (1, S) -> broadcast
    kv_mask = jnp.broadcast_to(kv_mask, (2, 64))
    mesh = make_mesh((8,), ("seq",))
    out = sequence_parallel_attention(q, k, v, mesh, kv_mask=kv_mask)
    ref = mha_reference(q, k, v, mask=kv_mask[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_attention_fully_masked_rows_are_zero():
    q, k, v = _qkv(b=1, s=16, seed=5)
    kv_mask = jnp.zeros((1, 16), bool)                 # nothing attendable
    mesh = make_mesh((8,), ("seq",))
    out = sequence_parallel_attention(q, k, v, mesh, kv_mask=kv_mask)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_ring_attention_grads_flow():
    """The scan+ppermute body must differentiate (training at SP scale)."""
    q, k, v = _qkv(b=1, h=1, s=16, d=4, seed=7)
    mesh = make_mesh((8,), ("seq",))

    def loss(q, k, v):
        o = sequence_parallel_attention(q, k, v, mesh)
        return jnp.sum(o * o)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v)
        return jnp.sum(o * o)

    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=1e-4, atol=1e-5)


def test_detr_encoder_rides_ring_attention():
    """Public SP path (VERDICT r2 #5): under sequence_sharding(mesh), the
    DETR encoder's self-attention runs as ring attention over the 'seq'
    axis and matches the single-device encoder, including key padding."""
    from vision_transformers_tpu.models.object_detection.transformer import (
        TransformerEncoder,
    )
    from vision_transformers_tpu.parallel import sequence_sharding

    enc = TransformerEncoder(d_model=32, nhead=4, num_layers=2,
                             dim_feedforward=64, dropout=0.0)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    pos = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32) * 0.1)
    pad = jnp.zeros((2, 64), bool).at[:, 60:].set(True)  # last 4 padded

    v = enc.init(jax.random.PRNGKey(0), src,
                 src_key_padding_mask=pad, pos=pos)
    ref = enc.apply(v, src, src_key_padding_mask=pad, pos=pos)

    mesh = make_mesh((8,), ("seq",))
    with sequence_sharding(mesh, "seq"):
        out = enc.apply(v, src, src_key_padding_mask=pad, pos=pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_detr_encoder_sp_falls_back_on_indivisible_seq():
    from vision_transformers_tpu.models.object_detection.transformer import (
        TransformerEncoder,
    )
    from vision_transformers_tpu.parallel import sequence_sharding

    enc = TransformerEncoder(d_model=16, nhead=2, num_layers=1,
                             dim_feedforward=32, dropout=0.0)
    src = jnp.asarray(np.random.RandomState(1).randn(2, 30, 16)
                      .astype(np.float32))  # 30 % 8 != 0
    v = enc.init(jax.random.PRNGKey(0), src)
    ref = enc.apply(v, src)
    mesh = make_mesh((8,), ("seq",))
    with sequence_sharding(mesh, "seq"):
        out = enc.apply(v, src)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
