"""Pallas flash attention vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.ops.attention import mha_reference
from vision_transformers_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, h, sq, sk, d):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, sk, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize(
    "b,h,sq,sk,d",
    [
        (2, 4, 65, 65, 64),    # ViT-tiny CIFAR: 8x8 patches + CLS
        (1, 3, 197, 197, 64),  # ViT-B/16 @224: 14x14 + CLS
        (2, 2, 64, 16, 32),    # SRA-style cross attention, Sk << Sq
        (1, 1, 16, 16, 8),     # tiny window
    ],
)
def test_forward_matches_oracle(b, h, sq, sk, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, h, sq, sk, d)
    out = flash_attention(q, k, v)
    ref = mha_reference(q, k, v)
    assert out.shape == ref.shape
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_forward_with_bias():
    b, h, s, d = 2, 3, 49, 32  # Swin-like windowed shape
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), b, h, s, s, d)
    bias = jax.random.normal(jax.random.PRNGKey(2), (1, h, s, s))
    out = flash_attention(q, k, v, bias)
    ref = mha_reference(q, k, v, bias)
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_forward_with_per_batch_bias():
    b, h, s, d = 2, 2, 32, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b, h, s, s, d)
    bias = jax.random.normal(jax.random.PRNGKey(4), (b, h, s, s))
    out = flash_attention(q, k, v, bias)
    ref = mha_reference(q, k, v, bias)
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_kv_valid_masks_padding():
    b, h, s, d = 1, 2, 64, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b, h, s, s, d)
    # Poison the padded tail; kv_valid must make it invisible.
    k = k.at[:, :, 40:, :].set(1e6)
    v = v.at[:, :, 40:, :].set(1e6)
    out = flash_attention(q, k, v, kv_valid=40)
    ref = mha_reference(q[:, :, :, :], k[:, :, :40, :], v[:, :, :40, :])
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_gradients_match_oracle():
    b, h, s, d = 1, 2, 65, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), b, h, s, s, d)
    bias = jax.random.normal(jax.random.PRNGKey(7), (1, h, s, s))

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(mha_reference(q, k, v, bias) ** 2)

    gp = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gp, gr):
        rel = jnp.max(jnp.abs(a - b_)) / (jnp.max(jnp.abs(b_)) + 1e-9)
        assert rel < 1e-4


def test_bias_broadcast_gradient_reduces():
    b, h, s, d = 3, 2, 32, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(8), b, h, s, s, d)
    bias = jax.random.normal(jax.random.PRNGKey(9), (1, h, s, s))

    g_flash = jax.grad(lambda bb: jnp.sum(flash_attention(q, k, v, bb) ** 2))(bias)
    g_ref = jax.grad(lambda bb: jnp.sum(mha_reference(q, k, v, bb) ** 2))(bias)
    assert g_flash.shape == bias.shape
    rel = jnp.max(jnp.abs(g_flash - g_ref)) / (jnp.max(jnp.abs(g_ref)) + 1e-9)
    assert rel < 1e-4


def test_oversize_sequences_use_streaming_kernel():
    """COCO-scale S routes to the online-softmax streaming path."""
    from vision_transformers_tpu.ops import attention as A

    b, h, s, d = 1, 1, 2048, 8
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, h, s, s, d)
    out = A.dot_product_attention(q, k, v, backend="pallas")
    ref = mha_reference(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 1e-4


def test_streaming_kernel_forced_small_shape():
    """Force the streaming path on a small case; fwd + grads vs oracle."""
    from vision_transformers_tpu.ops import flash_attention as FA

    orig = FA._SMALL_S_LIMIT
    FA._SMALL_S_LIMIT = 1  # everything goes through the large path
    try:
        b, h, s, d = 2, 2, 200, 16
        q, k, v = _rand_qkv(jax.random.PRNGKey(1), b, h, s, s, d)
        out = FA.flash_attention(q, k, v)
        ref = mha_reference(q, k, v)
        assert jnp.max(jnp.abs(out - ref)) < 1e-5

        gp = jax.grad(lambda q: jnp.sum(FA.flash_attention(q, k, v) ** 2))(q)
        gr = jax.grad(lambda q: jnp.sum(mha_reference(q, k, v) ** 2))(q)
        rel = jnp.max(jnp.abs(gp - gr)) / (jnp.max(jnp.abs(gr)) + 1e-9)
        assert rel < 1e-4
    finally:
        FA._SMALL_S_LIMIT = orig


def test_streaming_kernel_kv_valid_and_cross():
    from vision_transformers_tpu.ops import flash_attention as FA

    orig = FA._SMALL_S_LIMIT
    FA._SMALL_S_LIMIT = 1
    try:
        b, h, sq, sk, d = 1, 2, 100, 300, 8
        q, k, v = _rand_qkv(jax.random.PRNGKey(2), b, h, sq, sk, d)
        k = k.at[:, :, 250:, :].set(1e6)
        v = v.at[:, :, 250:, :].set(1e6)
        out = FA.flash_attention(q, k, v, kv_valid=250)
        ref = mha_reference(q, k[:, :, :250], v[:, :, :250])
        assert jnp.max(jnp.abs(out - ref)) < 1e-5
    finally:
        FA._SMALL_S_LIMIT = orig


def test_streaming_kernel_runtime_key_padding_mask():
    """Per-image key-padding masks (DETR padded batches) through the
    streaming path, fwd + grads vs masked oracle."""
    from vision_transformers_tpu.ops import flash_attention as FA

    b, h, s, d = 2, 2, 96, 8
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b, h, s, s, d)
    valid_len = jnp.asarray([60, 96])
    kv_mask = jnp.arange(s)[None, :] < valid_len[:, None]  # (B, S)

    out = FA.flash_attention(q, k, v, kv_mask=kv_mask)
    ref = mha_reference(q, k, v, mask=kv_mask[:, None, None, :])
    # padded-query rows differ (their keys are masked in both; fine), but
    # compare everything: mask only hides keys, queries remain valid
    assert jnp.max(jnp.abs(out - ref)) < 1e-5

    gp = jax.grad(lambda q: jnp.sum(FA.flash_attention(
        q, k, v, kv_mask=kv_mask) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(mha_reference(
        q, k, v, mask=kv_mask[:, None, None, :]) ** 2))(q)
    rel = jnp.max(jnp.abs(gp - gr)) / (jnp.max(jnp.abs(gr)) + 1e-9)
    assert rel < 1e-4


def test_dispatcher_key_padding_to_kernel():
    from vision_transformers_tpu.ops import attention as A

    b, h, s, d = 2, 2, 64, 8
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), b, h, s, s, d)
    kv_mask = (jnp.arange(s)[None, :] < 40) | jnp.zeros((b, 1), bool)
    out = A.dot_product_attention(
        q, k, v, mask=kv_mask[:, None, None, :], backend="pallas")
    ref = mha_reference(q, k, v, mask=kv_mask[:, None, None, :])
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


# ---------------------------------------------------------------------------
# Packed-QKV kernel (reads (B, S, 3·H·D) in place; see flash_attention.py
# "Packed-QKV attention" design note)

from vision_transformers_tpu.ops.flash_attention import packed_flash_attention


def _packed_oracle(qkv, heads):
    b, s, three_hd = qkv.shape
    d = three_hd // 3 // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    out = mha_reference(q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(b, s, heads * d)


@pytest.mark.parametrize(
    "b,s,heads,d",
    [
        (2, 65, 4, 64),    # ViT-tiny CIFAR
        (1, 197, 3, 64),   # ViT-B-ish
        (3, 50, 2, 32),
    ],
)
def test_packed_forward_matches_oracle(b, s, heads, d):
    qkv = jax.random.normal(
        jax.random.PRNGKey(0), (b, s, 3 * heads * d), jnp.float32)
    out = packed_flash_attention(qkv, heads)
    ref = _packed_oracle(qkv, heads)
    assert out.shape == ref.shape
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_packed_gradients_match_oracle():
    b, s, heads, d = 2, 33, 2, 16
    qkv = jax.random.normal(
        jax.random.PRNGKey(1), (b, s, 3 * heads * d), jnp.float32)

    def loss_kernel(qkv):
        o = packed_flash_attention(qkv, heads)
        return jnp.sum(jnp.sin(o))

    def loss_ref(qkv):
        o = _packed_oracle(qkv, heads)
        return jnp.sum(jnp.sin(o))

    g1 = jax.grad(loss_kernel)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    assert jnp.max(jnp.abs(g1 - g2)) < 1e-4


def test_packed_kv_valid_matches_truncated_oracle():
    """kv_valid masks trailing pad keys: the first kv_valid tokens' outputs
    equal the oracle run on the unpadded sequence (fwd and grads)."""
    b, s_real, pad, heads, d = 2, 33, 7, 2, 16
    s = s_real + pad
    qkv = jax.random.normal(
        jax.random.PRNGKey(4), (b, s, 3 * heads * d), jnp.float32)

    out = packed_flash_attention(qkv, heads, kv_valid=s_real)
    ref = _packed_oracle(qkv[:, :s_real], heads)
    assert jnp.max(jnp.abs(out[:, :s_real] - ref)) < 1e-5

    def loss_kernel(qkv):
        o = packed_flash_attention(qkv, heads, kv_valid=s_real)
        return jnp.sum(jnp.sin(o[:, :s_real]))

    def loss_ref(qkv_real):
        o = _packed_oracle(qkv_real, heads)
        return jnp.sum(jnp.sin(o))

    g1 = jax.grad(loss_kernel)(qkv)
    g2 = jax.grad(loss_ref)(qkv[:, :s_real])
    assert jnp.max(jnp.abs(g1[:, :s_real] - g2)) < 1e-4
    # pad keys/values receive exactly zero gradient through valid queries
    kv_cols = g1[:, s_real:, heads * d:]
    assert jnp.max(jnp.abs(kv_cols)) < 1e-6


def test_packed_matches_selfattention_module():
    """SelfAttention's split-head jnp path and the packed kernel agree on
    the same qkv tensor (weight-layout compatibility)."""
    from vision_transformers_tpu.ops.attention import SelfAttention

    b, s, hd, heads = 2, 17, 64, 4
    x = jax.random.normal(jax.random.PRNGKey(2), (b, s, hd))
    mod = SelfAttention(hidden_dim=hd, num_heads=heads)
    params = mod.init({"params": jax.random.PRNGKey(3)}, x)
    ref = mod.apply(params, x)  # CPU: jnp path

    # packed path on the same projection output
    kern = params["params"]["qkv"]["kernel"]
    bias = params["params"]["qkv"]["bias"]
    qkv = x @ kern + bias
    packed = packed_flash_attention(qkv, heads)
    wout = params["params"]["out"]["kernel"]
    bout = params["params"]["out"]["bias"]
    out = packed @ wout + bout
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


# ---------------------------------------------------------------------------
# Fused attention sub-block (LN + QKV + attention + out proj + residual)


def _fused_inputs(b=2, s=33, hd=64, heads=4, seed=5):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (b, s, hd), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (1, hd), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[2], (1, hd), jnp.float32)
    wqkv = jax.random.normal(ks[3], (hd, 3 * hd), jnp.float32) * 0.1
    bqkv = jax.random.normal(ks[4], (1, 3 * hd), jnp.float32) * 0.1
    wout = jax.random.normal(ks[5], (hd, hd), jnp.float32) * 0.1
    bout = jax.random.normal(ks[6], (1, hd), jnp.float32) * 0.1
    return x, gamma, beta, wqkv, bqkv, wout, bout


def test_fused_block_matches_ref():
    from vision_transformers_tpu.ops.flash_attention import (
        _fused_block_ref, fused_attention_block,
    )

    args = _fused_inputs()
    heads, scale = 4, 1.0 / 4.0
    ref = _fused_block_ref(*args, heads, scale, 1e-6)
    got = fused_attention_block(*args, heads, scale)
    assert jnp.max(jnp.abs(got - ref)) < 1e-4


def test_fused_block_matches_encoder_block_math():
    """Fused op == the modular EncoderBlock attention sub-block (LN ->
    SelfAttention -> residual) on the same weights."""
    import flax.linen as nn

    from vision_transformers_tpu.ops.attention import SelfAttention
    from vision_transformers_tpu.ops.flash_attention import (
        fused_attention_block,
    )

    b, s, hd, heads = 2, 17, 64, 4
    x = jax.random.normal(jax.random.PRNGKey(8), (b, s, hd))

    class SubBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
            y = SelfAttention(hd, heads, name="self_attention")(y)
            return x + y

    mod = SubBlock()
    variables = mod.init({"params": jax.random.PRNGKey(9)}, x)
    ref = mod.apply(variables, x)

    p = variables["params"]
    got = fused_attention_block(
        x,
        p["ln_1"]["scale"].reshape(1, -1), p["ln_1"]["bias"].reshape(1, -1),
        p["self_attention"]["qkv"]["kernel"],
        p["self_attention"]["qkv"]["bias"].reshape(1, -1),
        p["self_attention"]["out"]["kernel"],
        p["self_attention"]["out"]["bias"].reshape(1, -1),
        heads, 1.0 / (hd // heads) ** 0.5,
    )
    assert jnp.max(jnp.abs(got - ref)) < 1e-5


def test_fused_block_gradients_match_ref():
    from vision_transformers_tpu.ops.flash_attention import (
        _fused_block_ref, fused_attention_block,
    )

    args = _fused_inputs(b=1, s=9, hd=32, heads=2, seed=6)
    heads, scale = 2, 1.0 / 4.0

    def loss_fused(*a):
        return jnp.sum(jnp.sin(fused_attention_block(*a, heads, scale)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_fused_block_ref(*a, heads, scale, 1e-6)))

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b_ in zip(g1, g2):
        assert jnp.max(jnp.abs(a - b_)) < 1e-4


def test_fused_block_supported_bounds():
    from vision_transformers_tpu.ops.flash_attention import (
        fused_block_supported,
    )

    assert fused_block_supported(197, 768, 2)        # ViT-B bf16
    assert not fused_block_supported(197, 768, 4)    # ViT-B fp32: weights OOM
    assert not fused_block_supported(197, 1024, 2)   # ViT-L bf16: weights OOM
    assert fused_block_supported(65, 256, 4)         # CIFAR ViT-tiny fp32


# ---------------------------------------------------------------------------
# Multi-window block-diagonal pack kernel


class TestWindowPack:
    def _qkv(self, g=32, n=16, heads=2, dh=32, seed=0):
        rng = np.random.RandomState(seed)
        return jnp.asarray(
            rng.randn(g, n, 3 * heads * dh).astype(np.float32) * 0.5)

    def test_matches_oracle_no_bias(self):
        from vision_transformers_tpu.ops.flash_attention import (
            _window_pack_ref, window_packed_attention,
        )

        qkv = self._qkv()
        ref = _window_pack_ref(qkv, None, 2, 1 / 32 ** 0.5)
        got = window_packed_attention(qkv, None, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_oracle_per_window_bias(self):
        from vision_transformers_tpu.ops.flash_attention import (
            _window_pack_ref, window_packed_attention,
        )

        g, n, heads, dh, n_win = 32, 16, 2, 32, 8
        qkv = self._qkv(g, n, heads, dh, seed=1)
        rng = np.random.RandomState(2)
        bias = jnp.asarray(rng.randn(n_win, heads, n, n).astype(np.float32))
        ref = _window_pack_ref(qkv, bias, heads, 1 / dh ** 0.5)
        got = window_packed_attention(qkv, bias, heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_reference(self):
        from vision_transformers_tpu.ops.flash_attention import (
            _window_pack_ref, window_packed_attention,
        )

        g, n, heads, dh, n_win = 16, 16, 2, 32, 4
        qkv = self._qkv(g, n, heads, dh, seed=3)
        bias = jnp.asarray(
            np.random.RandomState(4).randn(n_win, heads, n, n)
            .astype(np.float32) * 0.1)

        def loss_k(qkv, bias):
            return jnp.sum(window_packed_attention(qkv, bias, heads) ** 2)

        def loss_r(qkv, bias):
            return jnp.sum(_window_pack_ref(qkv, bias, heads,
                                            1 / dh ** 0.5) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1))(qkv, bias)
        gr = jax.grad(loss_r, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                                   rtol=1e-4, atol=1e-4)

    def test_plan_rejects_unsupported(self):
        from vision_transformers_tpu.ops.flash_attention import (
            window_pack_plan,
        )

        assert window_pack_plan(32, 16, 2, 128, 1) is None   # dh too big
        assert window_pack_plan(33, 16, 2, 32, 1) is None    # g % p != 0
        assert window_pack_plan(32, 200, 2, 32, 1) is None   # n too big
        plan = window_pack_plan(32, 16, 2, 32, 8)
        assert plan is not None and plan[0] == 4

    def test_plan_accepts_periodic_bias(self):
        # n_win not divisible by p (SwinV2 @224 stage 1: n_win=49, p=4)
        # rides a periodic bias tiling instead of falling back (r4).
        from vision_transformers_tpu.ops.flash_attention import (
            window_pack_plan,
        )

        plan = window_pack_plan(128 * 49, 64, 3, 32, 49)
        assert plan is not None and plan[0] == 4
        # g_blk must divide or be a multiple of the 49-pack bias period
        period = 49  # lcm(49, 4) // 4
        g_blk = plan[1]
        assert period % g_blk == 0 or g_blk % period == 0

    def test_matches_oracle_periodic_bias_tiled(self):
        # nwp % p != 0, g_blk a multiple of the period (constant index map
        # with a wrapped gather): nwp=6, p=4 -> period 3.
        from vision_transformers_tpu.ops.flash_attention import (
            _window_pack_ref, window_packed_attention, window_pack_plan,
        )

        g, n, heads, dh, n_win = 48, 16, 2, 32, 6
        qkv = self._qkv(g, n, heads, dh, seed=5)
        bias = jnp.asarray(
            np.random.RandomState(6).randn(n_win, heads, n, n)
            .astype(np.float32))
        plan = window_pack_plan(g, n, heads, dh, n_win, qkv.dtype.itemsize)
        assert plan is not None
        ref = _window_pack_ref(qkv, bias, heads, 1 / dh ** 0.5)
        got = window_packed_attention(qkv, bias, heads, plan=plan)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_oracle_periodic_bias_modulo(self):
        # g_blk strictly smaller than the period exercises the modulo
        # index map (bias block revisited with wrap across programs).
        from vision_transformers_tpu.ops.flash_attention import (
            _window_pack_ref, window_packed_attention,
        )

        g, n, heads, dh, n_win = 24, 16, 2, 32, 3
        qkv = self._qkv(g, n, heads, dh, seed=7)
        bias = jnp.asarray(
            np.random.RandomState(8).randn(n_win, heads, n, n)
            .astype(np.float32))
        ref = _window_pack_ref(qkv, bias, heads, 1 / dh ** 0.5)
        got = window_packed_attention(qkv, bias, heads, plan=(4, 1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_reference_periodic_bias(self):
        from vision_transformers_tpu.ops.flash_attention import (
            _window_pack_ref, window_packed_attention,
        )

        g, n, heads, dh, n_win = 24, 16, 2, 32, 3
        qkv = self._qkv(g, n, heads, dh, seed=9)
        bias = jnp.asarray(
            np.random.RandomState(10).randn(n_win, heads, n, n)
            .astype(np.float32) * 0.1)

        def loss_k(qkv, bias):
            return jnp.sum(
                window_packed_attention(qkv, bias, heads, plan=(4, 1)) ** 2)

        def loss_r(qkv, bias):
            return jnp.sum(_window_pack_ref(qkv, bias, heads,
                                            1 / dh ** 0.5) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1))(qkv, bias)
        gr = jax.grad(loss_r, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                                   rtol=1e-4, atol=1e-4)
