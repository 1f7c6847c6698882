"""The q-row-blocked dropout attention kernel pair vs the jnp oracle.

flash_dropout_attention exists because training-mode attention dropout
otherwise falls off every kernel onto the XLA path, whose (B, H, Sq, Sk)
HBM materializations were ~45 ms of DETR's 98 ms train step
(benchmarks/detr_train_residue_r05_dropkernel.json).

Correctness strategy: the keep mask is a pure function of
(seed, program grid position), so an oracle that replays the identical
stream on the kernel's exact (g_blk, q_blk) partitioning must agree —
forward and backward. The CPU interpreter stubs the pltpu PRNG (zeros),
so these tests swap in a deterministic hash-PRNG stand-in that keeps the
(seed, i·nq + j) program dependence — a fwd/bwd partition or seeding
mismatch still fails loudly. The real pltpu stream (distribution, keep
rate, replay) is validated on-chip by benchmarks/kernel_validation.py
(validate_split_dropout), same as the packed kernel's dropout.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vision_transformers_tpu.ops.flash_attention as fa
from vision_transformers_tpu.ops.attention import (
    dot_product_attention,
    mha_reference,
)


def _rand_qkv(key, b, h, sq, sk, d):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, sk, d), jnp.float32)
    return q, k, v


# --- deterministic stand-in PRNG (trace-time state capture) ---------------

_STATE = []


def _fake_seed(*args):
    """Stand-in for pltpu.prng_seed: folds the (seed, program) args into one
    traced int32 the keep stand-in reads — program-index dependence kept."""
    s = jnp.int32(0)
    for a in args:
        s = s * jnp.int32(1000003) + jnp.asarray(a, jnp.int32)
    _STATE.clear()
    _STATE.append(s)


def _fake_keep(shape, rate):
    """Stand-in for _dropout_keep: xorshift-mult hash of (state, position)."""
    s = _STATE[0].astype(jnp.uint32)
    n = int(np.prod(shape))
    idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
    h = idx * jnp.uint32(2654435761) + s * jnp.uint32(40503)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x5BD1E995)
    h = h ^ (h >> 15)
    thresh = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return h >= thresh


@pytest.fixture
def fake_prng(monkeypatch):
    monkeypatch.setattr(fa.pltpu, "prng_seed", _fake_seed)
    monkeypatch.setattr(fa, "_dropout_keep", _fake_keep)


def _oracle_keep_mask(g, s_q, s_k, d, itemsize, seed, rate):
    """Replay the kernel's stream (seed, i·nq + j) on its exact
    (g_blk, q_blk) partitioning (_dropout_plan), outside pallas."""
    g_blk, q_blk = fa._dropout_plan(g, s_q, s_k, d, itemsize)
    nq = -(-s_q // q_blk)
    blocks = np.empty((g // g_blk, nq), object)
    for i in range(g // g_blk):
        for j in range(nq):
            _fake_seed(seed[0], jnp.int32(i * nq + j))
            blocks[i, j] = _fake_keep((g_blk, q_blk, s_k), rate)
    rows = [jnp.concatenate(list(blocks[i]), axis=1)
            for i in range(g // g_blk)]
    return jnp.concatenate(rows, axis=0)[:, :s_q]


def _oracle_with_mask(q, k, v, keep, rate, key_mask=None):
    """jnp attention dropping the normalized probs with a FIXED keep mask."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / (d ** 0.5)
    if key_mask is not None:
        s = s + jnp.where(key_mask, 0.0, fa.DEFAULT_MASK_VALUE)[
            :, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    pd = jnp.where(keep.reshape(b, h, sq, sk), p / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", pd.astype(v.dtype), v)


SEED = jnp.array([4242], jnp.int32)


def test_rate0_matches_oracle():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 3, 65, 65, 32)
    out = fa.flash_dropout_attention(q, k, v, dropout_rate=0.0, seed=SEED)
    ref = mha_reference(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_rate0_gradients_match_oracle():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, 48, 48, 16)

    def loss_kernel(q, k, v):
        return jnp.sum(fa.flash_dropout_attention(
            q, k, v, dropout_rate=0.0, seed=SEED) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        assert jnp.max(jnp.abs(a - b)) < 1e-4


def test_rate0_pad_rows_gradients():
    """Sq > q_blk and not a multiple: padded q rows must not poison dk/dv."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 1, 300, 72, 16)

    def loss_kernel(q, k, v):
        return jnp.sum(fa.flash_dropout_attention(
            q, k, v, dropout_rate=0.0, seed=SEED) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gk, gr):
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        assert err / scale < 2e-5, (name, err, scale)


def test_deterministic_and_seed_sensitivity(fake_prng):
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 2, 40, 40, 16)
    f = functools.partial(fa.flash_dropout_attention, dropout_rate=0.25)
    o0 = fa.flash_dropout_attention(q, k, v, dropout_rate=0.0, seed=SEED)
    o1 = f(q, k, v, seed=SEED)
    o2 = f(q, k, v, seed=SEED)
    o3 = f(q, k, v, seed=jnp.array([7], jnp.int32))
    assert bool(jnp.all(o1 == o2))
    assert not bool(jnp.all(o1 == o3))
    assert float(jnp.max(jnp.abs(o1 - o0))) > 1e-3  # dropout actually fired


@pytest.mark.parametrize(
    "b,h,sq,sk,rate",
    [
        (2, 2, 64, 64, 0.1),     # single q block
        (1, 2, 300, 72, 0.25),   # multi q block + pad rows (q_blk=256)
        (2, 1, 56, 120, 0.5),    # cross attention, Sk > Sq
    ],
)
def test_forward_matches_oracle_same_mask(fake_prng, b, h, sq, sk, rate):
    d = 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), b, h, sq, sk, d)
    keep = _oracle_keep_mask(b * h, sq, sk, d, 4, SEED, rate)
    out = fa.flash_dropout_attention(q, k, v, dropout_rate=rate, seed=SEED)
    ref = _oracle_with_mask(q, k, v, keep, rate)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1 - rate)) < 0.05  # hash stand-in is roughly uniform


@pytest.mark.parametrize("sq,sk", [(64, 64), (300, 72)])
def test_gradients_match_oracle_same_mask(fake_prng, sq, sk):
    b, h, d, rate = 1, 2, 16, 0.2
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b, h, sq, sk, d)
    keep = _oracle_keep_mask(b * h, sq, sk, d, 4, SEED, rate)
    tgt = jax.random.normal(jax.random.PRNGKey(6), (b, h, sq, d))

    def loss_kernel(q, k, v):
        o = fa.flash_dropout_attention(q, k, v, dropout_rate=rate, seed=SEED)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((_oracle_with_mask(q, k, v, keep, rate) - tgt) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gk, gr):
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        assert err / scale < 2e-4, (name, err, scale)


def test_key_mask_matches_oracle(fake_prng):
    b, h, sq, sk, d, rate = 2, 2, 48, 80, 16, 0.15
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), b, h, sq, sk, d)
    key_mask = jnp.arange(sk)[None, :] < jnp.array([[50], [73]])  # (B, Sk)
    keep = _oracle_keep_mask(b * h, sq, sk, d, 4, SEED, rate)
    out = fa.flash_dropout_attention(
        q, k, v, dropout_rate=rate, seed=SEED, key_mask=key_mask)
    ref = _oracle_with_mask(q, k, v, keep, rate, key_mask=key_mask)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5


def test_key_mask_gradients_zero_on_masked_keys(fake_prng):
    b, h, sq, sk, d, rate = 1, 2, 32, 64, 16, 0.2
    q, k, v = _rand_qkv(jax.random.PRNGKey(8), b, h, sq, sk, d)
    key_mask = jnp.arange(sk)[None, :] < 40

    def loss(k, v):
        return jnp.sum(fa.flash_dropout_attention(
            q, k, v, dropout_rate=rate, seed=SEED, key_mask=key_mask) ** 2)

    dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
    assert float(jnp.max(jnp.abs(dk[:, :, 40:]))) == 0.0
    assert float(jnp.max(jnp.abs(dv[:, :, 40:]))) == 0.0
    assert float(jnp.max(jnp.abs(dk[:, :, :40]))) > 0.0


def test_kv_valid_matches_truncated():
    b, h, sq, sk, d = 1, 2, 32, 64, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), b, h, sq, sk, d)
    k = k.at[:, :, 40:].set(1e6)  # poison the pad tail
    v = v.at[:, :, 40:].set(1e6)
    out = fa.flash_dropout_attention(
        q, k, v, dropout_rate=0.0, seed=SEED, kv_valid=40)
    ref = mha_reference(q, k[:, :, :40], v[:, :, :40])
    assert jnp.max(jnp.abs(out - ref)) < 1e-5


def test_dispatcher_routes_dropout_to_kernel(monkeypatch):
    """backend='pallas' + dropout + key-padding mask must hit the kernel."""
    calls = {}
    real = fa.flash_dropout_attention

    def spy(*a, **kw):
        calls["hit"] = True
        kw["dropout_rate"] = 0.0  # CPU interpreter has no pltpu PRNG
        return real(*a, **kw)

    import vision_transformers_tpu.ops.attention as attn_mod
    monkeypatch.setattr(attn_mod, "flash_dropout_attention", spy)
    b, h, s, d = 2, 2, 40, 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(10), b, h, s, s, d)
    mask = (jnp.arange(s)[None, :] < 30)[:, None, None, :]
    mask = jnp.broadcast_to(mask, (b, 1, 1, s))
    out = dot_product_attention(
        q, k, v, mask=mask, dropout_rate=0.1,
        dropout_rng=jax.random.PRNGKey(0), backend="pallas")
    assert calls.get("hit") and out.shape == q.shape
