import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.image_classification.pvt import PVT
from vision_transformers_tpu.models.image_classification.twins_svt import TwinSVT
from vision_transformers_tpu.ops.sra import SpatialReductionAttention
from vision_transformers_tpu.ops.attention import mha_reference


def test_sra_ratio_1_equals_plain_attention():
    """sr_ratio=1 must reduce to vanilla attention (pvt.py:70-73)."""
    b, n, c, heads = 2, 16, 8, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, c))
    attn = SpatialReductionAttention(c, heads, sr_ratio=1, qkv_bias=True)
    v = attn.init(jax.random.PRNGKey(1), x, (4, 4))
    out = attn.apply(v, x, (4, 4))

    p = v["params"]
    q = (x @ p["q"]["kernel"] + p["q"]["bias"]).reshape(b, n, heads, c // heads)
    kv = (x @ p["kv"]["kernel"] + p["kv"]["bias"]).reshape(b, n, 2, heads, c // heads)
    ref = mha_reference(
        q.transpose(0, 2, 1, 3),
        kv[:, :, 0].transpose(0, 2, 1, 3),
        kv[:, :, 1].transpose(0, 2, 1, 3),
    ).transpose(0, 2, 1, 3).reshape(b, n, c)
    ref = ref @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sra_reduces_kv_length():
    b, n, c, heads = 1, 64, 8, 2
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, c))
    attn = SpatialReductionAttention(c, heads, sr_ratio=4)
    v = attn.init(jax.random.PRNGKey(3), x, (8, 8))
    out = attn.apply(v, x, (8, 8))
    assert out.shape == (b, n, c)
    # reduction projection takes r*r*c inputs
    assert v["params"]["sr"]["kernel"].shape == (4 * 4 * c, c)


def test_pvt_default_forward():
    model = PVT(image_size=32, patch_size=4, embed_dims=[16, 32],
                num_heads=[1, 2], mlp_ratios=[2, 2], depths=[1, 1],
                sr_ratios=[2, 1], num_stages=2, num_classes=10,
                drop_path_rate=0.1)
    x = jnp.ones((2, 32, 32, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y = model.apply(v, x)
    assert y.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_pvt_pos_embed_interpolates_other_image_size():
    """Feeding a different size at apply-time exercises _get_pos_embed's
    bilinear interpolation path (pvt.py:193-199). Params are built for 32px
    then applied to 64px — flax params stay valid because the pos-embed is
    canonical-size + resize."""
    model = PVT(image_size=32, patch_size=4, embed_dims=[16], num_heads=[1],
                mlp_ratios=[2], depths=[1], sr_ratios=[1], num_stages=1,
                num_classes=5)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.ones((1, 32, 32, 3)),
    )
    y = model.apply(v, jnp.ones((1, 64, 64, 3)))
    assert y.shape == (1, 5)


def test_twins_default_forward():
    model = TwinSVT(img_size=32, patch_size=4, embed_dims=[16, 32],
                    num_heads=[1, 2], mlp_ratios=[2, 2], depths=[2, 2],
                    sr_ratios=[2, 1], wss=[7, 7], num_classes=10)
    x = jnp.ones((2, 32, 32, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y = model.apply(v, x)
    assert y.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(y)))
    # PEG and final norm exist (reference defects §2.9.7 fixed)
    assert "pos_block0" in v["params"]
    assert "norm" in v["params"]


def test_twins_reference_cifar_config():
    """The reference default config crashes as written; ours must run."""
    model = TwinSVT(num_classes=100)  # defaults: dims [64,128,256], wss 7
    x = jnp.ones((1, 32, 32, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y = model.apply(v, x)
    assert y.shape == (1, 100)
