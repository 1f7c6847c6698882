import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.image_classification.swin_transformer import (
    SwinTransformer,
)
from vision_transformers_tpu.utils.args import get_args

from tests.synthetic_data import SyntheticLoader


def _tiny_swin(num_classes=10):
    return SwinTransformer(
        patch_size=[2, 2], embed_dim=16, depths=[1, 1], num_heads=[2, 2],
        window_size=[4, 4], stochastic_depth_prob=0.1, num_classes=num_classes,
    )


@pytest.mark.slow
def test_swin_tiny_config_forward():
    args = get_args("swin_tiny_cifar100")
    model = SwinTransformer(**args)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y = model.apply(v, x)
    assert y.shape == (2, 100)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_swin_stage_dims_double():
    model = _tiny_swin()
    x = jnp.ones((1, 16, 16, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    p = v["params"]
    # stage0 runs at embed_dim, stage1 after merge at 2*embed_dim
    assert p["stage0_block0"]["attn"]["qkv_kernel"].shape == (16, 48)
    assert p["stage1_block0"]["attn"]["qkv_kernel"].shape == (32, 96)
    # relative position bias table: (2*4-1)^2 = 49 rows
    assert p["stage0_block0"]["attn"]["relative_position_bias_table"].shape == (49, 2)


def test_swin_stochastic_depth_train_vs_eval():
    # sd=0.9 on the last block; fixed PRNG keys make this deterministic
    model = SwinTransformer(
        patch_size=[2, 2], embed_dim=16, depths=[1, 1], num_heads=[2, 2],
        window_size=[4, 4], stochastic_depth_prob=0.9, num_classes=10,
    )
    x = jnp.ones((8, 16, 16, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y1 = model.apply(v, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = model.apply(v, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    assert not jnp.allclose(y1, y2)  # drop-path randomness
    y3 = model.apply(v, x)
    y4 = model.apply(v, x)
    assert jnp.allclose(y3, y4)


@pytest.mark.slow
def test_swin_overfits_synthetic():
    train = SyntheticLoader(32, 16, 16, 3, seed=7)
    hist = _tiny_swin(3).train_model(
        None, train, train, 6, lr=3e-3, verbose=False
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert hist["train_accuracy"][-1] > 0.5


# ---------------------------------------------------------------------------
# SwinV2 (the reference registers swin_*v2 preset names with no model —
# utils/args.py:29-41; we implement torchvision-V2 semantics)


def _tiny_swin_v2(num_classes=10):
    from vision_transformers_tpu.models.image_classification.swin_transformer import (
        SwinTransformerV2,
    )

    return SwinTransformerV2(
        patch_size=[2, 2], embed_dim=16, depths=[1, 1], num_heads=[2, 2],
        window_size=[4, 4], stochastic_depth_prob=0.0,
        num_classes=num_classes,
    )


def test_swin_v2_forward_and_param_structure():
    model = _tiny_swin_v2()
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)

    attn = variables["params"]["stage0_block0"]["attn"]
    # V2 params: per-head logit scale, CPB MLP, q/v biases (k bias is zero)
    assert attn["logit_scale"].shape == (2, 1, 1)
    assert np.allclose(np.asarray(attn["logit_scale"]), np.log(10.0))
    assert attn["cpb_fc1"]["kernel"].shape == (2, 512)
    assert attn["cpb_fc2"]["kernel"].shape == (512, 2)
    assert "q_bias" in attn and "v_bias" in attn and "qkv_bias" not in attn
    # V2 merge: reduction then norm over 2C
    assert variables["params"]["merge0"]["norm"]["scale"].shape == (32,)


@pytest.mark.slow
def test_swin_v2_registry_and_cli_routing():
    from vision_transformers_tpu.cli import _model_for
    from vision_transformers_tpu.models.image_classification.swin_transformer import (
        SwinTransformerV2,
    )

    args = get_args("swin_tinv2_cifar100")
    assert args["num_classes"] == 100
    cls = _model_for("swin_tinv2_cifar100")
    assert cls is SwinTransformerV2
    model = cls(**args)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    assert model.apply(variables, x).shape == (1, 100)


def test_swin_v2_cosine_attention_bounded_scores():
    """Cosine attention scores are bounded by the clamped temperature
    (|cos| <= 1, temp <= 100) regardless of input magnitude."""
    from vision_transformers_tpu.ops.windows import shifted_window_attention

    rng = np.random.RandomState(0)
    c, heads = 16, 2
    x = jnp.asarray(rng.randn(1, 4, 4, c).astype(np.float32) * 1000.0)
    qkv_k = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32))
    proj_k = jnp.eye(c, dtype=jnp.float32)
    logit_scale = jnp.full((heads, 1, 1), 99.0)  # exp(min(99, log100)) = 100
    out = shifted_window_attention(
        x, qkv_k, None, proj_k, None, None, (4, 4), heads, (0, 0),
        logit_scale=logit_scale,
    )
    # with softmax over bounded scores the output is a convex combination
    # of v rows — finite even with exploding inputs
    assert bool(jnp.all(jnp.isfinite(out)))


def test_swin_v2_grads_finite_with_window_padding():
    """Regression: when the feature map is smaller than the window (the
    last stage of a 32px Swin), window padding makes exact-zero q/k rows;
    x/max(||x||, eps) cosine normalization has a NaN backward at x=0
    (d||x||/dx = 0/0), which NaN'd every param after one Adam step on
    TPU. The rsqrt(sumsq+eps) form must keep all grads finite."""
    from vision_transformers_tpu.ops.windows import shifted_window_attention

    rng = np.random.RandomState(0)
    c, heads = 16, 2
    # 2x2 map, 4x4 window -> 12 of 16 window tokens are zero padding
    x = jnp.asarray(rng.randn(2, 2, 2, c).astype(np.float32))
    qkv_k = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.1)
    proj_k = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1)
    logit_scale = jnp.full((heads, 1, 1), np.log(10.0))

    def loss(qkv_k, logit_scale):
        out = shifted_window_attention(
            x, qkv_k, None, proj_k, None, None, (4, 4), heads, (0, 0),
            logit_scale=logit_scale,
        )
        return jnp.sum(out * out)

    g_qkv, g_ls = jax.grad(loss, argnums=(0, 1))(qkv_k, logit_scale)
    assert bool(jnp.all(jnp.isfinite(g_qkv)))
    assert bool(jnp.all(jnp.isfinite(g_ls)))


@pytest.mark.slow
def test_swin_v2_overfits_synthetic():
    model = _tiny_swin_v2(num_classes=4)
    loader = SyntheticLoader(num_samples=32, batch_size=16, num_classes=4)
    metrics = model.train_model(model, loader, loader, 10, loader, lr=5e-3,
                                verbose=False)
    assert metrics["train_accuracy"][-1] > 0.7
