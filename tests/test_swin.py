import jax
import jax.numpy as jnp
import numpy as np

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


def test_swin_overfits_synthetic():
    train = SyntheticLoader(32, 16, 16, 3, seed=7)
    hist = _tiny_swin(3).train_model(
        None, train, train, 6, lr=3e-3, verbose=False
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert hist["train_accuracy"][-1] > 0.5
