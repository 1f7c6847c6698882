import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.image_classification import ViT
from vision_transformers_tpu.utils.args import get_args


@pytest.fixture(scope="module")
def tiny_vit():
    args = get_args("vit_tiny_cifar100")
    model = ViT(**args)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    return model, variables


def test_forward_shape(tiny_vit):
    model, variables = tiny_vit
    x = jnp.ones((3, 32, 32, 3), jnp.float32)
    y = model.apply(variables, x)
    assert y.shape == (3, 100)


def test_param_count_matches_reference_formula(tiny_vit):
    """ViT-tiny CIFAR param count from the architecture spec:
    conv_proj + cls + pos + 7 blocks (LN+MHA+LN+MLP) + final LN + head."""
    _, variables = tiny_vit
    d, mlp, L, S, C, p = 256, 512, 7, 65, 100, 4
    expected = (
        (3 * p * p * d + d)            # patch proj
        + d                            # class token
        + S * d                        # pos embedding
        + L * (
            2 * (2 * d)                # two LayerNorms
            + (d * 3 * d + 3 * d)      # qkv
            + (d * d + d)              # out proj
            + (d * mlp + mlp)          # fc1
            + (mlp * d + d)            # fc2
        )
        + 2 * d                        # final LN
        + (d * C + C)                  # head
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert n == expected


def test_zero_init_head_gives_uniform_logits(tiny_vit):
    """Reference zero-inits the head (vanilla_vit.py:149-151): logits at init
    must be exactly zero → uniform softmax."""
    model, variables = tiny_vit
    y = model.apply(variables, jnp.ones((2, 32, 32, 3)))
    assert jnp.all(y == 0.0)


def test_dropout_active_in_training_mode(tiny_vit):
    # Compare pre-head features: the zero-init head maps everything to 0.
    model, variables = tiny_vit
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    f1 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)},
                     method="forward_features")
    f2 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)},
                     method="forward_features")
    f_det = model.apply(variables, x, method="forward_features")
    assert not jnp.allclose(f1, f2)
    assert jnp.allclose(
        f_det,
        model.apply(variables, x, method="forward_features"),
    )


def test_return_attention_weights(tiny_vit):
    """Visualization parity: the reference's plot_attention_maps needs weights
    the torch models never return (SURVEY.md §5.5); ours can."""
    model, variables = tiny_vit
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    logits, weights = model.apply(variables, x, return_weights=True)
    assert logits.shape == (1, 100)
    assert len(weights) == 7
    assert weights[0].shape == (1, 4, 65, 65)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(weights[0], axis=-1)), 1.0, rtol=1e-5
    )


def test_jit_forward(tiny_vit):
    model, variables = tiny_vit
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    y = fwd(variables, jnp.ones((2, 32, 32, 3)))
    assert y.shape == (2, 100)
