import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.image_classification import ViT
from vision_transformers_tpu.training.trainer import make_train_state
from vision_transformers_tpu.utils.checkpoint import (
    available_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from vision_transformers_tpu.utils.visualization import (
    plot_attention_maps,
    plot_patches,
)

pytestmark = pytest.mark.slow  # full-model / multi-device integration tier


def _state():
    model = ViT(image_size=16, patch_size=8, num_layers=1, num_heads=2,
                hidden_dim=16, mlp_dim=16, num_classes=2)
    return model, make_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))


def test_checkpoint_roundtrip(tmp_path):
    model, state = _state()
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, step=1)
    save_checkpoint(d, state.replace(step=2), step=2)
    assert available_checkpoints(d) == [1, 2]

    _, fresh = _state()
    restored = restore_checkpoint(d, fresh)  # latest
    chex_equal = jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state.params), restored.params,
    )
    assert all(jax.tree_util.tree_leaves(chex_equal))
    assert int(np.asarray(restored.step)) == 2


def test_checkpoint_retention(tmp_path):
    model, state = _state()
    d = str(tmp_path / "ckpt")
    for s in range(1, 6):
        save_checkpoint(d, state, step=s, keep=2)
    assert available_checkpoints(d) == [4, 5]


def test_plot_patches_and_attention(tmp_path):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 16, 16, 3), np.uint8)
    fig = plot_patches(imgs, patch_size=4,
                       save_path=str(tmp_path / "patches.png"))
    assert (tmp_path / "patches.png").exists()

    model = ViT(image_size=16, patch_size=4, num_layers=2, num_heads=2,
                hidden_dim=16, mlp_dim=16, num_classes=2)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
    )
    _, weights = model.apply(v, jnp.asarray(imgs[:1], jnp.float32),
                             return_weights=True)
    plot_attention_maps(weights, layer=0,
                        save_path=str(tmp_path / "attn.png"))
    assert (tmp_path / "attn.png").exists()
