import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.training.device_data import (
    augment_batch_on_device,
    fit_on_device,
)
from vision_transformers_tpu.models.image_classification import ViT


def test_on_device_augment_semantics():
    """Crop offsets/flip/brightness behave like the host pipeline: output
    pixels come from the padded source, zeros appear at crop edges, values
    stay in [0, 255]."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(50, 200, (8, 16, 16, 3), np.uint8))
    out = augment_batch_on_device(x, jax.random.PRNGKey(0), pad=4)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
    # different rng → different augmentation
    out2 = augment_batch_on_device(x, jax.random.PRNGKey(1), pad=4)
    assert not jnp.allclose(out, out2)


def test_on_device_augment_identity_without_shift():
    """With pad=0, flip_p=0, brightness=0 the batch passes through."""
    x = jnp.asarray(np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3))
    out = augment_batch_on_device(
        x, jax.random.PRNGKey(0), pad=0, flip_p=0.0, brightness=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x, np.float32))


def test_fit_on_device_learns_and_matches_contract():
    rng = np.random.RandomState(0)
    n, classes = 256, 4
    labels = rng.randint(0, classes, n).astype(np.int32)
    base = rng.randint(0, 255, (classes, 3))
    imgs = np.clip(
        base[labels][:, None, None, :] * np.ones((1, 16, 16, 1))
        + rng.randint(-20, 20, (n, 16, 16, 3)), 0, 255
    ).astype(np.uint8)

    model = ViT(image_size=16, patch_size=4, num_layers=2, num_heads=2,
                hidden_dim=32, mlp_dim=64, num_classes=classes)
    hist = fit_on_device(
        model, (imgs, labels), (imgs, labels), epochs=6,
        val_data=(imgs[:64], labels[:64]),
        batch_size=64, lr=3e-3, verbose=False,
        normalize=((0.5,) * 3, (0.25,) * 3),
    )
    for key in ("train_loss", "val_loss", "test_loss",
                "train_accuracy", "val_accuracy", "test_accuracy"):
        assert len(hist[key]) == 6
    assert hist["train_accuracy"][-1] > 0.8
    assert hist["train_loss"][-1] < hist["train_loss"][0]
