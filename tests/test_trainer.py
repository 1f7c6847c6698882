import jax
import numpy as np

from vision_transformers_tpu.models.image_classification import ViT
from vision_transformers_tpu.training.trainer import fit

from tests.synthetic_data import SyntheticLoader


def _tiny_model(num_classes=4):
    return ViT(
        image_size=16, patch_size=4, num_layers=2, num_heads=2,
        hidden_dim=32, mlp_dim=64, dropout=0.0, attention_dropout=0.0,
        num_classes=num_classes,
    )


def test_fit_returns_reference_metrics_dict():
    train = SyntheticLoader(32, 8, 16, 4, seed=0)
    test = SyntheticLoader(16, 8, 16, 4, seed=1)
    val = SyntheticLoader(16, 8, 16, 4, seed=2)
    hist = _tiny_model().train_model(None, train, test, 2, val, verbose=False)
    for key in ("train_loss", "val_loss", "test_loss",
                "train_accuracy", "val_accuracy", "test_accuracy"):
        assert len(hist[key]) == 2
    # no-val variant mirrors the reference's None placeholders (base.py:124)
    hist2 = _tiny_model().train_model(None, train, test, 1, verbose=False)
    assert hist2["val_loss"] is None and hist2["val_accuracy"] is None


def test_fit_overfits_synthetic_data():
    train = SyntheticLoader(48, 16, 16, 3, seed=3)
    hist = fit(_tiny_model(3), train, train, epochs=8, lr=3e-3, verbose=False)
    assert hist["train_accuracy"][-1] > 0.9, hist["train_accuracy"]
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_fit_handles_ragged_final_batch():
    train = SyntheticLoader(20, 8, 16, 2, seed=4)  # batches: 8, 8, 4
    hist = fit(_tiny_model(2), train, train, epochs=1, verbose=False)
    assert len(hist["train_loss"]) == 1


def test_fit_with_data_parallel_mesh():
    devices = jax.devices()
    assert len(devices) == 8, "conftest must provide 8 virtual devices"
    mesh = jax.sharding.Mesh(np.array(devices), ("data",))
    train = SyntheticLoader(32, 16, 16, 2, seed=5)
    hist = fit(_tiny_model(2), train, train, epochs=1, mesh=mesh, verbose=False)
    assert len(hist["train_loss"]) == 1


def test_fit_steps_per_call_matches_metrics_contract():
    train = SyntheticLoader(40, 8, 16, 3, seed=8)  # 5 batches -> chunks of 2
    hist = fit(_tiny_model(3), train, train, epochs=2, lr=3e-3,
               verbose=False, steps_per_call=2)
    assert len(hist["train_loss"]) == 2
    assert hist["train_loss"][1] < hist["train_loss"][0]
    # padding chunk must not inflate the sample count: acc within [0, 1]
    assert 0.0 <= hist["train_accuracy"][-1] <= 1.0
