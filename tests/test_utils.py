import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.utils import load_data as ld
from vision_transformers_tpu.utils.metrics import (
    MetricLogger,
    SmoothedValue,
    accuracy_topk,
    get_sha,
)
from vision_transformers_tpu.utils.optimization import (
    Trial, TrialPruned, run_study,
)


# ---------------------------------------------------------------- load_data

def test_random_crop_batch_preserves_shape_and_content_origin():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    out = ld.random_crop_batch(x, np.random.RandomState(1))
    assert out.shape == x.shape
    assert out.dtype == np.uint8


def test_random_hflip_batch_flips_some():
    x = np.zeros((16, 4, 4, 1), np.uint8)
    x[:, :, 0, 0] = 255  # left column marked
    out = ld.random_hflip_batch(x, np.random.RandomState(0))
    flipped = (out[:, :, -1, 0] == 255).all(axis=-1)
    assert flipped.any() and not flipped.all()


def test_brightness_jitter_within_range():
    x = np.full((4, 8, 8, 3), 128, np.uint8)
    out = ld.brightness_jitter_batch(x, np.random.RandomState(0))
    assert out.min() >= int(128 * (1 - 63 / 255)) - 1
    assert out.max() <= int(128 * (1 + 63 / 255)) + 1


def test_resize_center_crop():
    img = np.zeros((100, 200, 3), np.uint8)
    out = ld.resize_center_crop(img, resize=64, crop=56)
    assert out.shape == (56, 56, 3)


def test_random_resized_crop_output_size():
    img = np.zeros((100, 80, 3), np.uint8)
    out = ld.random_resized_crop(img, np.random.RandomState(0), size=32)
    assert out.shape == (32, 32, 3)


def test_array_loader_epochs_reshuffle_and_augment():
    x = np.arange(20 * 8 * 8 * 3, dtype=np.uint8).reshape(20, 8, 8, 3) % 255
    y = np.arange(20, dtype=np.int32)
    loader = ld.ArrayLoader(x, y, 8, shuffle=True, augment=False,
                            normalize=((0.5,) * 3, (0.25,) * 3))
    e1 = np.concatenate([b[1] for b in loader])
    e2 = np.concatenate([b[1] for b in loader])
    assert sorted(e1) == list(range(20))
    assert not np.array_equal(e1, e2)  # reshuffled between epochs
    assert len(loader) == 3  # 8+8+4


def test_get_train_test_loaders_unknown_raises():
    with pytest.raises(ValueError, match="not supported"):
        ld.get_train_test_loaders("mnist")


def test_get_train_test_loaders_missing_cifar_raises_clearly(tmp_path):
    with pytest.raises(FileNotFoundError, match="cifar-100-python"):
        ld.get_train_test_loaders("cifar100", root_dir=str(tmp_path))


def test_get_train_test_loaders_synthetic_cifar(tmp_path):
    """Write a miniature CIFAR-100-format pickle tree and load it."""
    import pickle

    base = tmp_path / "cifar-100-python"
    base.mkdir()
    rng = np.random.RandomState(0)
    for split, n in (("train", 64), ("test", 32)):
        data = {
            b"data": rng.randint(0, 255, (n, 3072), dtype=np.uint8),
            b"fine_labels": rng.randint(0, 100, n).tolist(),
        }
        with open(base / split, "wb") as f:
            pickle.dump(data, f)

    tr, va, te = ld.get_train_test_loaders(
        "cifar100", batch_size=16, val_split=0.25, root_dir=str(tmp_path))
    xb, yb = next(iter(tr))
    assert xb.shape == (16, 32, 32, 3) and xb.dtype == np.uint8
    assert tr.normalize == ld._STATS["cifar100"]
    assert sum(len(b[1]) for b in va) == 16   # 25% of 64
    assert sum(len(b[1]) for b in te) == 32


# ----------------------------------------------------------------- metrics

def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.median == 3.0      # window [2,3,4]
    assert v.avg == 3.0
    assert v.global_avg == 2.5  # all four
    assert v.max == 4.0
    assert v.value == 4.0


def test_metric_logger_update_and_str():
    ml = MetricLogger()
    ml.update(loss=1.5, acc=0.5)
    assert "loss" in str(ml)
    assert ml.loss.value == 1.5
    out = list(ml.log_every(range(5), print_freq=10, header="t"))
    assert out == list(range(5))


def test_accuracy_topk():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.15, 0.05]])
    labels = jnp.asarray([1, 2])
    top1, top2 = accuracy_topk(logits, labels, topk=(1, 2))
    assert top1 == 50.0
    assert top2 == 50.0


def test_get_sha_runs():
    assert "sha" in get_sha()


# -------------------------------------------------------------------- HPO

def test_run_study_finds_good_params():
    def obj(trial):
        x = trial.suggest_float("x", -2.0, 2.0)
        for step in range(3):
            trial.report(-x * x + step * 0, step)
            if trial.should_prune():
                raise TrialPruned()
        return -x * x

    study = run_study(obj, n_trials=12, seed=0)
    assert study.best_value <= 0.0
    assert abs(study.best_trial.params["x"]) < 1.5
    assert len(study.trials) == 12


@pytest.mark.slow
def test_hpo_objective_end_to_end():
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.utils.optimization import objective
    from tests.synthetic_data import SyntheticLoader

    train = SyntheticLoader(16, 8, 16, 2, seed=0)
    base = dict(image_size=16, patch_size=8, num_heads=2, hidden_dim=16,
                num_classes=2)

    def obj(trial):
        return objective(
            trial, model_cls=ViT, base_args=base,
            train_loader=train, val_loader=train, num_epochs=1,
        )

    study = run_study(obj, n_trials=2, seed=1)
    assert len(study.trials) == 2
    assert any(v is not None for v in study.values)


def test_hpo_objective_threads_state_across_epochs():
    """Each HPO 'epoch' must continue from the previous epoch's state, not
    retrain epoch 1 from scratch (ADVICE r1)."""
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.utils.optimization import objective

    base = dict(image_size=16, patch_size=8, num_heads=2, hidden_dim=16,
                num_classes=2)
    seen_states = []

    def fake_fit(model, train_loader, test_loader, epochs, val_loader=None,
                 state=None, **kw):
        seen_states.append(state)
        tag = f"state{len(seen_states)}"
        return {"val_accuracy": [0.5], "final_state": tag}

    trial = Trial(_rng=np.random.RandomState(0))
    objective(trial, model_cls=ViT, base_args=base, train_loader=None,
              val_loader=None, num_epochs=3, fit_fn=fake_fit)
    assert seen_states == [None, "state1", "state2"]


def test_shard_for_process_single_host_identity():
    x = np.arange(10)[:, None]
    y = np.arange(10)
    sx, sy = ld.shard_for_process(x, y)
    assert len(sy) == 10  # single process: identity


def test_make_optimizer_accumulation():
    import optax
    from vision_transformers_tpu.training.optimizers import make_optimizer

    tx = make_optimizer("adam", 1e-2, accumulate_steps=2)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    # first micro-step: no update applied yet
    up1, state = tx.update(g, state, params)
    p1 = optax.apply_updates(params, up1)
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0)
    # second micro-step: accumulated update applies
    up2, state = tx.update(g, state, p1)
    p2 = optax.apply_updates(p1, up2)
    assert not np.allclose(np.asarray(p2["w"]), 1.0)
