"""AOT export / serving round-trip (serving.py).

The reference has no deployment path at all (every __main__ ends at
training); this is the production-serving subsystem: export → load →
padded/chunked predict → micro-batching, all on the CPU backend the
conftest pins.
"""

import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu import serving
from vision_transformers_tpu.models.image_classification import ViT

SHAPE = (32, 32, 3)


@pytest.fixture(scope="module")
def model_and_params():
    model = ViT(image_size=32, patch_size=8, num_layers=2, num_heads=2,
                hidden_dim=64, mlp_dim=128, dropout=0.0,
                attention_dropout=0.0, num_classes=10)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *SHAPE)))
    return model, variables["params"]


@pytest.fixture(scope="module")
def artifact(model_and_params, tmp_path_factory):
    model, params = model_and_params
    out = str(tmp_path_factory.mktemp("artifact"))
    manifest = serving.export_classifier(
        model, params, SHAPE, out, buckets=(2, 4))
    return out, manifest


def _reference_logits(model_and_params, x):
    model, params = model_and_params
    return model.apply({"params": params}, jnp.asarray(x, jnp.float32),
                       deterministic=True)


def test_manifest_contents(artifact):
    out, manifest = artifact
    assert manifest["buckets"] == [2, 4]
    assert manifest["input_shape"] == list(SHAPE)
    assert "cpu" in manifest["platforms"]
    for name in list(manifest["files"].values()) + [manifest["params_file"]]:
        assert os.path.exists(os.path.join(out, name))


def test_round_trip_exact_bucket(artifact, model_and_params):
    clf = serving.load_classifier(artifact[0])
    x = np.random.RandomState(0).randn(4, *SHAPE).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(clf.predict(x)),
        np.asarray(_reference_logits(model_and_params, x)),
        rtol=2e-5, atol=2e-5)


def test_padding_and_chunking(artifact, model_and_params):
    clf = serving.load_classifier(artifact[0])
    rng = np.random.RandomState(1)
    for n in (1, 3, 4, 9):  # pad→2, pad→4, exact, chunk 4+4+pad(1→2)
        x = rng.randn(n, *SHAPE).astype(np.float32)
        got = np.asarray(clf.predict(x))
        assert got.shape == (n, 10)
        np.testing.assert_allclose(
            got, np.asarray(_reference_logits(model_and_params, x)),
            rtol=2e-5, atol=2e-5)


def test_single_image_convenience(artifact):
    clf = serving.load_classifier(artifact[0])
    out = clf.predict(np.zeros(SHAPE, np.float32))
    assert out.shape == (1, 10)


def test_bad_shape_raises(artifact):
    clf = serving.load_classifier(artifact[0])
    with pytest.raises(ValueError, match="expected"):
        clf.predict(np.zeros((2, 16, 16, 3), np.float32))


def test_platform_mismatch_fails_loudly(artifact, tmp_path):
    out, _ = artifact
    import shutil

    clone = tmp_path / "clone"
    shutil.copytree(out, clone)
    mpath = clone / "manifest.json"
    manifest = json.loads(mpath.read_text())
    manifest["platforms"] = ["tpu"]
    mpath.write_text(json.dumps(manifest))
    with pytest.raises(RuntimeError, match="re-export on the serving"):
        serving.load_classifier(str(clone))


def test_warmup_runs_every_bucket(artifact):
    clf = serving.load_classifier(artifact[0])
    clf.warmup()  # no raise = every bucket compiled and ran


def test_microbatcher_matches_direct(artifact, model_and_params):
    clf = serving.load_classifier(artifact[0])
    mb = serving.Microbatcher(clf, max_batch=4, max_wait_ms=20.0)
    rng = np.random.RandomState(2)
    images = [rng.randn(*SHAPE).astype(np.float32) for _ in range(6)]
    results = [None] * 6

    def worker(i):
        results[i] = mb.submit(images[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    direct = np.asarray(_reference_logits(model_and_params, np.stack(images)))
    for i in range(6):
        np.testing.assert_allclose(results[i], direct[i],
                                   rtol=2e-5, atol=2e-5)


def test_microbatcher_closed_rejects(artifact):
    clf = serving.load_classifier(artifact[0])
    mb = serving.Microbatcher(clf)
    mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(np.zeros(SHAPE, np.float32))


@pytest.mark.parametrize("family", ["swin", "pvt"])
def test_serving_covers_other_families(family, tmp_path):
    """export_classifier is model-agnostic: windowed (Swin) and pyramid
    (PVT) families export/load/serve with the same API."""
    if family == "swin":
        from vision_transformers_tpu.models.image_classification import (
            SwinTransformer,
        )

        model = SwinTransformer(
            image_size=32, patch_size=[2, 2], embed_dim=32,
            depths=[1, 1], num_heads=[2, 4], window_size=[4, 4],
            num_classes=10)
    else:
        from vision_transformers_tpu.models.image_classification import PVT

        model = PVT(image_size=32, patch_size=4, num_classes=10,
                    embed_dims=[16, 32], num_heads=[1, 2], depths=[1, 1],
                    mlp_ratios=[2, 2], sr_ratios=[4, 2], num_stages=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *SHAPE), jnp.float32))
    params = variables["params"]
    out = str(tmp_path)
    serving.export_classifier(model, params, SHAPE, out, buckets=(2,))
    clf = serving.load_classifier(out)
    x = np.random.RandomState(0).randn(2, *SHAPE).astype(np.float32)
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  deterministic=True))
    np.testing.assert_allclose(np.asarray(clf.predict(x)), want,
                               rtol=2e-5, atol=2e-5)
