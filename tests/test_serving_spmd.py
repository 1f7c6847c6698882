"""SPMD (multi-device data-parallel) serving export on the 8-device CPU
mesh the conftest provisions — the multi-chip deployment path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

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
def mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("data",))


@pytest.fixture(scope="module")
def artifact(model_and_params, mesh, tmp_path_factory):
    model, params = model_and_params
    out = str(tmp_path_factory.mktemp("spmd_artifact"))
    serving.export_classifier(model, params, SHAPE, out,
                              buckets=(8, 16), mesh=mesh)
    return out


def test_indivisible_bucket_rejected(model_and_params, mesh, tmp_path):
    model, params = model_and_params
    with pytest.raises(ValueError, match="not divisible"):
        serving.export_classifier(model, params, SHAPE, str(tmp_path),
                                  buckets=(8, 12), mesh=mesh)


def test_manifest_records_devices(artifact):
    import json
    import os

    with open(os.path.join(artifact, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["nr_devices"] == 8
    assert manifest["data_axis"] == "data"


def test_load_without_mesh_fails(artifact):
    with pytest.raises(RuntimeError, match="8-device mesh"):
        serving.load_classifier(artifact)


def test_spmd_predict_parity(artifact, model_and_params, mesh):
    model, params = model_and_params
    clf = serving.load_classifier(artifact, mesh=mesh)
    rng = np.random.RandomState(0)
    for n in (5, 8, 16, 20):  # pad→8, exact, exact, chunk 16 + pad(4→8)
        x = rng.randn(n, *SHAPE).astype(np.float32)
        got = np.asarray(clf.predict(x))
        want = np.asarray(model.apply(
            {"params": params}, jnp.asarray(x), deterministic=True))
        assert got.shape == (n, 10)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_int8_spmd_export_composes(model_and_params, mesh, tmp_path):
    """PTQ int8 and mesh-sharded export together: the int8 dot_general
    must partition under GSPMD like the fp matmul it replaces."""
    model, params = model_and_params
    qmodel, qparams = serving.quantize_classifier(model, params)
    out = str(tmp_path)
    serving.export_classifier(qmodel, qparams, SHAPE, out,
                              buckets=(8,), mesh=mesh)
    clf = serving.load_classifier(out, mesh=mesh)
    x = np.random.RandomState(3).randn(8, *SHAPE).astype(np.float32)
    want = np.asarray(qmodel.apply({"params": qparams}, jnp.asarray(x),
                                   deterministic=True))
    np.testing.assert_allclose(np.asarray(clf.predict(x)), want,
                               rtol=2e-5, atol=2e-5)
