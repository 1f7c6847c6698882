"""int8 w8a8 quantized serving path (ops/quant.py + serving.quantize_classifier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu import serving
from vision_transformers_tpu.models.image_classification import ViT
from vision_transformers_tpu.ops import quant

SHAPE = (32, 32, 3)


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_int8_matmul_close_to_fp():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128), jnp.float32)
    w = jnp.asarray(rng.randn(128, 96) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(96) * 0.1, jnp.float32)
    kq, scale = quant.quantize_kernel(w)
    got = quant.int8_matmul(x, kq, scale, b)
    want = x @ w + b
    assert _rel_err(got, want) < 0.01  # two int8 roundings only


def test_int8_matmul_zero_rows_exact():
    w = jnp.ones((8, 4), jnp.float32)
    kq, scale = quant.quantize_kernel(w)
    out = quant.int8_matmul(jnp.zeros((3, 8)), kq, scale, None)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_quantize_dense_params_structure_matches_module_init():
    dense = {"kernel": jnp.ones((16, 8)), "bias": jnp.zeros((8,))}
    transformed = quant.quantize_dense_params(dense)
    module_params = quant.QuantDense(8).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    assert set(transformed) == set(module_params)
    for k in transformed:
        assert transformed[k].shape == module_params[k].shape, k
        assert transformed[k].dtype == module_params[k].dtype, k


@pytest.fixture(scope="module")
def vit_and_params():
    model = ViT(image_size=32, patch_size=8, num_layers=2, num_heads=2,
                hidden_dim=64, mlp_dim=128, dropout=0.0,
                attention_dropout=0.0, num_classes=10)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *SHAPE)))["params"]
    return model, params


def test_quantized_vit_params_match_quant_init(vit_and_params):
    model, params = vit_and_params
    qmodel, qparams = serving.quantize_classifier(model, params)
    ref = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, *SHAPE)))
    )["params"]
    got_paths = {jax.tree_util.keystr(p): (v.shape, jnp.asarray(v).dtype)
                 for p, v in jax.tree_util.tree_flatten_with_path(qparams)[0]}
    want_paths = {jax.tree_util.keystr(p): (v.shape, v.dtype)
                  for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    assert got_paths == want_paths


def test_quantized_vit_features_close(vit_and_params):
    model, params = vit_and_params
    qmodel, qparams = serving.quantize_classifier(model, params)
    x = jnp.asarray(np.random.RandomState(1).randn(4, *SHAPE), jnp.float32)
    # zero-init head makes logits useless at init — compare features
    want = model.apply({"params": params}, x, deterministic=True,
                       method="forward_features")
    got = qmodel.apply({"params": qparams}, x, deterministic=True,
                       method="forward_features")
    assert _rel_err(got, want) < 0.05


def test_unsupported_model_raises():
    class NoQuant:
        pass

    with pytest.raises(ValueError, match="quant8"):
        serving.quantize_classifier(NoQuant(), {})


def test_quantized_export_round_trip(vit_and_params, tmp_path):
    model, params = vit_and_params
    qmodel, qparams = serving.quantize_classifier(model, params)
    out = str(tmp_path)
    serving.export_classifier(qmodel, qparams, SHAPE, out, buckets=(4,))
    clf = serving.load_classifier(out)
    x = np.random.RandomState(2).randn(4, *SHAPE).astype(np.float32)
    want = qmodel.apply({"params": qparams}, jnp.asarray(x),
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(clf.predict(x)), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_trained_model_int8_accuracy_parity():
    """The production claim: PTQ int8 serves a TRAINED model with the same
    accuracy (a random-weights logit check can't show this)."""
    import sys

    sys.path.insert(0, "tests")
    from synthetic_data import SyntheticLoader

    from vision_transformers_tpu.training.trainer import fit

    model = ViT(image_size=32, patch_size=8, num_layers=2, num_heads=2,
                hidden_dim=64, mlp_dim=128, dropout=0.0,
                attention_dropout=0.0, num_classes=4)
    # NOTE each SyntheticLoader seed draws its own class->color mapping, so
    # a different-seed "test" set is a different task; precision parity is
    # about the same inputs anyway, so evaluate both on the train set.
    train = SyntheticLoader(num_samples=256, batch_size=32, seed=0)
    hist = fit(model, train, train, 8, lr=1e-3, verbose=False, seed=0)
    params = hist["final_state"].params
    assert hist["train_accuracy"][-1] > 0.85  # trained enough to matter

    qmodel, qparams = serving.quantize_classifier(model, params)

    def accuracy(m, p):
        correct = total = 0
        for xb, yb in train:
            logits = m.apply(
                {"params": p},
                (jnp.asarray(xb, jnp.float32) / 255.0 - 0.5) / 0.25,
                deterministic=True)
            correct += int((np.asarray(logits).argmax(-1) == yb).sum())
            total += len(yb)
        return correct / total

    fp_acc = accuracy(model, params)
    q8_acc = accuracy(qmodel, qparams)
    assert q8_acc >= fp_acc - 0.02, (fp_acc, q8_acc)
