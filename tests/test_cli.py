import numpy as np
import pytest

from vision_transformers_tpu import cli

pytestmark = pytest.mark.slow  # full-model / multi-device integration tier


def test_model_family_mapping():
    from vision_transformers_tpu.models import image_classification as ic

    expected = {
        "vit_tiny_cifar100": ic.ViT,
        "swin_tiny_cifar100": ic.SwinTransformer,
        "deit_tiny_cifar100": ic.DeiT,
        "cpevit_cifar100": ic.CPEViT,
        "cpvt_cifar100": ic.CPVT,
        "cpvtgap_cifar100": ic.CPVTGAP,
        "pvt_cifar100": ic.PVT,
        "t2t_cifar100": ic.T2T_ViT,
        "tnt_cifar100": ic.TNT,
        "twins_cifar100": ic.TwinSVT,
    }
    for name, klass in expected.items():
        assert cli._model_for(name) is klass


def test_unknown_family_exits():
    with pytest.raises(SystemExit):
        cli._model_for("nope_cifar100")


def _make_synthetic_cifar100(tmp_path):
    """Miniature pickle CIFAR-100 tree under tmp_path (64 train / 32 test)."""
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


def test_cli_end_to_end_on_synthetic_cifar(tmp_path, capsys):
    """Full CLI run on a miniature CIFAR tree: 1 epoch, tiny batch."""
    _make_synthetic_cifar100(tmp_path)
    cli.main([
        "vit_tiny_cifar100", "--epochs", "1", "--batch-size", "32",
        "--val-split", "0.25", "--data-root", str(tmp_path), "--lr", "1e-3",
    ])
    out = capsys.readouterr().out
    assert "ViT" in out  # model printed (reference __main__ parity)


def test_fit_checkpoints_when_configured(tmp_path):
    from tests.synthetic_data import SyntheticLoader
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.training.trainer import fit
    from vision_transformers_tpu.utils.checkpoint import available_checkpoints

    train = SyntheticLoader(16, 8, 16, 2, seed=0)
    model = ViT(image_size=16, patch_size=8, num_layers=1, num_heads=2,
                hidden_dim=16, mlp_dim=16, num_classes=2)
    fit(model, train, train, epochs=2, verbose=False,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=1)
    assert available_checkpoints(str(tmp_path / "ck")) == [1, 2]


def test_cli_export_serving_artifact(tmp_path):
    """--export writes a loadable AOT artifact after training (and
    --export-int8 quantizes it)."""
    _make_synthetic_cifar100(tmp_path)
    art = tmp_path / "artifact"
    cli.main([
        "vit_tiny_cifar100", "--epochs", "1", "--batch-size", "32",
        "--val-split", "0.25", "--data-root", str(tmp_path), "--lr", "1e-3",
        "--export", str(art), "--export-buckets", "2,4", "--export-int8",
    ])
    from vision_transformers_tpu import serving

    clf = serving.load_classifier(str(art))
    assert clf.manifest["buckets"] == [2, 4]
    out = clf.predict(np.zeros((3, 32, 32, 3), np.float32))
    assert out.shape == (3, 100)
