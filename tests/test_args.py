import pytest

from vision_transformers_tpu.utils.args import get_args


def test_vit_tiny_cifar100_matches_reference_values():
    args = get_args("vit_tiny_cifar100")
    assert args == {
        "image_size": 32, "patch_size": 4, "num_layers": 7, "num_heads": 4,
        "hidden_dim": 256, "mlp_dim": 512, "dropout": 0.1,
        "attention_dropout": 0.1, "num_classes": 100,
    }


def test_dataset_suffix_sets_num_classes():
    assert get_args("vit_tiny_cifar10")["num_classes"] == 10
    assert get_args("swin_tiny_cifar100")["num_classes"] == 100


def test_swin_tiny_matches_reference_values():
    args = get_args("swin_tiny_cifar100")
    assert args["embed_dim"] == 96
    assert args["depths"] == [2, 2, 6, 2]
    assert args["num_heads"] == [3, 6, 12, 24]
    assert args["window_size"] == [4, 4]
    assert args["stochastic_depth_prob"] == 0.2


def test_deit_distil_flag():
    assert get_args("deit_tinydistil_cifar100")["distilled_training"] is True
    assert get_args("deit_tiny_cifar100")["distilled_training"] is False


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_args("nope_cifar100")


def test_unknown_dataset_raises():
    with pytest.raises(ValueError):
        get_args("vit_tiny_mnist")


def test_mutating_result_does_not_poison_registry():
    a = get_args("vit_tiny_cifar100")
    a["hidden_dim"] = 1
    assert get_args("vit_tiny_cifar100")["hidden_dim"] == 256
