import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.image_classification.cpe_vit import CPEViT
from vision_transformers_tpu.models.image_classification.cpvt import CPVT, CPVTGAP
from vision_transformers_tpu.ops.posenc import ConditionalPositionalEncoding
from vision_transformers_tpu.utils.args import get_args

torch = pytest.importorskip("torch")


def test_cpe_matches_torch_depthwise_conv():
    """CPE == depthwise 3x3 conv on the token grid, CLS untouched
    (reference cpvt.py:16-30)."""
    b, side, d = 2, 4, 8
    s = side * side + 1
    rng = np.random.RandomState(0)
    tokens = rng.randn(b, s, d).astype(np.float32)

    cpe = ConditionalPositionalEncoding()
    params = cpe.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    out = cpe.apply(params, jnp.asarray(tokens))

    # torch oracle with the same weights (flax HWIO -> torch OIHW, depthwise)
    kern = np.asarray(params["params"]["conv"]["kernel"])  # (3,3,1,d)
    bias = np.asarray(params["params"]["conv"]["bias"])
    conv = torch.nn.Conv2d(d, d, 3, padding=1, groups=d)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(kern.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.tensor(bias))
        grid = torch.tensor(
            tokens[:, 1:, :].reshape(b, side, side, d).transpose(0, 3, 1, 2)
        )
        ref_grid = conv(grid).permute(0, 2, 3, 1).reshape(b, side * side, d)

    np.testing.assert_allclose(
        np.asarray(out[:, 1:, :]), ref_grid.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out[:, :1, :]), tokens[:, :1, :])


def test_cpe_rejects_non_square_grid():
    cpe = ConditionalPositionalEncoding()
    with pytest.raises(AssertionError):
        cpe.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)))  # 7 tokens


@pytest.mark.parametrize("cls", [CPEViT, CPVT, CPVTGAP])
def test_cpvt_family_forward(cls):
    args = get_args("vit_tiny_cifar100")
    args.update(num_layers=2, hidden_dim=32, mlp_dim=64, num_heads=2)
    model = cls(**args)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y = model.apply(variables, x)
    assert y.shape == (2, 100)


def test_cpvt_has_no_learned_pos_embedding():
    """CPVT removes the absolute pos-embed (cpvt.py:99-115)."""
    args = get_args("vit_tiny_cifar100")
    args.update(num_layers=1, hidden_dim=32, mlp_dim=32, num_heads=2)
    model = CPVT(**args)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.ones((1, 32, 32, 3)),
    )
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("pos_embedding" in n and "conv" not in n for n in names)
    # but every block has a PEG conv
    assert sum("peg" in n and "kernel" in n for n in names) == 1


def test_cpvt_gap_head_uses_patch_tokens_not_cls():
    """Intended CPVT-GAP behavior (fixes reference defect §2.9.6)."""
    args = get_args("vit_tiny_cifar100")
    args.update(num_layers=1, hidden_dim=32, mlp_dim=32, num_heads=2)
    model = CPVTGAP(**args)
    x = jnp.ones((1, 32, 32, 3))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    feats = model.apply(v, x, method="forward_features")
    logits = model.apply(v, x)
    # recompute: head over mean of patch tokens
    kernel = v["params"]["head"]["kernel"]
    bias = v["params"]["head"]["bias"]
    expect = jnp.mean(feats[:, 1:], axis=1) @ kernel + bias
    np.testing.assert_allclose(np.asarray(logits), np.asarray(expect), atol=1e-6)
