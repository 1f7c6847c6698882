"""Golden regression freeze: fixed-seed output fingerprints per model.

Guards cross-round refactors — any unintended numeric change to an op or a
model (init scheme, block wiring, attention math) shifts these statistics.
Values were generated on CPU fp32 (conftest forces CPU, so these are
platform-stable). Intentional behavior changes should regenerate them (see
git history for the generation snippet).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.image_classification import (
    ViT, CPEViT, CPVT, CPVTGAP, DeiT, PVT, SwinTransformer, SwinTransformerV2,
    T2T_ViT, TNT, TwinSVT,
)

_SMALL = dict(num_layers=2, num_heads=2, hidden_dim=32, mlp_dim=64,
              dropout=0.1, attention_dropout=0.1, num_classes=7,
              image_size=32, patch_size=4)


def _models():
    return {
        "ViT": ViT(**_SMALL),
        "CPEViT": CPEViT(**_SMALL),
        "CPVT": CPVT(**_SMALL),
        "CPVTGAP": CPVTGAP(**_SMALL),
        "DeiT": DeiT(image_size=32, patch_size=8, num_layers=2, num_heads=2,
                     embed_dim=32, mlp_ratio=2.0, num_classes=7),
        "PVT": PVT(image_size=32, patch_size=4, embed_dims=[16, 32],
                   num_heads=[1, 2], mlp_ratios=[2, 2], depths=[1, 1],
                   sr_ratios=[2, 1], num_stages=2, num_classes=7),
        "SwinTransformer": SwinTransformer(
            patch_size=[2, 2], embed_dim=16, depths=[1, 1], num_heads=[2, 2],
            window_size=[4, 4], num_classes=7),
        "SwinTransformerV2": SwinTransformerV2(
            patch_size=[2, 2], embed_dim=16, depths=[1, 1], num_heads=[2, 2],
            window_size=[4, 4], num_classes=7),
        "T2T_ViT": T2T_ViT(image_size=32, patch_size=4, num_layers=2,
                           num_heads=2, hidden_dim=32, mlp_dim=64,
                           num_classes=7, token_dim=16),
        "TNT": TNT(image_size=32, patch_size=8, outer_dim=32, inner_dim=8,
                   num_layers=2, outer_num_heads=2, inner_num_heads=1,
                   num_classes=7),
        "TwinSVT": TwinSVT(img_size=32, patch_size=4, embed_dims=[16, 32],
                           num_heads=[1, 2], mlp_ratios=[2, 2], depths=[2, 2],
                           sr_ratios=[2, 1], wss=[7, 7], num_classes=7),
    }


# (sum, abs-sum, std) of the fixed-seed forward on the linspace input.
# Models with zero-init heads are fingerprinted on forward_features.
GOLDEN_LOGITS = {
    "PVT": (-0.740849, 1.179668, 0.084750),
    "SwinTransformer": (0.068240, 0.729458, 0.070241),
    "SwinTransformerV2": (-0.756190, 1.191905, 0.077017),
    "TNT": (-0.983049, 1.134418, 0.076253),
    "TwinSVT": (-0.534589, 1.369516, 0.102936),
}
GOLDEN_FEATURES = {
    "ViT": (-0.00001, 3401.78687, 1.00000),
    "CPEViT": (-0.00000, 3274.68530, 1.00000),
    "CPVT": (0.00001, 2724.21997, 1.00000),
    "CPVTGAP": (0.00001, 2724.21997, 1.00000),
    "DeiT": (-0.00000, 931.95380, 1.00000),
    "T2T_ViT": (-0.00000, 262.90607, 1.00000),
}


def _fingerprint(model, method=None):
    shape = (2, 32, 32, 3)
    x = jnp.asarray(
        np.linspace(0, 1, int(np.prod(shape)), dtype=np.float32).reshape(shape))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    y = model.apply(v, x, **({"method": method} if method else {}))
    return float(jnp.sum(y)), float(jnp.sum(jnp.abs(y))), float(y.std())


@pytest.mark.parametrize("name", sorted(GOLDEN_LOGITS))
def test_golden_logits(name):
    got = _fingerprint(_models()[name])
    np.testing.assert_allclose(got, GOLDEN_LOGITS[name], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("name", sorted(GOLDEN_FEATURES))
def test_golden_features(name):
    got = _fingerprint(_models()[name], method="forward_features")
    np.testing.assert_allclose(
        got, GOLDEN_FEATURES[name], rtol=2e-4, atol=2e-4)
