"""Golden-logit parity: full encoder block vs the reference's torch math.

Builds the exact reference EncoderBlock computation (vanilla_vit.py:73-83:
pre-LN → packed-QKV MHA → residual; pre-LN → GELU MLP → residual) in torch,
loads the SAME weights into our flax EncoderBlock, and compares outputs in
fp32. This is the "same-math-same-weights" parity definition from
SURVEY.md §7.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from vision_transformers_tpu.models.image_classification.vanilla_vit import (
    EncoderBlock,
)


class TorchRefBlock(torch.nn.Module):
    """The reference encoder block assembled from torch primitives."""

    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = torch.nn.Linear(dim, mlp_dim)
        self.fc2 = torch.nn.Linear(mlp_dim, dim)

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False)
        x = x + y
        y = self.ln_2(x)
        y = self.fc2(torch.nn.functional.gelu(self.fc1(y)))
        return x + y


def test_encoder_block_matches_torch():
    dim, heads, mlp_dim, b, s = 256, 4, 512, 2, 65
    tb = TorchRefBlock(dim, heads, mlp_dim).eval()

    rng = np.random.RandomState(0)
    x = rng.randn(b, s, dim).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.tensor(x)).numpy()

    block = EncoderBlock(num_heads=heads, hidden_dim=dim, mlp_dim=mlp_dim)
    v = block.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))

    def t(p):  # torch weight → numpy
        return p.detach().numpy()

    params = {
        "ln_1": {"scale": t(tb.ln_1.weight), "bias": t(tb.ln_1.bias)},
        "ln_2": {"scale": t(tb.ln_2.weight), "bias": t(tb.ln_2.bias)},
        "self_attention": {
            "qkv": {"kernel": t(tb.attn.in_proj_weight).T,
                    "bias": t(tb.attn.in_proj_bias)},
            "out": {"kernel": t(tb.attn.out_proj.weight).T,
                    "bias": t(tb.attn.out_proj.bias)},
        },
        "mlp": {
            "fc1": {"kernel": t(tb.fc1.weight).T, "bias": t(tb.fc1.bias)},
            "fc2": {"kernel": t(tb.fc2.weight).T, "bias": t(tb.fc2.bias)},
        },
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = block.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_gelu_variant_matches_torch():
    """flax nn.gelu default is tanh-approximate; torch default is exact —
    confirm our MLP path uses the variant that matches torch within fp32
    tolerance at these magnitudes (guards against silent divergence)."""
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    theirs = torch.nn.functional.gelu(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
