"""Golden parity: SelfAttention vs torch.nn.MultiheadAttention.

Parity is same-math-same-weights (SURVEY.md §7): load identical weights into
both frameworks and compare outputs in fp32 — this pins our module to the
exact semantics the reference relies on (vanilla_vit.py:67,77).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from vision_transformers_tpu.ops.attention import SelfAttention


def test_self_attention_matches_torch_mha():
    b, s, dim, heads = 2, 65, 256, 4
    rng = np.random.RandomState(0)
    x = rng.randn(b, s, dim).astype(np.float32)

    mha = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
    mha.eval()
    with torch.no_grad():
        t_out, _ = mha(torch.tensor(x), torch.tensor(x), torch.tensor(x),
                       need_weights=False)

    model = SelfAttention(hidden_dim=dim, num_heads=heads)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    # torch packs QKV as rows of in_proj_weight (3D, D); ours is a Dense
    # kernel of shape (D, 3D) = in_proj_weight.T.
    in_w = mha.in_proj_weight.detach().numpy()
    in_b = mha.in_proj_bias.detach().numpy()
    out_w = mha.out_proj.weight.detach().numpy()
    out_b = mha.out_proj.bias.detach().numpy()

    params = {
        "qkv": {"kernel": jnp.asarray(in_w.T), "bias": jnp.asarray(in_b)},
        "out": {"kernel": jnp.asarray(out_w.T), "bias": jnp.asarray(out_b)},
    }
    j_out = model.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=1e-5
    )
