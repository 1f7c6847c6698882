"""Coverage for the remaining small ops: sincos pos-embed, DropPath
statistics, dtype policy, patchify layout."""

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.core.dtypes import Policy, default_policy
from vision_transformers_tpu.ops.layers import DropPath
from vision_transformers_tpu.ops.patch_embed import patchify
from vision_transformers_tpu.ops.posenc import sincos_pos_embed_2d


def test_sincos_pos_embed_properties():
    emb = sincos_pos_embed_2d(32, 4, 6)
    assert emb.shape == (24, 32)
    # values bounded by sin/cos range
    assert np.abs(emb).max() <= 1.0 + 1e-6
    # distinct positions get distinct embeddings
    assert len(np.unique(emb.round(6), axis=0)) == 24
    # translation structure: rows sharing a grid row share the H half
    e = emb.reshape(4, 6, 32)
    np.testing.assert_allclose(e[1, 0, :16], e[1, 3, :16], atol=1e-6)
    np.testing.assert_allclose(e[0, 2, 16:], e[3, 2, 16:], atol=1e-6)


def test_drop_path_statistics_and_eval_identity():
    dp = DropPath(rate=0.5)
    x = jnp.ones((512, 4))
    v = dp.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x)
    # eval: exact identity
    np.testing.assert_array_equal(np.asarray(dp.apply(v, x)), np.asarray(x))
    # train: rows are all-zero or all-2.0 (1/keep), mean ≈ 1
    y = np.asarray(dp.apply(v, x, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(2)}))
    rows = set(np.unique(y).tolist())
    assert rows <= {0.0, 2.0}
    assert abs(y.mean() - 1.0) < 0.15


def test_patchify_layout():
    # 4x4 image, 2x2 patches: patch 0 must contain the top-left 2x2 block
    x = jnp.arange(4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    p = patchify(x, 2)
    assert p.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(p[0, 0]), [0, 1, 4, 5])
    np.testing.assert_allclose(np.asarray(p[0, 3]), [10, 11, 14, 15])


def test_default_policy_matches_backend():
    pol = default_policy()
    assert isinstance(pol, Policy)
    # fp32 params always
    assert pol.param_dtype == jnp.float32
    tree = {"w": jnp.ones(3, jnp.float32), "i": jnp.ones(3, jnp.int32)}
    cast = pol.cast_to_compute(tree)
    assert cast["w"].dtype == pol.compute_dtype
    assert cast["i"].dtype == jnp.int32  # non-float untouched
