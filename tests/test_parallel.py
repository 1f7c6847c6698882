"""Sharding / multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_transformers_tpu.models.image_classification import ViT
from vision_transformers_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    shard_params,
)
from vision_transformers_tpu.training.trainer import (
    TrainState,
    train_step_fn,
)

pytestmark = pytest.mark.slow  # full-model / multi-device integration tier


def _tiny_vit():
    return ViT(image_size=16, patch_size=4, num_layers=2, num_heads=4,
               hidden_dim=64, mlp_dim=128, num_classes=10)


def test_partition_rules():
    assert param_partition_spec("encoder/layer0/self_attention/qkv/kernel") \
        == P(None, "model")
    assert param_partition_spec("a/b/out/kernel") == P("model", None)
    assert param_partition_spec("x/mlp/fc1/bias") == P("model")
    assert param_partition_spec("x/mlp/fc2/kernel") == P("model", None)
    assert param_partition_spec("pos_embedding") == P()
    assert param_partition_spec("head/kernel") == P()


def test_shard_params_places_shards():
    mesh = make_mesh((4, 2), ("data", "model"))
    model = _tiny_vit()
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
    )
    params = shard_params(v["params"], mesh)
    qkv = params["encoder"]["encoder_layer_0"]["self_attention"]["qkv"]["kernel"]
    spec = qkv.sharding.spec
    assert spec == P(None, "model")
    # non-divisible or unmatched params stay replicated
    pos = params["encoder"]["pos_embedding"]
    assert pos.sharding.spec == P()


def test_dp_tp_train_step_matches_single_device():
    """The same train step on a 4x2 DP×TP mesh and on one device must agree
    (the sharding annotation changes layout, not math)."""
    model = _tiny_vit()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    y = jnp.arange(8, dtype=jnp.int32) % 10
    w = jnp.ones((8,), jnp.float32)
    rng = jax.random.PRNGKey(42)

    v = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x[:1],
    )

    def run(params, images, labels, weights):
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=optax.adam(1e-3))
        step = jax.jit(train_step_fn(model))
        new_state, loss_sum, correct, n = step(state, images, labels,
                                               weights, rng)
        return float(loss_sum), float(correct), jax.device_get(
            new_state.params)

    loss_1, correct_1, params_1 = run(v["params"], x, y, w)

    mesh = make_mesh((4, 2), ("data", "model"))
    sharded = shard_params(v["params"], mesh)
    xd = jax.device_put(x, batch_sharding(mesh))
    yd = jax.device_put(y, batch_sharding(mesh))
    wd = jax.device_put(w, batch_sharding(mesh))
    loss_8, correct_8, params_8 = run(sharded, xd, yd, wd)

    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    assert correct_1 == correct_8
    flat1 = jax.tree_util.tree_leaves(params_1)
    flat8 = jax.tree_util.tree_leaves(params_8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pure_dp_mesh_eval():
    from vision_transformers_tpu.training.trainer import eval_step_fn

    mesh = make_mesh(axis_names=("data",))
    model = _tiny_vit()
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
    )
    params = jax.device_put(v["params"], NamedSharding(mesh, P()))
    x = jax.device_put(jnp.ones((16, 16, 16, 3)), batch_sharding(mesh))
    y = jax.device_put(jnp.zeros((16,), jnp.int32), batch_sharding(mesh))
    w = jax.device_put(jnp.ones((16,)), batch_sharding(mesh))
    step = jax.jit(eval_step_fn(model))
    loss_sum, correct, n = step(params, x, y, w)
    assert float(n) == 16.0


def test_fit_with_dp_tp_mesh_end_to_end():
    """Public fit() API over a 4x2 DP x TP mesh: params auto-TP-sharded,
    training runs, metrics contract holds."""
    from tests.synthetic_data import SyntheticLoader
    from vision_transformers_tpu.training.trainer import fit

    mesh = make_mesh((4, 2), ("data", "model"))
    train = SyntheticLoader(32, 16, 16, 2, seed=9)
    model = _tiny_vit()
    hist = fit(model, train, train, epochs=2, mesh=mesh, lr=3e-3,
               verbose=False)
    assert len(hist["train_loss"]) == 2
    assert hist["train_loss"][1] < hist["train_loss"][0]
    # qkv kernels ended up sharded over 'model'
    qkv = hist["final_state"].params[
        "encoder"]["encoder_layer_0"]["self_attention"]["qkv"]["kernel"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_fit_mesh_with_steps_per_call():
    """mesh + steps_per_call > 1: the (k, B, ...) chunk must shard the batch
    axis over 'data', not the scan axis (ADVICE r1). k=3 with 4 data-way
    would raise at device_put if k were the sharded axis."""
    from tests.synthetic_data import SyntheticLoader
    from vision_transformers_tpu.training.trainer import fit

    mesh = make_mesh((4, 2), ("data", "model"))
    train = SyntheticLoader(48, 16, 16, 2, seed=3)
    model = _tiny_vit()
    hist = fit(model, train, train, epochs=2, mesh=mesh, lr=3e-3,
               steps_per_call=3, verbose=False)
    assert len(hist["train_loss"]) == 2
    assert hist["train_loss"][1] < hist["train_loss"][0]


def test_fit_one_shot_generator_train_loader():
    """A generator train loader: probed batch is replayed in epoch 1; a
    second epoch raises instead of silently training on nothing."""
    from tests.synthetic_data import SyntheticLoader
    from vision_transformers_tpu.training.trainer import fit

    base = SyntheticLoader(32, 16, 16, 2, seed=5)
    model = _tiny_vit()
    hist = fit(model, iter(base), base, epochs=1, lr=3e-3, verbose=False)
    assert len(hist["train_loss"]) == 1

    model2 = _tiny_vit()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="one-shot"):
        fit(model2, iter(base), base, epochs=2, lr=3e-3, verbose=False)


def test_fit_detection_mesh_dp_matches_single():
    """Data-parallel DETR training over the mesh 'data' axis matches the
    unsharded run (the reference vendored DDP/NCCL helpers for exactly
    this COCO stack, utils/coco/util/misc.py:363-429, but never wired
    them). On-device auction matching keeps the step one XLA program
    under sharding (no host callback)."""
    from tests.test_coco_utils import _write_tiny_coco
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.models.object_detection.criterion import (
        SetCriterion,
    )
    from vision_transformers_tpu.models.object_detection.matcher import (
        HungarianMatcher,
    )
    from vision_transformers_tpu.training.detection import (
        DetectionLoader, fit_detection,
    )
    from vision_transformers_tpu.utils.coco.build_coco import CocoDetection
    from vision_transformers_tpu.utils.coco import transforms as T
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as td:
        img_dir, ann_file = _write_tiny_coco(pathlib.Path(td), n_images=4)
        tr = T.Compose([
            T.RandomResize([32]),
            T.ToTensor(),
            T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
        ])

        def run(mesh):
            ds = CocoDetection(img_dir, ann_file, transforms=tr)
            loader = DetectionLoader(ds, batch_size=4, shuffle=False,
                                     size_bucket=32)
            model = Detr(num_classes=5, num_queries=8, hidden_dim=32,
                         nheads=4, num_encoder_layers=1,
                         num_decoder_layers=1, dim_feedforward=64,
                         dropout=0.0, backbone_norm="group")
            crit = SetCriterion(
                num_classes=5, matcher=HungarianMatcher(method="auction"))
            return fit_detection(
                model, loader, 1, num_classes=5, max_targets=8,
                criterion=crit, verbose=False, seed=0, mesh=mesh)

        ref = run(None)
        mesh = make_mesh((4, 2), ("data", "model"))
        got = run(mesh)
        assert np.isfinite(got["loss"][0])
        np.testing.assert_allclose(got["loss"][0], ref["loss"][0],
                                   rtol=1e-4, atol=1e-4)


def test_partition_rules_zoo():
    """r3: rules must cover Swin raw params, SRA names, DETR projections
    and FFN — not just the ViT Dense names (VERDICT r2 #4)."""
    from vision_transformers_tpu.parallel.mesh import attention_prefixes

    # Swin raw packed params (ops/windows.py)
    assert param_partition_spec("stage0_block0/attn/qkv_kernel") \
        == P(None, "model")
    assert param_partition_spec("stage0_block0/attn/qkv_bias") == P("model")
    # SRA (ops/sra.py): q/kv Dense; proj is context-dependent
    assert param_partition_spec("s/attn/q/kernel") == P(None, "model")
    assert param_partition_spec("s/attn/kv/kernel") == P(None, "model")
    # DETR FFN
    assert param_partition_spec("enc/layer0/linear1/kernel") \
        == P(None, "model")
    assert param_partition_spec("enc/layer0/linear2/kernel") \
        == P("model", None)
    # contextual out-proj: sharded only under a module owning q/kv/qkv
    paths = ["s/attn/q/kernel", "s/attn/proj/kernel",
             "s/patch_embed/proj/kernel", "w/qkv_kernel", "w/proj_kernel"]
    attn = attention_prefixes(paths)
    assert param_partition_spec("s/attn/proj/kernel", attn) \
        == P("model", None)
    assert param_partition_spec("s/patch_embed/proj/kernel", attn) == P()
    assert param_partition_spec("w/proj_kernel", attn) == P("model", None)


def _audit_model(model, sample_shape, **init_kwargs):
    from vision_transformers_tpu.parallel.mesh import audit_tp_coverage

    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros(sample_shape), **init_kwargs,
    )
    return audit_tp_coverage(v["params"], min_bytes=1 << 18)


def test_tp_coverage_audit_zoo():
    """Every ≥256 KB param in each family either TP-shards or is on the
    intended-replicated list — silent replication can't return."""
    from vision_transformers_tpu.models.image_classification import (
        PVT, SwinTransformer, TwinSVT, ViT,
    )

    assert _audit_model(
        ViT(image_size=32, patch_size=4, num_layers=2, num_heads=4,
            hidden_dim=256, mlp_dim=512, num_classes=100),
        (1, 32, 32, 3)) == []
    assert _audit_model(
        SwinTransformer(patch_size=[2, 2], embed_dim=96, depths=[1, 1],
                        num_heads=[3, 6], window_size=[4, 4],
                        num_classes=100),
        (1, 32, 32, 3)) == []
    assert _audit_model(
        PVT(image_size=32, patch_size=4, embed_dims=[64, 128],
            num_heads=[2, 4], depths=[1, 1], sr_ratios=[2, 1],
            num_stages=2, num_classes=100),
        (1, 32, 32, 3)) == []
    assert _audit_model(
        TwinSVT(img_size=32, num_classes=100), (1, 32, 32, 3)) == []


def test_tp_coverage_audit_detr():
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.parallel.mesh import audit_tp_coverage

    model = Detr(num_classes=5, num_queries=8, hidden_dim=64, nheads=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 dim_feedforward=128, dropout=0.0, backbone_norm="group")
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), jnp.ones((1, 64, 64), bool),
    )
    assert audit_tp_coverage(v["params"], min_bytes=1 << 18) == []


def _bitmatch_dp_tp(model, x, y):
    w = jnp.ones((x.shape[0],), jnp.float32)
    rng = jax.random.PRNGKey(42)
    v = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x[:1],
    )

    def run(params, images, labels, weights):
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=optax.adam(1e-3))
        step = jax.jit(train_step_fn(model))
        new_state, loss_sum, correct, n = step(state, images, labels,
                                               weights, rng)
        return float(loss_sum), jax.device_get(new_state.params)

    loss_1, params_1 = run(v["params"], x, y, w)
    mesh = make_mesh((4, 2), ("data", "model"))
    sharded = shard_params(v["params"], mesh)
    loss_8, params_8 = run(
        sharded,
        jax.device_put(x, batch_sharding(mesh)),
        jax.device_put(y, batch_sharding(mesh)),
        jax.device_put(w, batch_sharding(mesh)),
    )
    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_dp_tp_swin_matches_single_device():
    """Swin's raw qkv_kernel/proj_kernel params now TP-shard; the 4x2 mesh
    step must still bit-match the single-device step."""
    from vision_transformers_tpu.models.image_classification import (
        SwinTransformer,
    )

    model = SwinTransformer(patch_size=[2, 2], embed_dim=16,
                            depths=[1, 1], num_heads=[2, 4],
                            window_size=[2, 2], num_classes=10,
                            stochastic_depth_prob=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 3))
    y = jnp.arange(8, dtype=jnp.int32) % 10
    _bitmatch_dp_tp(model, x, y)


def test_dp_tp_pvt_matches_single_device():
    """SRA's q/kv/proj params TP-shard consistently (no more q-replicated /
    kv-sharded split)."""
    from vision_transformers_tpu.models.image_classification import PVT

    model = PVT(image_size=16, patch_size=4, embed_dims=[16, 32],
                num_heads=[2, 4], depths=[1, 1], sr_ratios=[2, 1],
                num_stages=2, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    y = jnp.arange(8, dtype=jnp.int32) % 10
    _bitmatch_dp_tp(model, x, y)
