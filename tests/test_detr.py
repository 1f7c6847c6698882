import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.object_detection import (
    Detr,
    HungarianMatcher,
    SetCriterion,
    SinePositionalEncoding,
    AbsolutePositionalEncoding,
    Transformer,
    prepare_targets,
)


@pytest.mark.slow
def test_transformer_shapes_and_masking():
    d, heads, q = 32, 4, 10
    tr = Transformer(d_model=d, nhead=heads, num_encoder_layers=2,
                     num_decoder_layers=2, dim_feedforward=64,
                     return_intermediate_dec=True)
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, d))
    pos = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6, d))
    mask = jnp.zeros((2, 4, 6), bool).at[:, :, 4:].set(True)  # pad right
    query = jax.random.normal(jax.random.PRNGKey(2), (q, d))
    v = tr.init({"params": jax.random.PRNGKey(3)}, src, mask, query, pos)
    hs, memory = tr.apply(v, src, mask, query, pos)
    assert hs.shape == (2, 2, q, d)  # (layers, B, Q, D) intermediate
    assert memory.shape == (2, 4, 6, d)

    # padded keys must not influence the decoder output
    src2 = src.at[:, :, 4:, :].set(123.0)
    hs2, _ = tr.apply(v, src2, mask, query, pos)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs2), atol=1e-4)


def test_sine_positional_encoding_mask_aware():
    pe = SinePositionalEncoding(num_pos_feats=16)
    x = jnp.zeros((1, 4, 4, 8))
    mask = jnp.zeros((1, 4, 4), bool)
    v = pe.init(jax.random.PRNGKey(0), x, mask)
    pos = pe.apply(v, x, mask)
    assert pos.shape == (1, 4, 4, 32)
    # half-padded map: positions in the valid region are normalized to the
    # valid extent, so they differ from the full-map encoding
    mask2 = jnp.zeros((1, 4, 4), bool).at[:, :, 2:].set(True)
    pos2 = pe.apply(v, x, mask2)
    assert not np.allclose(np.asarray(pos[:, :, :2]), np.asarray(pos2[:, :, :2]))


def test_learned_positional_encoding_shape():
    pe = AbsolutePositionalEncoding(positional_features=16)
    x = jnp.zeros((2, 5, 7, 8))
    v = pe.init(jax.random.PRNGKey(0), x)
    pos = pe.apply(v, x)
    assert pos.shape == (2, 5, 7, 32)


def test_prepare_targets_padding():
    targets = [
        {"labels": np.asarray([1, 2]), "boxes": np.asarray(
            [[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1]], np.float32)},
        {"labels": np.asarray([3]), "boxes": np.asarray(
            [[0.7, 0.7, 0.2, 0.2]], np.float32)},
    ]
    labels, boxes, valid = prepare_targets(targets, max_targets=4, num_classes=10)
    assert labels.shape == (2, 4)
    assert int(valid.sum()) == 3
    assert int(labels[0, 2]) == 10  # padded slot = no-object class


def test_hungarian_matcher_obvious_assignment():
    """Queries whose boxes coincide with targets must be matched to them."""
    q, t, c = 6, 2, 5
    boxes_t = jnp.asarray([[[0.2, 0.2, 0.1, 0.1], [0.8, 0.8, 0.1, 0.1],
                            [0, 0, 0, 0], [0, 0, 0, 0]]])
    labels_t = jnp.asarray([[1, 2, c, c]], jnp.int32)
    valid = jnp.asarray([[True, True, False, False]])

    pred_boxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.5, 0.5]]), (q, 1))[None]
    pred_boxes = pred_boxes.at[0, 3].set(jnp.asarray([0.8, 0.8, 0.1, 0.1]))
    pred_boxes = pred_boxes.at[0, 5].set(jnp.asarray([0.2, 0.2, 0.1, 0.1]))
    logits = jnp.zeros((1, q, c + 1))
    logits = logits.at[0, 3, 2].set(5.0)  # query 3 confident class 2
    logits = logits.at[0, 5, 1].set(5.0)  # query 5 confident class 1

    src_idx = HungarianMatcher()(
        {"pred_logits": logits, "pred_boxes": pred_boxes},
        labels_t, boxes_t, valid)
    assert int(src_idx[0, 0]) == 5  # target 0 ↔ query 5
    assert int(src_idx[0, 1]) == 3  # target 1 ↔ query 3
    assert int(src_idx[0, 2]) == -1


def test_set_criterion_perfect_predictions_have_low_loss():
    q, c = 4, 3
    boxes_t = jnp.asarray([[[0.4, 0.4, 0.2, 0.2], [0, 0, 0, 0]]])
    labels_t = jnp.asarray([[1, c]], jnp.int32)
    valid = jnp.asarray([[True, False]])

    crit = SetCriterion(num_classes=c)

    good_logits = jnp.full((1, q, c + 1), -5.0).at[:, :, c].set(5.0)
    good_logits = good_logits.at[0, 2, :].set(
        jnp.zeros(c + 1).at[1].set(10.0) - 5.0)
    good_boxes = jnp.tile(jnp.asarray([[0.9, 0.9, 0.05, 0.05]]), (q, 1))[None]
    good_boxes = good_boxes.at[0, 2].set(jnp.asarray([0.4, 0.4, 0.2, 0.2]))
    good = crit({"pred_logits": good_logits, "pred_boxes": good_boxes},
                labels_t, boxes_t, valid)

    bad_logits = jnp.zeros((1, q, c + 1))
    bad_boxes = jnp.full((1, q, 4), 0.1)
    bad = crit({"pred_logits": bad_logits, "pred_boxes": bad_boxes},
               labels_t, boxes_t, valid)

    assert float(crit.total_loss(good)) < float(crit.total_loss(bad))
    assert float(good["loss_bbox"]) < 1e-5
    assert float(good["loss_giou"]) < 1e-5


def _tiny_detr(aux=False):
    return Detr(num_classes=5, num_queries=8, hidden_dim=32, nheads=4,
                num_encoder_layers=1, num_decoder_layers=2,
                dim_feedforward=64, dropout=0.0, aux_loss=aux,
                backbone_norm="group")


@pytest.mark.slow
def test_detr_forward_shapes():
    model = _tiny_detr(aux=True)
    x = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64), bool)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, mask)
    out = model.apply(v, x, mask)
    assert out["pred_logits"].shape == (1, 8, 6)
    assert out["pred_boxes"].shape == (1, 8, 4)
    assert float(out["pred_boxes"].min()) >= 0.0
    assert float(out["pred_boxes"].max()) <= 1.0
    assert len(out["aux_outputs"]) == 1  # 2 decoder layers → 1 aux


@pytest.mark.slow
def test_detr_train_step_reduces_loss():
    import optax

    model = _tiny_detr()
    crit = SetCriterion(num_classes=5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    mask = jnp.zeros((2, 64, 64), bool)
    targets = [
        {"labels": np.asarray([1]), "boxes": np.asarray(
            [[0.5, 0.5, 0.4, 0.4]], np.float32)},
        {"labels": np.asarray([2, 3]), "boxes": np.asarray(
            [[0.3, 0.3, 0.2, 0.2], [0.6, 0.6, 0.3, 0.3]], np.float32)},
    ]
    labels, boxes, valid = prepare_targets(targets, 4, 5)

    v = model.init({"params": jax.random.PRNGKey(0)}, x, mask)
    tx = optax.adam(1e-4)
    opt_state = tx.init(v["params"])

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, x, mask, deterministic=False)
            losses = crit(out, labels, boxes, valid)
            return crit.total_loss(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = v["params"]
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_detr_vit_backbone():
    """BASELINE config 4: ViT-backbone DETR forward."""
    model = Detr(num_classes=5, num_queries=8, hidden_dim=32, nheads=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 dim_feedforward=64, dropout=0.0,
                 backbone_arch="vit")
    # default-size ViT backbone on a small image keeps this affordable
    x = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64), bool)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, mask)
    out = model.apply(v, x, mask)
    assert out["pred_logits"].shape == (1, 8, 6)
    assert out["pred_boxes"].shape == (1, 8, 4)


@pytest.mark.slow
def test_auction_matches_scipy_on_random_costs():
    """The on-device auction must produce valid matchings with near-scipy
    total cost (exact on most instances)."""
    from scipy.optimize import linear_sum_assignment

    from vision_transformers_tpu.models.object_detection.matcher import (
        auction_assign,
    )

    rng = np.random.RandomState(0)
    worst_gap = 0.0
    for trial in range(20):
        q, t = 20, rng.randint(1, 12)
        cost = rng.randn(q, t).astype(np.float32) * rng.uniform(0.5, 5)
        valid = np.ones(t, bool)
        out = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
        # valid matching: distinct queries for all targets
        assert len(set(out.tolist())) == t, out
        assert (out >= 0).all() and (out < q).all()
        ours = cost[out, np.arange(t)].sum()
        rows, cols = linear_sum_assignment(cost.T)  # rows=targets
        best = cost[cols, rows].sum()
        worst_gap = max(worst_gap, float(ours - best))
    # near-optimal: within 1% of the cost spread in the worst trial
    assert worst_gap < 0.05, worst_gap


def test_auction_respects_validity_mask():
    from vision_transformers_tpu.models.object_detection.matcher import (
        auction_assign,
    )

    cost = jnp.asarray(np.random.RandomState(1).randn(8, 4), jnp.float32)
    valid = jnp.asarray([True, False, True, False])
    out = np.asarray(auction_assign(cost, valid))
    assert out[1] == -1 and out[3] == -1
    assert out[0] != out[2] and out[0] >= 0 and out[2] >= 0


def test_matcher_auction_backend_matches_scipy_backend():
    rng = np.random.RandomState(2)
    b, q, t, c = 2, 10, 4, 5
    logits = jnp.asarray(rng.randn(b, q, c + 1), jnp.float32)
    pred_boxes = jax.nn.sigmoid(jnp.asarray(rng.randn(b, q, 4), jnp.float32))
    labels = jnp.asarray(rng.randint(0, c, (b, t)), jnp.int32)
    boxes = jax.nn.sigmoid(jnp.asarray(rng.randn(b, t, 4), jnp.float32)) * 0.4
    boxes = boxes.at[..., :2].add(0.3)
    valid = jnp.asarray([[True] * t, [True, True, False, False]])
    out = {"pred_logits": logits, "pred_boxes": pred_boxes}

    a = HungarianMatcher(method="auction")(out, labels, boxes, valid)
    s = HungarianMatcher(method="scipy")(out, labels, boxes, valid)
    # both valid matchings; on these well-separated random costs they agree
    np.testing.assert_array_equal(np.asarray(a), np.asarray(s))
