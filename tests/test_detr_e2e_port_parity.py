"""End-to-end DETR checkpoint-port parity (VERDICT r3 next #4c).

No real COCO data or pretrained facebook checkpoint exists in this
environment, so the loop is closed structurally: a full torch DETR with
facebook detr-r50 module naming (strict load_state_dict both validates
the name map) and facebook inference semantics (post-norm transformer,
sine pos-enc, zero-init tgt, per-layer query pos) is run side-by-side
with our JAX Detr loaded from the SAME random checkpoint via
utils/port_torch.port_detr_state_dict. Both go through PostProcess and
the repo's COCO evaluator; boxes and mAP must agree.

Reference intent: /root/reference/models/object_detection/detr.py:108-134
(forward incomplete there); facebook semantics per the completed
models/object_detection/{detr,transformer}.py.
"""

import json
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_port_torch import (  # noqa: E402
    TorchResNet50, _fake_detr_state_dict,
)

D, HEADS, ENC, DEC, FFN, CLASSES, QUERIES = 32, 4, 1, 1, 64, 5, 4
STAGES = (3, 4, 6, 3)  # Detr always builds the full ResNet-50 backbone


class _EncLayer(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(D, HEADS,
                                                     batch_first=True)
        self.linear1 = torch.nn.Linear(D, FFN)
        self.linear2 = torch.nn.Linear(FFN, D)
        self.norm1 = torch.nn.LayerNorm(D)
        self.norm2 = torch.nn.LayerNorm(D)

    def forward(self, src, pos, pad):
        q = k = src + pos
        y, _ = self.self_attn(q, k, src, key_padding_mask=pad,
                              need_weights=False)
        src = self.norm1(src + y)
        return self.norm2(src + self.linear2(F.relu(self.linear1(src))))


class _DecLayer(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(D, HEADS,
                                                     batch_first=True)
        self.multihead_attn = torch.nn.MultiheadAttention(D, HEADS,
                                                          batch_first=True)
        self.linear1 = torch.nn.Linear(D, FFN)
        self.linear2 = torch.nn.Linear(FFN, D)
        self.norm1 = torch.nn.LayerNorm(D)
        self.norm2 = torch.nn.LayerNorm(D)
        self.norm3 = torch.nn.LayerNorm(D)

    def forward(self, tgt, memory, pos, qpos, pad):
        q = k = tgt + qpos
        y, _ = self.self_attn(q, k, tgt, need_weights=False)
        tgt = self.norm1(tgt + y)
        y, _ = self.multihead_attn(tgt + qpos, memory + pos, memory,
                                   key_padding_mask=pad, need_weights=False)
        tgt = self.norm2(tgt + y)
        return self.norm3(tgt + self.linear2(F.relu(self.linear1(tgt))))


class _Encoder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = torch.nn.ModuleList([_EncLayer() for _ in range(ENC)])

    def forward(self, src, pos, pad):
        for l in self.layers:
            src = l(src, pos, pad)
        return src


class _Decoder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = torch.nn.ModuleList([_DecLayer() for _ in range(DEC)])
        self.norm = torch.nn.LayerNorm(D)

    def forward(self, tgt, memory, pos, qpos, pad):
        for l in self.layers:
            tgt = l(tgt, memory, pos, qpos, pad)
        return self.norm(tgt)


class _Transformer(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _Encoder()
        self.decoder = _Decoder()


class _Body(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.body = TorchResNet50(stage_sizes=STAGES)


class _BoxMLP(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = torch.nn.ModuleList([
            torch.nn.Linear(D, D), torch.nn.Linear(D, D),
            torch.nn.Linear(D, 4)])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x) if i == 2 else F.relu(l(x))
        return x


def _sine_pos(mask_ds: torch.Tensor, num_pos_feats=D // 2, temp=10000.0):
    """facebook PositionEmbeddingSine (normalize=True), channels-last to
    match the JAX module's (B, H, W, 2·npf) layout."""
    not_mask = (~mask_ds).float()
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temp ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                     / num_pos_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack([px[..., 0::2].sin(), px[..., 1::2].cos()],
                     dim=-1).flatten(3)
    py = torch.stack([py[..., 0::2].sin(), py[..., 1::2].cos()],
                     dim=-1).flatten(3)
    return torch.cat([py, px], dim=3)


class TorchDETR(torch.nn.Module):
    """facebook detr-r50 naming + inference semantics."""

    def __init__(self):
        super().__init__()
        self.backbone = torch.nn.Sequential(_Body())
        self.transformer = _Transformer()
        self.input_proj = torch.nn.Conv2d(2048, D, 1)
        self.query_embed = torch.nn.Embedding(QUERIES, D)
        self.class_embed = torch.nn.Linear(D, CLASSES + 1)
        self.bbox_embed = _BoxMLP()

    def forward(self, images, pixel_mask):
        feats = self.backbone[0].body(images)["3"]          # C5
        b, c, h, w = feats.shape
        mask_ds = F.interpolate(pixel_mask[None].float(), size=(h, w),
                                mode="nearest")[0].bool()
        pos = _sine_pos(mask_ds)                            # (B,H,W,D)
        src = self.input_proj(feats).permute(0, 2, 3, 1)    # (B,H,W,D)
        src_seq = src.reshape(b, h * w, D)
        pos_seq = pos.reshape(b, h * w, D)
        pad = mask_ds.reshape(b, h * w)
        memory = self.transformer.encoder(src_seq, pos_seq, pad)
        qpos = self.query_embed.weight[None].expand(b, -1, -1)
        tgt = torch.zeros_like(qpos)
        hs = self.transformer.decoder(tgt, memory, pos_seq, qpos, pad)
        return {"pred_logits": self.class_embed(hs),
                "pred_boxes": self.bbox_embed(hs).sigmoid()}


def _np_postprocess(logits, boxes, sizes):
    """numpy twin of models.object_detection.detr.PostProcess."""
    e = np.exp(logits - logits.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    scores = prob[..., :-1].max(-1)
    labels = prob[..., :-1].argmax(-1)
    cx, cy, w, h = np.moveaxis(boxes, -1, 0)
    xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    out = []
    for i, (ih, iw) in enumerate(sizes):
        out.append({"scores": scores[i], "labels": labels[i],
                    "boxes": xyxy[i] * np.array([iw, ih, iw, ih])})
    return out


def test_detr_port_e2e_boxes_and_map_match_torch():
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.models.object_detection.detr import (
        PostProcess,
    )
    from vision_transformers_tpu.utils.coco.coco_eval import (
        evaluate_detections,
    )
    from vision_transformers_tpu.utils.port_torch import port_detr_state_dict

    sd_np = _fake_detr_state_dict(
        d=D, heads=HEADS, enc=ENC, dec=DEC, ffn=FFN, classes=CLASSES,
        queries=QUERIES, stage_sizes=STAGES)

    tm = TorchDETR().eval()
    # strict load validates the name map in BOTH directions: every
    # checkpoint key consumed, every module param covered
    tm.load_state_dict({k: torch.as_tensor(np.asarray(v))
                        for k, v in sd_np.items()}, strict=True)

    params = port_detr_state_dict(sd_np)
    jm = Detr(num_classes=CLASSES, num_queries=QUERIES, hidden_dim=D,
              nheads=HEADS, num_encoder_layers=ENC, num_decoder_layers=DEC,
              dim_feedforward=FFN, dropout=0.0, backbone_norm="frozen_bn")

    # two images in a padded batch; the padding edge is 16-px aligned so
    # nearest-neighbour mask downsampling agrees between frameworks
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    mask = np.zeros((2, 64, 64), bool)
    mask[1, :, 48:] = True   # image 1 is 64x48 content + right padding
    imgs[1, :, 48:] = 0.0
    sizes = [(64, 64), (64, 48)]

    with torch.no_grad():
        t_out = tm(torch.tensor(imgs.transpose(0, 3, 1, 2)),
                   torch.tensor(mask))
    j_out = jm.apply({"params": params}, jnp.asarray(imgs),
                     jnp.asarray(mask))

    np.testing.assert_allclose(
        np.asarray(j_out["pred_logits"]), t_out["pred_logits"].numpy(),
        rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(j_out["pred_boxes"]), t_out["pred_boxes"].numpy(),
        rtol=2e-3, atol=2e-3)

    # PostProcess → identical scored boxes
    j_res = PostProcess()(j_out, jnp.asarray(sizes))
    t_res = _np_postprocess(t_out["pred_logits"].numpy(),
                            t_out["pred_boxes"].numpy(), sizes)
    for jr, tr_ in zip(j_res, t_res):
        assert np.array_equal(np.asarray(jr["labels"]), tr_["labels"])
        np.testing.assert_allclose(np.asarray(jr["scores"]), tr_["scores"],
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(jr["boxes"]), tr_["boxes"],
                                   rtol=2e-3, atol=0.15)  # abs px coords

    # → identical mAP against a shared synthetic ground truth
    gts = {}
    g = np.random.RandomState(2)
    for img_id, (ih, iw) in enumerate(sizes):
        bxs = []
        for _ in range(3):
            x0, y0 = g.randint(0, iw - 10), g.randint(0, ih - 10)
            bw, bh = g.randint(5, 15), g.randint(5, 15)
            bxs.append([x0, y0, x0 + bw, y0 + bh])
        gts[img_id] = {"boxes": np.asarray(bxs, np.float64),
                       "labels": g.randint(0, CLASSES, 3)}

    def preds_of(res):
        return {i: {"boxes": np.asarray(r["boxes"], np.float64),
                    "labels": np.asarray(r["labels"]),
                    "scores": np.asarray(r["scores"], np.float64)}
                for i, r in enumerate(res)}

    m_j = evaluate_detections(gts, preds_of(j_res))
    m_t = evaluate_detections(gts, preds_of(t_res))
    assert m_j.keys() == m_t.keys()
    for k in m_j:
        assert abs(m_j[k] - m_t[k]) < 1e-9, (k, m_j[k], m_t[k])
    print("mAP parity:", json.dumps(m_j))
