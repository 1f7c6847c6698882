"""Checkpoint porting: torch reference ``state_dict`` → our flax params.

Assembles torch models with the reference's EXACT module naming
(vanilla_vit.py:109-215 / swin_transformer.py:233-303 torchvision layout),
ports their ``state_dict()`` through ``utils/port_torch.py``, and asserts
same-weights logit parity — the "switch frameworks without retraining"
guarantee.
"""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

from vision_transformers_tpu.utils.port_torch import (
    port_swin_state_dict,
    port_vit_state_dict,
)


# ---------------------------------------------------------------------------
# ViT


class RefEncoderBlock(torch.nn.Module):
    """vanilla_vit.py:59-84 naming: ln_1 / self_attention / ln_2 / mlp."""

    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.self_attention = torch.nn.MultiheadAttention(
            dim, heads, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(dim, mlp_dim), torch.nn.GELU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(mlp_dim, dim),
            torch.nn.Dropout(0.0))

    def forward(self, x):
        y, _ = self.self_attention(
            self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False)
        x = x + y
        return x + self.mlp(self.ln_2(x))


class RefEncoder(torch.nn.Module):
    """vanilla_vit.py:86-106 naming: pos_embedding / layers.encoder_layer_i / ln."""

    def __init__(self, seq, layers, heads, dim, mlp_dim):
        super().__init__()
        self.pos_embedding = torch.nn.Parameter(torch.randn(1, seq, dim) * .02)
        self.layers = torch.nn.Sequential(OrderedDict(
            (f"encoder_layer_{i}", RefEncoderBlock(dim, heads, mlp_dim))
            for i in range(layers)))
        self.ln = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        return self.ln(self.layers(x + self.pos_embedding))


class RefViT(torch.nn.Module):
    """vanilla_vit.py:109-215 naming: conv_proj / class_token / encoder /
    heads.head."""

    def __init__(self, img, patch, layers, heads, dim, mlp_dim, classes):
        super().__init__()
        n = (img // patch) ** 2 + 1
        self.conv_proj = torch.nn.Conv2d(3, dim, patch, stride=patch)
        self.class_token = torch.nn.Parameter(torch.randn(1, 1, dim) * .02)
        self.encoder = RefEncoder(n, layers, heads, dim, mlp_dim)
        self.heads = torch.nn.Sequential(
            OrderedDict(head=torch.nn.Linear(dim, classes)))

    def forward(self, images):  # NCHW
        x = self.conv_proj(images).flatten(2).transpose(1, 2)
        cls = self.class_token.expand(x.shape[0], -1, -1)
        x = self.encoder(torch.cat([cls, x], dim=1))
        return self.heads(x[:, 0])


def test_port_vit_state_dict_logit_parity():
    from vision_transformers_tpu.models.image_classification import ViT

    img, patch, layers, heads, dim, mlp_dim, classes = 32, 8, 2, 4, 64, 128, 10
    tm = RefViT(img, patch, layers, heads, dim, mlp_dim, classes).eval()

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, img, img).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()

    params = port_vit_state_dict(tm.state_dict())
    model = ViT(image_size=img, patch_size=patch, num_layers=layers,
                num_heads=heads, hidden_dim=dim, mlp_dim=mlp_dim,
                num_classes=classes)
    out = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_port_vit_missing_key_message():
    with pytest.raises(KeyError, match="is missing 'encoder.pos_embedding'"):
        port_vit_state_dict({"encoder.layers.encoder_layer_0.x": 0})


# ---------------------------------------------------------------------------
# Swin (torchvision features.{idx} Sequential layout)


class TorchSwinAttn(torch.nn.Module):
    """swin_transformer.py:154-206 naming: qkv / proj /
    relative_position_bias_table."""

    def __init__(self, dim, window, heads):
        super().__init__()
        self.window, self.heads = window, heads
        self.qkv = torch.nn.Linear(dim, 3 * dim)
        self.proj = torch.nn.Linear(dim, dim)
        wh, ww = window
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.randn((2 * wh - 1) * (2 * ww - 1), heads) * .02)

    def rel_bias(self):
        from vision_transformers_tpu.ops.windows import (
            relative_position_index,
        )

        wh, ww = self.window
        n = wh * ww
        idx = torch.tensor(
            relative_position_index(wh, ww).astype(np.int64))
        return (self.relative_position_bias_table[idx]
                .view(n, n, self.heads).permute(2, 0, 1))

    def forward(self, x, shift):
        from tests.test_torch_model_parity import torch_swin_attention

        return torch_swin_attention(
            x, self.qkv.weight, self.qkv.bias, self.proj.weight,
            self.proj.bias, self.rel_bias(), self.window, self.heads, shift)


class TorchSwinBlock(torch.nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.shift = shift
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.attn = TorchSwinAttn(dim, window, heads)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(dim, 4 * dim), torch.nn.GELU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(4 * dim, dim),
            torch.nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x), self.shift)
        return x + self.mlp(self.norm2(x))


class TorchPatchMerging(torch.nn.Module):
    """swin_transformer.py:136-151: norm(4C) then reduction (bias=True)."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = torch.nn.Linear(4 * dim, 2 * dim)
        self.norm = torch.nn.LayerNorm(4 * dim, eps=1e-5)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        return self.reduction(self.norm(torch.cat([x0, x1, x2, x3], -1)))


class _Permute(torch.nn.Module):
    def forward(self, x):
        return x.permute(0, 2, 3, 1)


class TorchSwin(torch.nn.Module):
    """swin_transformer.py:233-303 torchvision layout: features.0 = (conv,
    Permute, LN); features.{2i+1} = stage blocks; features.{2i+2} = merge."""

    def __init__(self, patch, embed, depths, heads, window, classes):
        super().__init__()
        feats = [torch.nn.Sequential(
            torch.nn.Conv2d(3, embed, patch, stride=patch), _Permute(),
            torch.nn.LayerNorm(embed, eps=1e-5))]
        for i, d in enumerate(depths):
            dim = embed * 2 ** i
            feats.append(torch.nn.Sequential(*[
                TorchSwinBlock(
                    dim, heads[i], window,
                    [0, 0] if j % 2 == 0 else [w // 2 for w in window])
                for j in range(d)]))
            if i < len(depths) - 1:
                feats.append(TorchPatchMerging(dim))
        self.features = torch.nn.Sequential(*feats)
        num_features = embed * 2 ** (len(depths) - 1)
        self.norm = torch.nn.LayerNorm(num_features, eps=1e-5)
        self.head = torch.nn.Linear(num_features, classes)

    def forward(self, x):  # NCHW
        x = self.features(x)
        x = self.norm(x)
        return self.head(x.mean(dim=(1, 2)))


def test_port_swin_state_dict_logit_parity():
    from vision_transformers_tpu.models.image_classification import (
        SwinTransformer,
    )

    patch, embed, depths, heads, window, classes = 2, 16, [2, 1], [2, 4], \
        (4, 4), 10
    tm = TorchSwin(patch, embed, depths, heads, window, classes).eval()

    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()

    params = port_swin_state_dict(tm.state_dict(), depths)
    model = SwinTransformer(
        patch_size=[patch, patch], embed_dim=embed, depths=depths,
        num_heads=heads, window_size=list(window),
        stochastic_depth_prob=0.0, num_classes=classes)
    out = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


def test_port_swin_biasfree_reduction_gets_zero_bias():
    """torchvision's PatchMerging reduction is bias-free; porting must fill
    our (bias-carrying) Dense with zeros rather than fail."""
    tm = TorchSwin(2, 16, [1, 1], [2, 2], (4, 4), 10).eval()
    sd = {k: v for k, v in tm.state_dict().items()
          if k != "features.2.reduction.bias"}
    params = port_swin_state_dict(sd, [1, 1])
    assert np.allclose(np.asarray(params["merge0"]["reduction"]["bias"]), 0.0)


# ---------------------------------------------------------------------------
# SwinV2 (torchvision V2 layout: logit_scale, cpb_mlp, packed qkv bias)


def test_port_swin_v2_attention_params():
    from vision_transformers_tpu.models.image_classification import (
        SwinTransformerV2,
    )

    heads, dim = 2, 16
    rng = np.random.RandomState(5)
    qkv_b = rng.randn(3 * dim).astype(np.float32)
    qkv_b[dim:2 * dim] = 0.0  # torchvision zeroes the k third at init
    sd = {
        "features.0.0.weight": rng.randn(dim, 3, 2, 2).astype(np.float32),
        "features.0.0.bias": rng.randn(dim).astype(np.float32),
        "features.0.2.weight": np.ones(dim, np.float32),
        "features.0.2.bias": np.zeros(dim, np.float32),
        "features.1.0.norm1.weight": np.ones(dim, np.float32),
        "features.1.0.norm1.bias": np.zeros(dim, np.float32),
        "features.1.0.norm2.weight": np.ones(dim, np.float32),
        "features.1.0.norm2.bias": np.zeros(dim, np.float32),
        "features.1.0.attn.qkv.weight":
            rng.randn(3 * dim, dim).astype(np.float32),
        "features.1.0.attn.qkv.bias": qkv_b,
        "features.1.0.attn.proj.weight":
            rng.randn(dim, dim).astype(np.float32),
        "features.1.0.attn.proj.bias": rng.randn(dim).astype(np.float32),
        "features.1.0.attn.logit_scale":
            np.full((heads, 1, 1), np.log(10.0), np.float32),
        "features.1.0.attn.cpb_mlp.0.weight":
            rng.randn(512, 2).astype(np.float32),
        "features.1.0.attn.cpb_mlp.0.bias":
            rng.randn(512).astype(np.float32),
        "features.1.0.attn.cpb_mlp.2.weight":
            rng.randn(heads, 512).astype(np.float32),
        "features.1.0.mlp.0.weight":
            rng.randn(4 * dim, dim).astype(np.float32),
        "features.1.0.mlp.0.bias": rng.randn(4 * dim).astype(np.float32),
        "features.1.0.mlp.3.weight":
            rng.randn(dim, 4 * dim).astype(np.float32),
        "features.1.0.mlp.3.bias": rng.randn(dim).astype(np.float32),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
        "head.weight": rng.randn(10, dim).astype(np.float32),
        "head.bias": rng.randn(10).astype(np.float32),
    }
    params = port_swin_state_dict(sd, [1], v2=True)

    model = SwinTransformerV2(
        patch_size=[2, 2], embed_dim=dim, depths=[1], num_heads=[heads],
        window_size=[4, 4], stochastic_depth_prob=0.0, num_classes=10)
    x = jnp.asarray(np.random.RandomState(6).randn(2, 8, 8, 3), jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    # ported tree must be structurally identical to a fresh init
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(init))
    attn = params["stage0_block0"]["attn"]
    np.testing.assert_array_equal(np.asarray(attn["q_bias"]), qkv_b[:dim])
    np.testing.assert_array_equal(np.asarray(attn["v_bias"]), qkv_b[2 * dim:])
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 10) and bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# Checkpoint-file loading (the CLI --init-from-torch path)


def test_load_torch_checkpoint_file(tmp_path):
    from vision_transformers_tpu.models.image_classification import ViT
    from vision_transformers_tpu.utils.port_torch import load_torch_checkpoint

    tm = RefViT(32, 8, 1, 2, 32, 64, 10).eval()
    path = tmp_path / "vit.pt"
    # common trainer wrapper: {'state_dict': ...}
    torch.save({"state_dict": tm.state_dict()}, path)
    params = load_torch_checkpoint(str(path), "vit_tiny_cifar10",
                                   {"image_size": 32})

    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    model = ViT(image_size=32, patch_size=8, num_layers=1, num_heads=2,
                hidden_dim=32, mlp_dim=64, num_classes=10)
    out = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_load_torch_checkpoint_npz_and_swin_routing(tmp_path):
    from vision_transformers_tpu.utils.port_torch import load_torch_checkpoint

    tm = TorchSwin(2, 16, [1, 1], [2, 2], (4, 4), 10).eval()
    path = tmp_path / "swin.npz"
    np.savez(path, **{k: v.numpy() for k, v in tm.state_dict().items()})
    params = load_torch_checkpoint(str(path), "swin_tiny_cifar10",
                                   {"depths": [1, 1]})
    assert "stage1_block0" in params and "merge0" in params

    with pytest.raises(ValueError, match="no torch porting rule"):
        load_torch_checkpoint(str(path), "tnt_base_cifar10", {})


# ---------------------------------------------------------------------------
# DETR ResNet-50 backbone (torchvision layout, FrozenBatchNorm semantics)


class TorchBottleneck(torch.nn.Module):
    """torchvision Bottleneck with the DETR dilation semantics (prev
    dilation on the first block of a dilated stage)."""

    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride,
                                     padding=dilation, dilation=dilation,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, planes * 4, 1, stride=stride,
                                bias=False),
                torch.nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class TorchResNet50(torch.nn.Module):
    """torchvision resnet50 naming, DETR config (dilation in layer4)."""

    def __init__(self, stage_sizes=(3, 4, 6, 3),
                 replace_stride_with_dilation=(False, False, True)):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        cin, dilation = 64, 1
        for stage, blocks in enumerate(stage_sizes, start=1):
            planes = 64 * 2 ** (stage - 1)
            stride = 1 if stage == 1 else 2
            prev = dilation
            if stage > 1 and replace_stride_with_dilation[stage - 2]:
                dilation *= stride
                stride = 1
            layer = []
            for i in range(blocks):
                layer.append(TorchBottleneck(
                    cin, planes, stride=stride if i == 0 else 1,
                    dilation=prev if i == 0 else dilation,
                    downsample=i == 0))
                cin = planes * 4
            setattr(self, f"layer{stage}", torch.nn.Sequential(*layer))

    def forward(self, x):
        y = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        outs = {}
        for s in (1, 2, 3, 4):
            y = getattr(self, f"layer{s}")(y)
            outs[str(s - 1)] = y
        return outs


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * .1)
            m.running_var.copy_(
                torch.rand(m.num_features, generator=g) * .5 + .5)
            m.weight.data.copy_(torch.randn(m.num_features, generator=g) * .1
                                + 1)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * .1)


def test_port_resnet50_backbone_feature_parity():
    from vision_transformers_tpu.models.object_detection.backbone import (
        ResNet,
    )
    from vision_transformers_tpu.utils.port_torch import (
        port_resnet50_state_dict,
    )

    # tiny stage sizes keep the test fast; layer4 gets TWO blocks so the
    # dilated stage exercises both the prev-dilation first block and the
    # doubled-dilation second block (the advisor-flagged torchvision
    # semantics, backbone.py:118-125)
    sizes = (1, 1, 1, 2)
    tm = TorchResNet50(stage_sizes=sizes).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)

    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = {k: v.numpy() for k, v in tm(torch.tensor(x)).items()}

    params = port_resnet50_state_dict(tm.state_dict(), stage_sizes=sizes)
    model = ResNet(stage_sizes=sizes, norm="frozen_bn")
    outs = model.apply({"params": params},
                       jnp.asarray(x.transpose(0, 2, 3, 1)))
    for key, r in ref.items():
        got = np.asarray(outs[key]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, r, rtol=1e-3, atol=1e-3,
                                   err_msg=f"tap {key}")


def test_port_resnet50_strips_detr_prefix():
    from vision_transformers_tpu.utils.port_torch import (
        port_resnet50_state_dict,
    )

    sizes = (1, 1, 1, 1)
    tm = TorchResNet50(stage_sizes=sizes).eval()
    sd = {f"backbone.0.body.{k}": v for k, v in tm.state_dict().items()}
    sd["class_embed.weight"] = torch.zeros(1)  # non-backbone key, ignored
    params = port_resnet50_state_dict(sd, stage_sizes=sizes)
    assert "layer4_block0" in params
    assert "down_conv" in params["layer2_block0"]


# ---------------------------------------------------------------------------
# Full facebook-DETR checkpoint layout


def _fake_detr_state_dict(d=32, heads=4, enc=1, dec=1, ffn=64, classes=5,
                          queries=4, stage_sizes=(1, 1, 1, 1), seed=0):
    """Reference-named random DETR state_dict (facebook detr-r50 layout)."""
    rng = np.random.RandomState(seed)
    f = lambda *sh: rng.randn(*sh).astype(np.float32) * 0.1
    sd = {}
    body = TorchResNet50(stage_sizes=stage_sizes).eval()
    with torch.no_grad():
        _randomize_bn_stats(body, seed=seed)
    for k, v in body.state_dict().items():
        sd[f"backbone.0.body.{k}"] = v.numpy()

    def mha(p):
        sd[f"{p}.in_proj_weight"] = f(3 * d, d)
        sd[f"{p}.in_proj_bias"] = f(3 * d)
        sd[f"{p}.out_proj.weight"] = f(d, d)
        sd[f"{p}.out_proj.bias"] = f(d)

    def layer(p, decoder):
        mha(f"{p}.self_attn")
        if decoder:
            mha(f"{p}.multihead_attn")
            sd[f"{p}.norm3.weight"] = np.ones(d, np.float32)
            sd[f"{p}.norm3.bias"] = np.zeros(d, np.float32)
        sd[f"{p}.linear1.weight"] = f(ffn, d)
        sd[f"{p}.linear1.bias"] = f(ffn)
        sd[f"{p}.linear2.weight"] = f(d, ffn)
        sd[f"{p}.linear2.bias"] = f(d)
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = np.ones(d, np.float32)
            sd[f"{p}.{n}.bias"] = np.zeros(d, np.float32)

    for i in range(enc):
        layer(f"transformer.encoder.layers.{i}", decoder=False)
    for i in range(dec):
        layer(f"transformer.decoder.layers.{i}", decoder=True)
    sd["transformer.decoder.norm.weight"] = np.ones(d, np.float32)
    sd["transformer.decoder.norm.bias"] = np.zeros(d, np.float32)
    sd["input_proj.weight"] = f(d, 2048, 1, 1)
    sd["input_proj.bias"] = f(d)
    sd["query_embed.weight"] = f(queries, d)
    sd["class_embed.weight"] = f(classes + 1, d)
    sd["class_embed.bias"] = f(classes + 1)
    for i, (i_dim, o_dim) in enumerate([(d, d), (d, d), (d, 4)]):
        sd[f"bbox_embed.layers.{i}.weight"] = f(o_dim, i_dim)
        sd[f"bbox_embed.layers.{i}.bias"] = f(o_dim)
    return sd


def test_port_detr_state_dict_structure_and_forward():
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.utils.port_torch import port_detr_state_dict

    # NOTE: structural + execution test. The transformer-layer MATH parity
    # vs torch is pinned separately (test_torch_model_parity.py DETR
    # enc/dec layers) and the backbone feature parity above; this asserts
    # the name/transpose mapping produces a drop-in param tree.
    sd = _fake_detr_state_dict(stage_sizes=(3, 4, 6, 3))
    params = port_detr_state_dict(sd)

    model = Detr(num_classes=5, num_queries=4, hidden_dim=32, nheads=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 dim_feedforward=64, dropout=0.0, backbone_norm="frozen_bn")
    x = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64), bool)
    init = model.init({"params": jax.random.PRNGKey(0)}, x, mask)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(init))
    # spot-check the packed-MHA split + transpose
    enc0 = params["transformer"]["encoder"]["layer0"]["self_attn"]
    w = sd["transformer.encoder.layers.0.self_attn.in_proj_weight"]
    np.testing.assert_array_equal(np.asarray(enc0["q_proj"]["kernel"]),
                                  w[:32].T)
    np.testing.assert_array_equal(np.asarray(enc0["v_proj"]["kernel"]),
                                  w[64:].T)
    out = model.apply({"params": params}, x, mask)
    assert out["pred_logits"].shape == (1, 4, 6)
    assert bool(jnp.all(jnp.isfinite(out["pred_logits"])))
    assert bool(jnp.all(jnp.isfinite(out["pred_boxes"])))


@pytest.mark.slow
def test_fit_detection_from_ported_checkpoint(tmp_path):
    """End-to-end: port a (random) facebook-layout DETR checkpoint and
    continue training it through fit_detection(init_params=...) — the CLI
    --init-from-torch detection path."""
    from tests.test_coco_utils import _write_tiny_coco
    from vision_transformers_tpu.models.object_detection import Detr
    from vision_transformers_tpu.training.detection import (
        DetectionLoader, fit_detection,
    )
    from vision_transformers_tpu.utils.coco.build_coco import CocoDetection
    from vision_transformers_tpu.utils.coco import transforms as T
    from vision_transformers_tpu.utils.port_torch import port_detr_state_dict

    sd = _fake_detr_state_dict(stage_sizes=(3, 4, 6, 3))
    params = port_detr_state_dict(sd)

    img_dir, ann_file = _write_tiny_coco(tmp_path, n_images=2)
    tr = T.Compose([
        T.RandomResize([32]), T.ToTensor(),
        T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    ])
    ds = CocoDetection(img_dir, ann_file, transforms=tr)
    loader = DetectionLoader(ds, batch_size=2, shuffle=False, size_bucket=32)
    model = Detr(num_classes=5, num_queries=4, hidden_dim=32, nheads=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 dim_feedforward=64, dropout=0.0, backbone_norm="frozen_bn")
    hist = fit_detection(model, loader, 1, num_classes=5, max_targets=4,
                         init_params=params, verbose=False, seed=0)
    assert np.isfinite(hist["loss"][0])
