"""Full-model same-weights parity vs the reference's torch math (VERDICT r1
item 4; SURVEY.md §4 "per-model golden-logit tests").

Each test assembles the reference computation from torch primitives inside
the test (torchvision/timm are not installed), loads the SAME weights into
our flax modules, and compares outputs in fp32:

- full ViT forward            (reference vanilla_vit.py:109-215)
- Swin shifted_window_attention with shift mask + relative-position bias
                              (swin_transformer.py:45-130)
- PVT SRA block               (pvt.py:42-122)
- DETR encoder + decoder layer, fixed-intent post-norm
                              (object_detection/transformer.py:118-247)
- DistillationLoss soft/hard  (utils/distillation_loss.py:55-74)
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional


def t2n(p):
    # .copy(): jnp.asarray zero-copies aligned numpy views on CPU, so
    # without it torch's in-place optimizer updates would silently mutate
    # the "extracted" jax params (bit us in the trajectory parity test).
    return p.detach().numpy().copy()


def lin(tl):  # torch Linear -> flax Dense params
    return {"kernel": t2n(tl.weight).T, "bias": t2n(tl.bias)}


def ln(tl):  # torch LayerNorm -> flax LayerNorm params
    return {"scale": t2n(tl.weight), "bias": t2n(tl.bias)}


# ---------------------------------------------------------------------------
# 1. Full ViT forward


class TorchViT(torch.nn.Module):
    """Reference ViT assembled from torch primitives (vanilla_vit.py:109-215:
    conv patch embed -> CLS concat -> +pos -> L x pre-LN blocks -> LN ->
    CLS-token linear head)."""

    def __init__(self, image_size, patch, layers, heads, dim, mlp, classes):
        super().__init__()
        self.patch, self.dim = patch, dim
        n = (image_size // patch) ** 2 + 1
        self.conv_proj = torch.nn.Conv2d(3, dim, patch, stride=patch)
        self.class_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos = torch.nn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.blocks = torch.nn.ModuleList()
        for _ in range(layers):
            blk = torch.nn.ModuleDict({
                "ln_1": torch.nn.LayerNorm(dim, eps=1e-6),
                "attn": torch.nn.MultiheadAttention(dim, heads,
                                                    batch_first=True),
                "ln_2": torch.nn.LayerNorm(dim, eps=1e-6),
                "fc1": torch.nn.Linear(dim, mlp),
                "fc2": torch.nn.Linear(mlp, dim),
            })
            self.blocks.append(blk)
        self.ln = torch.nn.LayerNorm(dim, eps=1e-6)
        self.head = torch.nn.Linear(dim, classes)

    def forward(self, images):  # NCHW
        x = self.conv_proj(images)
        x = x.flatten(2).transpose(1, 2)
        cls = self.class_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos
        for b in self.blocks:
            y = b["ln_1"](x)
            y, _ = b["attn"](y, y, y, need_weights=False)
            x = x + y
            y = b["ln_2"](x)
            x = x + b["fc2"](F.gelu(b["fc1"](y)))
        return self.head(self.ln(x)[:, 0])


def vit_params_from_torch(tm: "TorchViT", dim: int) -> dict:
    """Map TorchViT weights onto our flax ViT param tree."""
    enc = {"pos_embedding": t2n(tm.pos), "ln": ln(tm.ln)}
    for i, b in enumerate(tm.blocks):
        enc[f"encoder_layer_{i}"] = {
            "ln_1": ln(b["ln_1"]),
            "ln_2": ln(b["ln_2"]),
            "self_attention": {
                "qkv": {"kernel": t2n(b["attn"].in_proj_weight).T,
                        "bias": t2n(b["attn"].in_proj_bias)},
                "out": {"kernel": t2n(b["attn"].out_proj.weight).T,
                        "bias": t2n(b["attn"].out_proj.bias)},
            },
            "mlp": {"fc1": lin(b["fc1"]), "fc2": lin(b["fc2"])},
        }
    conv_w = t2n(tm.conv_proj.weight)  # (D, 3, p, p)
    params = {
        "conv_proj": {"proj": {
            # patchify emits (ph, pw, c)-ordered features
            "kernel": conv_w.transpose(2, 3, 1, 0).reshape(-1, dim),
            "bias": t2n(tm.conv_proj.bias)}},
        "class_token": t2n(tm.class_token),
        "encoder": enc,
        "head": lin(tm.head),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def test_full_vit_forward_matches_torch():
    from vision_transformers_tpu.models.image_classification import ViT

    img, patch, layers, heads, dim, mlp, classes = 32, 8, 2, 4, 64, 128, 10
    tm = TorchViT(img, patch, layers, heads, dim, mlp, classes).eval()

    rng = np.random.RandomState(0)
    x_nchw = rng.randn(2, 3, img, img).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x_nchw)).numpy()

    params = vit_params_from_torch(tm, dim)

    model = ViT(image_size=img, patch_size=patch, num_layers=layers,
                num_heads=heads, hidden_dim=dim, mlp_dim=mlp,
                num_classes=classes)
    out = model.apply({"params": params},
                      jnp.asarray(x_nchw.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 2. Swin shifted window attention (shift + relative position bias)


def torch_swin_attention(x, qkv_w, qkv_b, proj_w, proj_b, rel_bias,
                         window, heads, shift):
    """Reference semantics of swin_transformer.py:45-130 in torch ops
    (dropout-free eval): pad -> cyclic roll -> window partition -> MHA with
    rel-pos bias and 9-region shift mask -> reverse."""
    B, H, W, C = x.shape
    wh, ww = window
    pad_b, pad_r = (wh - H % wh) % wh, (ww - W % ww) % ww
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pH, pW, _ = x.shape
    sh = [0 if wh >= pH else shift[0], 0 if ww >= pW else shift[1]]
    if sum(sh):
        x = torch.roll(x, (-sh[0], -sh[1]), dims=(1, 2))
    nw = (pH // wh) * (pW // ww)
    xw = x.view(B, pH // wh, wh, pW // ww, ww, C)
    xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(B * nw, wh * ww, C)

    qkv = F.linear(xw, qkv_w, qkv_b)
    n = xw.shape[1]
    qkv = qkv.reshape(B * nw, n, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (C // heads) ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1) + rel_bias

    if sum(sh):
        region = x.new_zeros((pH, pW))
        hs = ((0, -wh), (-wh, -sh[0]), (-sh[0], None))
        ws = ((0, -ww), (-ww, -sh[1]), (-sh[1], None))
        cnt = 0
        for h0, h1 in hs:
            for w0, w1 in ws:
                region[h0:h1, w0:w1] = cnt
                cnt += 1
        region = region.view(pH // wh, wh, pW // ww, ww)
        region = region.permute(0, 2, 1, 3).reshape(nw, wh * ww)
        am = region.unsqueeze(1) - region.unsqueeze(2)
        am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
        attn = attn.view(B, nw, heads, n, n) + am.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, n, n)

    out = F.softmax(attn, dim=-1) @ v
    out = out.transpose(1, 2).reshape(B * nw, n, C)
    out = F.linear(out, proj_w, proj_b)
    out = out.view(B, pH // wh, pW // ww, wh, ww, C)
    out = out.permute(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
    if sum(sh):
        out = torch.roll(out, (sh[0], sh[1]), dims=(1, 2))
    return out[:, :H, :W, :]


@pytest.mark.parametrize("shift", [(0, 0), (2, 2)])
def test_swin_window_attention_matches_torch(shift):
    from vision_transformers_tpu.ops.windows import shifted_window_attention

    B, H, W, C, heads = 2, 12, 12, 32, 4
    window = (4, 4)
    n = window[0] * window[1]
    rng = np.random.RandomState(1)
    x = rng.randn(B, H, W, C).astype(np.float32)
    qkv_w = rng.randn(3 * C, C).astype(np.float32) * 0.1
    qkv_b = rng.randn(3 * C).astype(np.float32) * 0.1
    proj_w = rng.randn(C, C).astype(np.float32) * 0.1
    proj_b = rng.randn(C).astype(np.float32) * 0.1
    rel = rng.randn(heads, n, n).astype(np.float32) * 0.1

    with torch.no_grad():
        ref = torch_swin_attention(
            torch.tensor(x), torch.tensor(qkv_w), torch.tensor(qkv_b),
            torch.tensor(proj_w), torch.tensor(proj_b), torch.tensor(rel),
            window, heads, list(shift)).numpy()

    out = shifted_window_attention(
        jnp.asarray(x), jnp.asarray(qkv_w.T), jnp.asarray(qkv_b),
        jnp.asarray(proj_w.T), jnp.asarray(proj_b), jnp.asarray(rel),
        window, heads, list(shift))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 3. PVT SRA block


class TorchSRABlock(torch.nn.Module):
    """Reference PVT Block with SRA (pvt.py:42-122), DropPath=0 eval."""

    def __init__(self, dim, heads, mlp_ratio, sr):
        super().__init__()
        self.heads, self.sr_ratio, self.dim = heads, sr, dim
        self.norm1 = torch.nn.LayerNorm(dim)
        self.q = torch.nn.Linear(dim, dim, bias=True)
        self.kv = torch.nn.Linear(dim, 2 * dim, bias=True)
        self.sr = torch.nn.Conv2d(dim, dim, sr, stride=sr)
        self.norm = torch.nn.LayerNorm(dim)
        self.proj = torch.nn.Linear(dim, dim)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.fc1 = torch.nn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = torch.nn.Linear(int(dim * mlp_ratio), dim)

    def attn(self, x, hgt, wdt):
        b, n, c = x.shape
        h, dh = self.heads, self.dim // self.heads
        q = self.q(x).reshape(b, n, h, dh).permute(0, 2, 1, 3)
        x_ = x.permute(0, 2, 1).reshape(b, c, hgt, wdt)
        x_ = self.sr(x_).reshape(b, c, -1).permute(0, 2, 1)
        x_ = self.norm(x_)
        kv = self.kv(x_).reshape(b, -1, 2, h, dh).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        a = (q @ k.transpose(-2, -1)) * dh ** -0.5
        out = (a.softmax(-1) @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)

    def forward(self, x, hgt, wdt):
        x = x + self.attn(self.norm1(x), hgt, wdt)
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


def test_pvt_sra_block_matches_torch():
    from vision_transformers_tpu.models.image_classification.pvt import (
        PVTBlock,
    )

    dim, heads, sr, hgt, wdt = 64, 2, 2, 8, 8
    tm = TorchSRABlock(dim, heads, 2.0, sr).eval()
    rng = np.random.RandomState(2)
    x = rng.randn(2, hgt * wdt, dim).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), hgt, wdt).numpy()

    sr_w = t2n(tm.sr.weight)  # (C, C, r, r)
    params = {
        "norm1": ln(tm.norm1),
        "norm2": ln(tm.norm2),
        "attn": {
            "q": lin(tm.q),
            "kv": lin(tm.kv),
            "sr": {"kernel": sr_w.transpose(2, 3, 1, 0).reshape(-1, dim),
                   "bias": t2n(tm.sr.bias)},
            "sr_norm": ln(tm.norm),
            "proj": lin(tm.proj),
        },
        "mlp": {"fc1": lin(tm.fc1), "fc2": lin(tm.fc2)},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    blk = PVTBlock(dim=dim, num_heads=heads, mlp_ratio=2.0, qkv_bias=True,
                   sr_ratio=sr)
    out = blk.apply({"params": params}, jnp.asarray(x), (hgt, wdt))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 4. DETR encoder + decoder layer (fixed-intent post-norm)


class TorchDETRLayers(torch.nn.Module):
    """Reference TransformerEncoderLayer/DecoderLayer post-norm forward
    (object_detection/transformer.py:118-247 with the typos fixed: pos added
    at Q/K only, value without pos)."""

    def __init__(self, d, heads, ff):
        super().__init__()
        self.sa_e = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        self.n1_e = torch.nn.LayerNorm(d)
        self.l1_e = torch.nn.Linear(d, ff)
        self.l2_e = torch.nn.Linear(ff, d)
        self.n2_e = torch.nn.LayerNorm(d)

        self.sa_d = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        self.ca_d = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        self.n1_d = torch.nn.LayerNorm(d)
        self.n2_d = torch.nn.LayerNorm(d)
        self.n3_d = torch.nn.LayerNorm(d)
        self.l1_d = torch.nn.Linear(d, ff)
        self.l2_d = torch.nn.Linear(ff, d)

    def encoder(self, src, pos, pad_mask):
        q = k = src + pos
        y, _ = self.sa_e(q, k, src, key_padding_mask=pad_mask,
                         need_weights=False)
        src = self.n1_e(src + y)
        y = self.l2_e(F.relu(self.l1_e(src)))
        return self.n2_e(src + y)

    def decoder(self, tgt, memory, pos, qpos, pad_mask):
        q = k = tgt + qpos
        y, _ = self.sa_d(q, k, tgt, need_weights=False)
        tgt = self.n1_d(tgt + y)
        y, _ = self.ca_d(tgt + qpos, memory + pos, memory,
                         key_padding_mask=pad_mask, need_weights=False)
        tgt = self.n2_d(tgt + y)
        y = self.l2_d(F.relu(self.l1_d(tgt)))
        return self.n3_d(tgt + y)


def _mha_params(mha, d):
    w = t2n(mha.in_proj_weight)  # (3d, d) rows [q; k; v]
    b = t2n(mha.in_proj_bias)
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "v_proj": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out_proj": {"kernel": t2n(mha.out_proj.weight).T,
                     "bias": t2n(mha.out_proj.bias)},
    }


def test_detr_encoder_decoder_layers_match_torch():
    from vision_transformers_tpu.models.object_detection.transformer import (
        TransformerDecoderLayer, TransformerEncoderLayer,
    )

    d, heads, ff, sk, sq = 64, 4, 128, 24, 10
    tm = TorchDETRLayers(d, heads, ff).eval()
    rng = np.random.RandomState(3)
    src = rng.randn(2, sk, d).astype(np.float32)
    pos = rng.randn(2, sk, d).astype(np.float32)
    tgt = rng.randn(2, sq, d).astype(np.float32)
    qpos = rng.randn(2, sq, d).astype(np.float32)
    pad = np.zeros((2, sk), bool)
    pad[1, -5:] = True  # ragged image: last keys are padding

    with torch.no_grad():
        mem_ref = tm.encoder(torch.tensor(src), torch.tensor(pos),
                             torch.tensor(pad)).numpy()
        out_ref = tm.decoder(torch.tensor(tgt), torch.tensor(mem_ref),
                             torch.tensor(pos), torch.tensor(qpos),
                             torch.tensor(pad)).numpy()

    enc_params = {
        "self_attn": _mha_params(tm.sa_e, d),
        "norm1": ln(tm.n1_e), "norm2": ln(tm.n2_e),
        "linear1": lin(tm.l1_e), "linear2": lin(tm.l2_e),
    }
    enc = TransformerEncoderLayer(d_model=d, nhead=heads, dim_feedforward=ff,
                                  dropout=0.0)
    mem = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, enc_params)},
                    jnp.asarray(src), jnp.asarray(pad), jnp.asarray(pos))
    np.testing.assert_allclose(
        np.asarray(mem)[~pad], mem_ref[~pad], rtol=2e-4, atol=2e-4)

    dec_params = {
        "self_attn": _mha_params(tm.sa_d, d),
        "multihead_attn": _mha_params(tm.ca_d, d),
        "norm1": ln(tm.n1_d), "norm2": ln(tm.n2_d), "norm3": ln(tm.n3_d),
        "linear1": lin(tm.l1_d), "linear2": lin(tm.l2_d),
    }
    dec = TransformerDecoderLayer(d_model=d, nhead=heads, dim_feedforward=ff,
                                  dropout=0.0)
    out = dec.apply({"params": jax.tree_util.tree_map(jnp.asarray, dec_params)},
                    jnp.asarray(tgt), jnp.asarray(mem_ref), jnp.asarray(pad),
                    jnp.asarray(pos), jnp.asarray(qpos))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 5. DistillationLoss soft/hard vs torch formulas


def test_distillation_loss_matches_torch():
    from vision_transformers_tpu.utils.distillation_loss import (
        distillation_loss,
    )

    rng = np.random.RandomState(4)
    student_cls = rng.randn(8, 10).astype(np.float32)
    student_kd = rng.randn(8, 10).astype(np.float32)
    teacher = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, 8)
    tau, alpha = 5.0, 0.5

    base_t = F.cross_entropy(torch.tensor(student_cls),
                             torch.tensor(labels))
    soft_t = F.kl_div(
        F.log_softmax(torch.tensor(student_kd) / tau, dim=1),
        F.log_softmax(torch.tensor(teacher) / tau, dim=1),
        reduction="sum", log_target=True,
    ) * (tau * tau) / student_kd.size
    hard_t = F.cross_entropy(torch.tensor(student_kd),
                             torch.tensor(teacher).argmax(1))

    base = jnp.mean(jax.nn.log_softmax(jnp.asarray(student_cls))[
        jnp.arange(8), jnp.asarray(labels)] * -1)

    got_soft = distillation_loss(base, jnp.asarray(student_kd),
                                 jnp.asarray(teacher), "soft", alpha, tau)
    ref_soft = base_t.item() * (1 - alpha) + soft_t.item() * alpha
    assert abs(float(got_soft) - ref_soft) < 1e-5

    got_hard = distillation_loss(base, jnp.asarray(student_kd),
                                 jnp.asarray(teacher), "hard", alpha, tau)
    ref_hard = base_t.item() * (1 - alpha) + hard_t.item() * alpha
    assert abs(float(got_hard) - ref_hard) < 1e-5


# ---------------------------------------------------------------------------
# 6. SwinV2 shifted window attention (cosine attention + continuous
#    position bias; torchvision V2 semantics — the reference registers
#    swin_*v2 preset names with no model, utils/args.py:29-41)


def torch_swin_v2_attention(x, qkv_w, qkv_b, proj_w, proj_b, logit_scale,
                            cpb_w1, cpb_b1, cpb_w2, coords, rel_index,
                            window, heads, shift):
    """torchvision ShiftedWindowAttentionV2 math in torch ops."""
    B, H, W, C = x.shape
    wh, ww = window
    pad_b, pad_r = (wh - H % wh) % wh, (ww - W % ww) % ww
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pH, pW, _ = x.shape
    sh = [0 if wh >= pH else shift[0], 0 if ww >= pW else shift[1]]
    if sum(sh):
        x = torch.roll(x, (-sh[0], -sh[1]), dims=(1, 2))
    nw = (pH // wh) * (pW // ww)
    xw = x.view(B, pH // wh, wh, pW // ww, ww, C)
    xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(B * nw, wh * ww, C)

    qkv = F.linear(xw, qkv_w, qkv_b)
    n = xw.shape[1]
    qkv = qkv.reshape(B * nw, n, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]

    attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
    scale = torch.clamp(logit_scale,
                        max=torch.log(torch.tensor(100.0))).exp()
    attn = attn * scale

    # continuous position bias: MLP(coords) -> gather -> 16*sigmoid
    table = F.linear(F.relu(F.linear(coords, cpb_w1, cpb_b1)), cpb_w2)
    table = table.view(-1, heads)
    rel = table[rel_index].view(n, n, heads).permute(2, 0, 1)
    attn = attn + 16 * torch.sigmoid(rel)

    if sum(sh):
        region = x.new_zeros((pH, pW))
        hs = ((0, -wh), (-wh, -sh[0]), (-sh[0], None))
        ws = ((0, -ww), (-ww, -sh[1]), (-sh[1], None))
        cnt = 0
        for h0, h1 in hs:
            for w0, w1 in ws:
                region[h0:h1, w0:w1] = cnt
                cnt += 1
        region = region.view(pH // wh, wh, pW // ww, ww)
        region = region.permute(0, 2, 1, 3).reshape(nw, wh * ww)
        am = region.unsqueeze(1) - region.unsqueeze(2)
        am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
        attn = attn.view(B, nw, heads, n, n) + am.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, n, n)

    out = F.softmax(attn, dim=-1) @ v
    out = out.transpose(1, 2).reshape(B * nw, n, C)
    out = F.linear(out, proj_w, proj_b)
    out = out.view(B, pH // wh, pW // ww, wh, ww, C)
    out = out.permute(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
    if sum(sh):
        out = torch.roll(out, (sh[0], sh[1]), dims=(1, 2))
    return out[:, :H, :W, :]


@pytest.mark.parametrize("shift", [(0, 0), (2, 2)])
def test_swin_v2_window_attention_matches_torch(shift):
    from vision_transformers_tpu.ops.windows import (
        relative_coords_table, relative_position_index,
        shifted_window_attention,
    )

    B, H, W, C, heads = 2, 12, 12, 32, 4
    window = (4, 4)
    rng = np.random.RandomState(7)
    x = rng.randn(B, H, W, C).astype(np.float32)
    qkv_w = rng.randn(3 * C, C).astype(np.float32) * 0.1
    q_b = rng.randn(C).astype(np.float32) * 0.1
    v_b = rng.randn(C).astype(np.float32) * 0.1
    qkv_b = np.concatenate([q_b, np.zeros(C, np.float32), v_b])
    proj_w = rng.randn(C, C).astype(np.float32) * 0.1
    proj_b = rng.randn(C).astype(np.float32) * 0.1
    logit_scale = (rng.randn(heads, 1, 1) + np.log(10.0)).astype(np.float32)
    cpb_w1 = rng.randn(512, 2).astype(np.float32) * 0.1
    cpb_b1 = rng.randn(512).astype(np.float32) * 0.1
    cpb_w2 = rng.randn(heads, 512).astype(np.float32) * 0.1

    coords_np = relative_coords_table(*window)  # (1, 2wh-1, 2ww-1, 2)
    idx_np = relative_position_index(*window)

    with torch.no_grad():
        ref = torch_swin_v2_attention(
            torch.tensor(x), torch.tensor(qkv_w), torch.tensor(qkv_b),
            torch.tensor(proj_w), torch.tensor(proj_b),
            torch.tensor(logit_scale), torch.tensor(cpb_w1),
            torch.tensor(cpb_b1), torch.tensor(cpb_w2),
            torch.tensor(coords_np.astype(np.float32)),
            torch.tensor(idx_np.astype(np.int64)),
            window, heads, list(shift)).numpy()

    # our side: compute the 16*sigmoid CPB bias and hand it to the core
    n = window[0] * window[1]
    table = np.maximum(coords_np @ cpb_w1.T + cpb_b1, 0.0) @ cpb_w2.T
    table = table.reshape(-1, heads)
    rel = table[idx_np].reshape(n, n, heads).transpose(2, 0, 1)
    rel_bias = 16.0 / (1.0 + np.exp(-rel))

    out = shifted_window_attention(
        jnp.asarray(x), jnp.asarray(qkv_w.T), jnp.asarray(qkv_b),
        jnp.asarray(proj_w.T), jnp.asarray(proj_b),
        jnp.asarray(rel_bias.astype(np.float32)),
        window, heads, list(shift),
        logit_scale=jnp.asarray(logit_scale))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
