"""Port PyTorch reference checkpoints into this framework's param trees.

A user of the reference trains with torch ``state_dict()`` checkpoints
(torchvision-derived module naming). These converters map them onto the
flax param pytrees of the equivalent models here, so switching frameworks
does not orphan existing weights:

- ``port_vit_state_dict``: the reference ViT family
  (vanilla_vit.py:109-215 naming — ``conv_proj.*``, ``class_token``,
  ``encoder.layers.encoder_layer_{i}.*``, ``heads.head.*``). The same
  layout covers torchvision ``vit_b_16``-style checkpoints.
- ``port_swin_state_dict``: the reference Swin
  (swin_transformer.py:233-303 naming — torchvision ``features.{idx}``
  Sequential layout), and torchvision SwinV2 checkpoints with ``v2=True``.

Everything accepts torch tensors or numpy arrays. Conversions are pure
layout transforms (transposes / reshapes); no numerics change. Layout
rules (NCHW conv → patchify matmul, torch Linear → flax Dense transpose)
are asserted by the same-weights parity tests
(tests/test_torch_model_parity.py, tests/test_port_torch.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _np(t: Any) -> np.ndarray:
    """torch tensor or array-like → owned numpy array (never a view into
    torch storage — jnp.asarray zero-copies aligned CPU numpy arrays, so a
    view would alias live torch memory)."""
    if hasattr(t, "detach"):  # torch.Tensor without importing torch
        return t.detach().cpu().numpy().copy()
    return np.asarray(t).copy()


def port_linear(weight: Any, bias: Any = None) -> Dict[str, np.ndarray]:
    """torch ``nn.Linear`` (out, in) → flax ``Dense`` {kernel (in, out), bias}."""
    out = {"kernel": _np(weight).T}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def port_layernorm(weight: Any, bias: Any) -> Dict[str, np.ndarray]:
    """torch ``nn.LayerNorm`` → flax ``LayerNorm`` {scale, bias}."""
    return {"scale": _np(weight), "bias": _np(bias)}


def port_conv_nchw(weight: Any) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) → flax ``nn.Conv`` HWIO."""
    return _np(weight).transpose(2, 3, 1, 0)


def port_patchify_conv(weight: Any) -> np.ndarray:
    """torch stride-p p×p patch-embed conv (D, C, p, p) → the (p·p·C, D)
    matmul kernel of ops/patch_embed.py. ``patchify`` emits features in
    (ph, pw, c) order per patch, so rows are ordered the same way."""
    w = _np(weight)  # (D, C, ph, pw)
    d = w.shape[0]
    return w.transpose(2, 3, 1, 0).reshape(-1, d)


def _strip_prefix(sd: Mapping[str, Any], prefixes=("backbone.0.body.",
                                                   "body.", "module.")):
    """Drop a common wrapper prefix (facebook-DETR nests the ResNet under
    ``backbone.0.body.``; DDP training saves under ``module.``)."""
    for pre in prefixes:
        if any(k.startswith(pre) for k in sd):
            return {k[len(pre):]: v for k, v in sd.items()
                    if k.startswith(pre)}
    return dict(sd)


def _port_frozen_bn(sd: Mapping[str, Any], p: str) -> Dict[str, np.ndarray]:
    """torch BatchNorm2d buffers → our FrozenBatchNorm params
    (backbone.py:31-46: scale/bias/mean/var)."""
    return {
        "scale": _np(_get(sd, f"{p}.weight")),
        "bias": _np(_get(sd, f"{p}.bias")),
        "mean": _np(_get(sd, f"{p}.running_mean")),
        "var": _np(_get(sd, f"{p}.running_var")),
    }


def port_resnet50_state_dict(state_dict: Mapping[str, Any],
                             stage_sizes=None) -> Dict:
    """torchvision ``resnet50`` ``state_dict`` (or the ResNet nested in a
    facebook-DETR checkpoint under ``backbone.0.body.``) → flax params for
    our DETR ``ResNet`` backbone (backbone.py:91-135, FrozenBatchNorm
    semantics). The classifier ``fc.*`` keys are ignored; ``stage_sizes``
    defaults to what the checkpoint's ``layer{s}.{i}.`` keys imply."""
    sd = _strip_prefix(state_dict)
    if stage_sizes is None:
        stage_sizes = tuple(
            1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith(f"layer{s}."))
            for s in (1, 2, 3, 4))
    params: Dict[str, Any] = {
        "conv1": {"kernel": port_conv_nchw(_get(sd, "conv1.weight"))},
        "bn1": _port_frozen_bn(sd, "bn1"),
    }
    for stage, blocks in enumerate(stage_sizes, start=1):
        for i in range(blocks):
            p = f"layer{stage}.{i}"
            blk: Dict[str, Any] = {}
            for c in (1, 2, 3):
                blk[f"conv{c}"] = {
                    "kernel": port_conv_nchw(_get(sd, f"{p}.conv{c}.weight"))}
                blk[f"bn{c}"] = _port_frozen_bn(sd, f"{p}.bn{c}")
            if f"{p}.downsample.0.weight" in sd:
                blk["down_conv"] = {
                    "kernel": port_conv_nchw(sd[f"{p}.downsample.0.weight"])}
                blk["down_bn"] = _port_frozen_bn(sd, f"{p}.downsample.1")
            params[f"layer{stage}_block{i}"] = blk
    return jax.tree_util.tree_map(jnp.asarray, params)


def _port_mha(sd: Mapping[str, Any], p: str) -> Dict:
    """torch ``nn.MultiheadAttention`` (packed in_proj) → our separate
    q/k/v/out projections (object_detection/transformer.py)."""
    w = _np(_get(sd, f"{p}.in_proj_weight"))
    b = _np(_get(sd, f"{p}.in_proj_bias"))
    d = w.shape[0] // 3
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "v_proj": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out_proj": port_linear(
            _get(sd, f"{p}.out_proj.weight"), _get(sd, f"{p}.out_proj.bias")),
    }


def _port_detr_layer(sd: Mapping[str, Any], p: str, decoder: bool) -> Dict:
    layer = {
        "self_attn": _port_mha(sd, f"{p}.self_attn"),
        "linear1": port_linear(
            _get(sd, f"{p}.linear1.weight"), _get(sd, f"{p}.linear1.bias")),
        "linear2": port_linear(
            _get(sd, f"{p}.linear2.weight"), _get(sd, f"{p}.linear2.bias")),
        "norm1": port_layernorm(
            _get(sd, f"{p}.norm1.weight"), _get(sd, f"{p}.norm1.bias")),
        "norm2": port_layernorm(
            _get(sd, f"{p}.norm2.weight"), _get(sd, f"{p}.norm2.bias")),
    }
    if decoder:
        layer["multihead_attn"] = _port_mha(sd, f"{p}.multihead_attn")
        layer["norm3"] = port_layernorm(
            _get(sd, f"{p}.norm3.weight"), _get(sd, f"{p}.norm3.bias"))
    return layer


def _count_layers(sd: Mapping[str, Any], prefix: str) -> int:
    ids = [int(k[len(prefix):].split(".")[0])
           for k in sd if k.startswith(prefix)]
    if not ids:
        raise KeyError(
            f"checkpoint has no '{prefix}*' keys — not a DETR state_dict? "
            f"({len(sd)} keys, e.g. {sorted(sd)[:3]})")
    return 1 + max(ids)


def port_detr_state_dict(state_dict: Mapping[str, Any]) -> Dict:
    """facebook-DETR ``state_dict`` (detr-r50 layout) → flax params for our
    ``Detr`` (models/object_detection/detr.py): ResNet-50 FrozenBN backbone
    under ``joiner.backbone``, encoder/decoder transformer with packed-MHA
    → split q/k/v porting, shared class/bbox heads, query embeddings, and
    the 1×1-conv input projection. Sine positional encoding carries no
    params. Layer counts are inferred from the checkpoint."""
    sd = dict(state_dict)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]  # the published facebook checkpoints wrap in 'model'

    enc_n = _count_layers(sd, "transformer.encoder.layers.")
    dec_n = _count_layers(sd, "transformer.decoder.layers.")
    transformer: Dict[str, Any] = {
        "encoder": {
            f"layer{i}": _port_detr_layer(
                sd, f"transformer.encoder.layers.{i}", decoder=False)
            for i in range(enc_n)
        },
        "decoder": {
            f"layer{i}": _port_detr_layer(
                sd, f"transformer.decoder.layers.{i}", decoder=True)
            for i in range(dec_n)
        },
    }
    transformer["decoder"]["norm"] = port_layernorm(
        _get(sd, "transformer.decoder.norm.weight"),
        _get(sd, "transformer.decoder.norm.bias"))

    backbone = port_resnet50_state_dict(
        {k: v for k, v in sd.items() if k.startswith("backbone.")})

    proj_w = _np(_get(sd, "input_proj.weight"))  # (d, C, 1, 1)
    params = {
        "joiner": {"backbone": backbone},
        "transformer": transformer,
        "input_proj": {"kernel": proj_w.transpose(2, 3, 1, 0),
                       "bias": _np(_get(sd, "input_proj.bias"))},
        "query_embed": _np(_get(sd, "query_embed.weight")),
        "class_embed": port_linear(
            _get(sd, "class_embed.weight"), _get(sd, "class_embed.bias")),
        "bbox_embed": {
            f"layer{i}": port_linear(
                _get(sd, f"bbox_embed.layers.{i}.weight"),
                _get(sd, f"bbox_embed.layers.{i}.bias"))
            for i in range(3)
        },
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def parse_model_key(name: str):
    """args-registry key → (family, is_swin_v2). The single source of
    truth for the family / swin-v2 routing shared by the CLI's
    ``_model_for`` and ``load_torch_checkpoint`` (the reference registers
    swin_*v2 preset names, utils/args.py:29-41)."""
    parts = name.lower().split("_")
    family = parts[0]
    v2 = family == "swin" and len(parts) > 1 and parts[1].endswith("v2")
    return family, v2


def load_torch_checkpoint(path: str, model_name: str,
                          model_args: Mapping[str, Any]) -> Dict:
    """Load a reference torch checkpoint file and port it for the model the
    args-registry key names (``vit_*`` family or ``swin_*`` incl. v2).

    Accepts a ``torch.save``d state_dict (or a dict with a 'state_dict' /
    'model' entry, the common trainer wrappers) or a numpy ``.npz`` of the
    same keys."""
    if path.endswith(".npz"):
        sd: Mapping[str, Any] = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        for wrapper in ("state_dict", "model"):
            if wrapper in sd and isinstance(sd[wrapper], dict):
                sd = sd[wrapper]
                break

    family, v2 = parse_model_key(model_name)
    if family == "swin":
        return port_swin_state_dict(sd, model_args["depths"], v2=v2)
    if family in ("vit", "vitb16", "vitl16", "vitti16"):
        return port_vit_state_dict(sd)
    raise ValueError(
        f"no torch porting rule for model family {family!r} — supported: "
        "vit*, swin* (see port_vit_state_dict / port_swin_state_dict)")


def _get(sd: Mapping[str, Any], key: str) -> Any:
    if key not in sd:
        raise KeyError(
            f"checkpoint is missing '{key}' — not a reference-layout "
            f"state_dict? ({len(sd)} keys, e.g. {sorted(sd)[:3]})"
        )
    return sd[key]


def port_vit_state_dict(state_dict: Mapping[str, Any],
                        num_layers: Optional[int] = None) -> Dict:
    """Reference/torchvision ViT ``state_dict`` → flax params for our ViT.

    Key layout (vanilla_vit.py:109-215): ``conv_proj.{weight,bias}``,
    ``class_token``, ``encoder.pos_embedding``,
    ``encoder.layers.encoder_layer_{i}.{ln_1,ln_2}.{weight,bias}``,
    ``...self_attention.{in_proj_weight,in_proj_bias}`` (packed QKV),
    ``...self_attention.out_proj.{weight,bias}``,
    ``...mlp.{0,3}.{weight,bias}`` (Linear-GELU-Drop-Linear-Drop Sequential,
    vanilla_vit.py:22-56), ``encoder.ln.{weight,bias}``,
    ``heads.head.{weight,bias}``.
    """
    sd = dict(state_dict)
    if num_layers is None:
        layer_ids = [
            int(k.split("encoder_layer_")[1].split(".")[0])
            for k in sd if "encoder_layer_" in k
        ]
        if not layer_ids:
            raise KeyError(
                "checkpoint has no 'encoder.layers.encoder_layer_*' keys — "
                f"not a reference-layout ViT state_dict? ({len(sd)} keys, "
                f"e.g. {sorted(sd)[:3]})"
            )
        num_layers = 1 + max(layer_ids)

    encoder: Dict[str, Any] = {
        "pos_embedding": _np(_get(sd, "encoder.pos_embedding")),
        "ln": port_layernorm(
            _get(sd, "encoder.ln.weight"), _get(sd, "encoder.ln.bias")),
    }
    for i in range(num_layers):
        p = f"encoder.layers.encoder_layer_{i}"
        encoder[f"encoder_layer_{i}"] = {
            "ln_1": port_layernorm(
                _get(sd, f"{p}.ln_1.weight"), _get(sd, f"{p}.ln_1.bias")),
            "ln_2": port_layernorm(
                _get(sd, f"{p}.ln_2.weight"), _get(sd, f"{p}.ln_2.bias")),
            "self_attention": {
                "qkv": port_linear(
                    _get(sd, f"{p}.self_attention.in_proj_weight"),
                    _get(sd, f"{p}.self_attention.in_proj_bias")),
                "out": port_linear(
                    _get(sd, f"{p}.self_attention.out_proj.weight"),
                    _get(sd, f"{p}.self_attention.out_proj.bias")),
            },
            "mlp": {
                "fc1": port_linear(
                    _get(sd, f"{p}.mlp.0.weight"), _get(sd, f"{p}.mlp.0.bias")),
                "fc2": port_linear(
                    _get(sd, f"{p}.mlp.3.weight"), _get(sd, f"{p}.mlp.3.bias")),
            },
        }

    params = {
        "conv_proj": {"proj": {
            "kernel": port_patchify_conv(_get(sd, "conv_proj.weight")),
            "bias": _np(_get(sd, "conv_proj.bias")),
        }},
        "class_token": _np(_get(sd, "class_token")),
        "encoder": encoder,
        "head": port_linear(
            _get(sd, "heads.head.weight"), _get(sd, "heads.head.bias")),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def _port_swin_attn(sd: Mapping[str, Any], p: str, v2: bool) -> Dict:
    attn: Dict[str, Any] = {
        "qkv_kernel": _np(_get(sd, f"{p}.qkv.weight")).T,
        "proj_kernel": _np(_get(sd, f"{p}.proj.weight")).T,
    }
    if f"{p}.proj.bias" in sd:
        attn["proj_bias"] = _np(sd[f"{p}.proj.bias"])
    if v2:
        attn["logit_scale"] = _np(_get(sd, f"{p}.logit_scale"))
        # torchvision V2 keeps one packed qkv.bias with the k third zeroed
        # at init; our module stores learned q/v biases and a constant-zero
        # k bias (ops/windows.py ShiftedWindowAttentionV2).
        if f"{p}.qkv.bias" in sd:
            b = _np(sd[f"{p}.qkv.bias"])
            d = b.shape[0] // 3
            attn["q_bias"], attn["v_bias"] = b[:d], b[2 * d:]
        attn["cpb_fc1"] = port_linear(
            _get(sd, f"{p}.cpb_mlp.0.weight"), _get(sd, f"{p}.cpb_mlp.0.bias"))
        attn["cpb_fc2"] = {"kernel": _np(_get(sd, f"{p}.cpb_mlp.2.weight")).T}
    else:
        if f"{p}.qkv.bias" in sd:
            attn["qkv_bias"] = _np(sd[f"{p}.qkv.bias"])
        attn["relative_position_bias_table"] = _np(
            _get(sd, f"{p}.relative_position_bias_table"))
    return attn


def port_swin_state_dict(state_dict: Mapping[str, Any],
                         depths: Sequence[int],
                         v2: bool = False) -> Dict:
    """Reference/torchvision Swin ``state_dict`` → flax params for our
    SwinTransformer (``v2=True`` for torchvision SwinV2 checkpoints).

    torchvision ``features`` Sequential layout (swin_transformer.py:252-279):
    ``features.0`` = patch embed (conv, Permute, LN); then per stage i,
    ``features.{2i+1}`` = block Sequential and ``features.{2i+2}`` =
    PatchMerging (absent after the last stage). Our param names:
    ``patch_embed``/``patch_norm``, ``stage{i}_block{j}.*``, ``merge{i}.*``,
    ``norm``, ``head``.
    """
    sd = dict(state_dict)
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": port_conv_nchw(_get(sd, "features.0.0.weight")),
            "bias": _np(_get(sd, "features.0.0.bias")),
        },
        "patch_norm": port_layernorm(
            _get(sd, "features.0.2.weight"), _get(sd, "features.0.2.bias")),
        "norm": port_layernorm(
            _get(sd, "norm.weight"), _get(sd, "norm.bias")),
        "head": port_linear(
            _get(sd, "head.weight"), _get(sd, "head.bias")),
    }
    for i_stage, depth in enumerate(depths):
        feat = 2 * i_stage + 1
        for j in range(depth):
            p = f"features.{feat}.{j}"
            params[f"stage{i_stage}_block{j}"] = {
                "norm1": port_layernorm(
                    _get(sd, f"{p}.norm1.weight"), _get(sd, f"{p}.norm1.bias")),
                "norm2": port_layernorm(
                    _get(sd, f"{p}.norm2.weight"), _get(sd, f"{p}.norm2.bias")),
                "attn": _port_swin_attn(sd, f"{p}.attn", v2),
                "mlp": {
                    "fc1": port_linear(
                        _get(sd, f"{p}.mlp.0.weight"),
                        _get(sd, f"{p}.mlp.0.bias")),
                    "fc2": port_linear(
                        _get(sd, f"{p}.mlp.3.weight"),
                        _get(sd, f"{p}.mlp.3.bias")),
                },
            }
        if i_stage < len(depths) - 1:
            m = f"features.{2 * i_stage + 2}"
            merge: Dict[str, Any] = {
                "norm": port_layernorm(
                    _get(sd, f"{m}.norm.weight"), _get(sd, f"{m}.norm.bias")),
                "reduction": port_linear(
                    _get(sd, f"{m}.reduction.weight"),
                    sd.get(f"{m}.reduction.bias")),
            }
            if "bias" not in merge["reduction"]:
                # torchvision uses bias-free reduction; ours carries a bias
                # param (reference swin_transformer.py:140 keeps the default
                # bias=True) — zero is the identity fill.
                out_dim = merge["reduction"]["kernel"].shape[1]
                merge["reduction"]["bias"] = np.zeros(out_dim, np.float32)
            params[f"merge{i_stage}"] = merge
    return jax.tree_util.tree_map(jnp.asarray, params)
