"""Torch-checkpoint → flax-parameter converters.

Loads the published UDiffText/SD2 checkpoints into the TPU-native models:
  - `512-inpainting-ema.ckpt` / fine-tuned UDiffText `.ckpt` (Lightning
    pickle with a `state_dict`; UNet under `model.diffusion_model.`,
    reference sgm/models/diffusion.py:87-105)
  - `AE_inpainting_2.safetensors` (VAE, autoencoder.py:49-72)
  - LabelEncoder `.ckpt` (encoders/modules.py:1106-1107)
  - PARSeq `parseq-bb5792a6.pt`, ViTSTR `.pth` (predictors/model.py:12-14,
    encoders/modules.py:1049-1050)

Transforms: Conv2d OIHW→HWIO, Linear (out,in)→(in,out), norm weight→scale.
Key translation is rule-based on the torch module-path grammar; the flax path
layout is pinned by the models' explicit `name=` assignments (models/unet.py,
models/vae.py, models/label_encoder.py), so translation cannot drift from the
model topology.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Loading raw torch state dicts (torch-free where possible)
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a `.ckpt`/`.pt`/`.pth` (torch pickle) or `.safetensors` file into
    a flat dict of numpy arrays. Uses torch (CPU build) when present."""
    path = str(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "numpy") or hasattr(v, "detach")}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Value transforms
# ---------------------------------------------------------------------------


def t_conv(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def t_lin(w: np.ndarray) -> np.ndarray:
    """(out, in) → (in, out)."""
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _leaf(kind: str, wb: str) -> Tuple[str, ...]:
    """Map (torch param kind, weight|bias) to the flax leaf path suffix."""
    if kind == "conv":
        return ("Conv_0", "kernel" if wb == "weight" else "bias")
    if kind == "lin":
        return ("Dense_0", "kernel" if wb == "weight" else "bias")
    if kind == "gn":
        return ("GroupNorm_0", "scale" if wb == "weight" else "bias")
    if kind == "ln":
        return ("LayerNorm_0", "scale" if wb == "weight" else "bias")
    raise ValueError(kind)


def _val(kind: str, wb: str, v: np.ndarray) -> np.ndarray:
    if wb == "weight":
        if kind == "conv":
            return t_conv(v)
        if kind == "lin":
            return t_lin(v)
    return v


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

_RES_SUB = {
    "in_layers.0": ("in_norm", "gn"),
    "in_layers.2": ("in_conv", "conv"),
    "emb_layers.1": ("emb_proj", "lin"),
    "out_layers.0": ("out_norm", "gn"),
    "out_layers.3": ("out_conv", "conv"),
    "skip_connection": ("skip", "conv"),
}

_ATTN_INNER = {
    "attn1.to_q": ("attn1", "to_q", "lin"),
    "attn1.to_k": ("attn1", "to_k", "lin"),
    "attn1.to_v": ("attn1", "to_v", "lin"),
    "attn1.to_out.0": ("attn1", "to_out", "lin"),
    "t_attn.to_q": ("t_attn", "to_q", "lin"),
    "t_attn.to_k": ("t_attn", "to_k", "lin"),
    "t_attn.to_v": ("t_attn", "to_v", "lin"),
    "t_attn.to_out.0": ("t_attn", "to_out", "lin"),
    "v_attn.to_q": ("v_attn", "to_q", "lin"),
    "v_attn.to_k": ("v_attn", "to_k", "lin"),
    "v_attn.to_v": ("v_attn", "to_v", "lin"),
    "v_attn.to_out.0": ("v_attn", "to_out", "lin"),
    "ff.net.0.proj": ("ff", "proj", "lin"),
    "ff.net.2": ("ff", "out", "lin"),
    "norm1": ("norm1", None, "ln"),
    "norm3": ("norm3", None, "ln"),
    "t_norm": ("t_norm", None, "ln"),
    "v_norm": ("v_norm", None, "ln"),
}


def _convert_spatial_transformer(
    rest: str, wb: str, v: np.ndarray, base: Tuple[str, ...], out: Dict
) -> bool:
    """rest is the torch path inside a SpatialTransformer module."""
    if rest == "norm":
        _set(out, base + ("norm",) + _leaf("gn", wb), v)
        return True
    if rest in ("proj_in", "proj_out"):
        # use_linear_in_transformer=True ⇒ Linear; conv variant has 4D weight
        kind = "lin" if v.ndim <= 2 else "conv"
        _set(out, base + (rest,) + _leaf(kind, wb), _val(kind, wb, v))
        return True
    if rest.startswith("transformer_blocks."):
        parts = rest.split(".")
        d = parts[1]
        inner = ".".join(parts[2:])
        if inner in _ATTN_INNER:
            mod, sub, kind = _ATTN_INNER[inner]
            path = (f"blocks_{d}", mod) + ((sub,) if sub else ())
            _set(out, base + path + _leaf(kind, wb), _val(kind, wb, v))
            return True
    return False


def convert_unet(sd: Dict[str, np.ndarray], prefix: str = "model.diffusion_model.") -> Dict:
    """Translate a torch UnifiedUNetModel state dict into flax params."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    out: Dict = {}
    unknown = []
    for key, v in sd.items():
        parts = key.split(".")
        wb = parts[-1]
        if wb not in ("weight", "bias"):
            unknown.append(key)
            continue
        body = ".".join(parts[:-1])

        if body in ("time_embed.0", "time_embed.2"):
            _set(out, (f"time_embed_{body[-1]}",) + _leaf("lin", wb), _val("lin", wb, v))
            continue
        if body in ("label_emb.0.0", "label_emb.0.2"):
            _set(out, (f"label_embed_{body[-1]}",) + _leaf("lin", wb), _val("lin", wb, v))
            continue
        if body == "out.0":
            _set(out, ("out_norm",) + _leaf("gn", wb), v)
            continue
        if body == "out.2":
            _set(out, ("out_conv",) + _leaf("conv", wb), _val("conv", wb, v))
            continue
        if body.startswith("ctrl_block."):
            idx = int(body.split(".")[1])
            # torch ctrl_block Sequential: convs at even indices 0..12, zero conv at 14
            ci = idx // 2
            name = "ctrl_conv_out" if ci == 7 else f"ctrl_conv_{ci}"
            _set(out, (name,) + _leaf("conv", wb), _val("conv", wb, v))
            continue

        for group in ("input_blocks", "output_blocks", "middle_block"):
            if not body.startswith(group + "."):
                continue
            parts2 = body[len(group) + 1 :].split(".")
            if group == "middle_block":
                j = parts2[0]
                base = (f"middle_block_{j}",)
                rest = ".".join(parts2[1:])
            else:
                i, j = parts2[0], parts2[1]
                base = (f"{group}_{i}_{j}",)
                rest = ".".join(parts2[2:])

            if rest == "":  # bare conv: input_blocks.0.0.{weight,bias}
                _set(out, base + _leaf("conv", wb), _val("conv", wb, v))
                break
            if rest in _RES_SUB:
                name, kind = _RES_SUB[rest]
                _set(out, base + (name,) + _leaf(kind, wb), _val(kind, wb, v))
                break
            if rest == "op":  # Downsample conv
                _set(out, base + ("op",) + _leaf("conv", wb), _val("conv", wb, v))
                break
            if rest == "conv":  # Upsample conv
                _set(out, base + ("conv",) + _leaf("conv", wb), _val("conv", wb, v))
                break
            if _convert_spatial_transformer(rest, wb, v, base, out):
                break
            unknown.append(key)
            break
        else:
            unknown.append(key)
    return {"params": out, "unknown": unknown}


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

_VAE_RES_SUB = {
    "norm1": ("norm1", "gn"),
    "conv1": ("conv1", "conv"),
    "norm2": ("norm2", "gn"),
    "conv2": ("conv2", "conv"),
    "nin_shortcut": ("nin_shortcut", "conv"),
    "conv_shortcut": ("nin_shortcut", "conv"),
}

_VAE_ATTN_SUB = {
    "norm": ("norm", "gn"),
    "q": ("q", "conv"),
    "k": ("k", "conv"),
    "v": ("v", "conv"),
    "proj_out": ("proj_out", "conv"),
}


def _convert_vae_side(side_sd: Dict[str, np.ndarray], side: str, out: Dict, unknown):
    """side ∈ {encoder, decoder}; torch keys relative to the side module."""
    updown = "down" if side == "encoder" else "up"
    for key, v in side_sd.items():
        parts = key.split(".")
        wb = parts[-1]
        body = parts[:-1]
        base = (side,)
        if body[0] in ("conv_in", "conv_out"):
            _set(out, base + (body[0],) + _leaf("conv", wb), _val("conv", wb, v))
        elif body[0] == "norm_out":
            _set(out, base + ("norm_out",) + _leaf("gn", wb), v)
        elif body[0] == "mid":
            mod = body[1]  # block_1 | attn_1 | block_2
            sub = body[2]
            table = _VAE_ATTN_SUB if mod == "attn_1" else _VAE_RES_SUB
            name, kind = table[sub]
            _set(out, base + (f"mid_{mod}", name) + _leaf(kind, wb), _val(kind, wb, v))
        elif body[0] == updown:
            i = body[1]
            if body[2] == "block":
                j = body[3]
                name, kind = _VAE_RES_SUB[body[4]]
                _set(out, base + (f"{updown}_{i}_block_{j}", name) + _leaf(kind, wb), _val(kind, wb, v))
            elif body[2] == "attn":
                j = body[3]
                name, kind = _VAE_ATTN_SUB[body[4]]
                _set(out, base + (f"{updown}_{i}_attn_{j}", name) + _leaf(kind, wb), _val(kind, wb, v))
            elif body[2] in ("downsample", "upsample"):
                if side == "encoder":
                    # VAEDownsample uses a bare nn.Conv named "conv"
                    _set(
                        out,
                        base + (f"{updown}_{i}_{body[2]}", "conv", "kernel" if wb == "weight" else "bias"),
                        _val("conv", wb, v),
                    )
                else:
                    _set(out, base + (f"{updown}_{i}_{body[2]}", "conv") + _leaf("conv", wb), _val("conv", wb, v))
            else:
                unknown.append(f"{side}.{key}")
        else:
            unknown.append(f"{side}.{key}")


def convert_vae(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    out: Dict = {}
    unknown = []
    for side in ("encoder", "decoder"):
        _convert_vae_side(strip_prefix(sd, side + "."), side, out, unknown)
    for qc in ("quant_conv", "post_quant_conv"):
        for wb in ("weight", "bias"):
            k = f"{qc}.{wb}"
            if k in sd:
                _set(out, (qc,) + _leaf("conv", wb), _val("conv", wb, sd[k]))
    return {"params": out, "unknown": unknown}


# ---------------------------------------------------------------------------
# LabelEncoder
# ---------------------------------------------------------------------------


def convert_label_encoder(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """Core LabelEncoder weights (embedding + transformer encoder) only; the
    pretraining heads are converted separately when present."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    out: Dict = {}
    unknown = []
    for key, v in sd.items():
        if key == "label_embedding.weight":
            _set(out, ("label_embedding", "embedding"), v)
            continue
        if key == "pos_embedding.pe":
            # fixed sinusoidal buffer — recomputed in the flax model
            continue
        if key.startswith("encoder.layers."):
            parts = key.split(".")
            n = parts[2]
            sub = ".".join(parts[3:-1])
            wb = parts[-1]
            base = (f"layers_{n}",)
            if sub == "self_attn" and parts[-1] in ("in_proj_weight", "in_proj_bias"):
                wb = "weight" if parts[-1].endswith("weight") else "bias"
                _set(out, base + ("self_attn", "in_proj") + _leaf("lin", wb), _val("lin", wb, v))
            elif sub == "self_attn.out_proj":
                _set(out, base + ("self_attn", "out_proj") + _leaf("lin", wb), _val("lin", wb, v))
            elif sub in ("linear1", "linear2"):
                _set(out, base + (sub,) + _leaf("lin", wb), _val("lin", wb, v))
            elif sub in ("norm1", "norm2"):
                # flax LabelEncoder uses nn.LayerNorm directly (no wrapper level)
                _set(out, base + (sub, "scale" if wb == "weight" else "bias"), v)
            else:
                unknown.append(key)
            continue
        unknown.append(key)
    return {"params": out, "unknown": unknown}


# ---------------------------------------------------------------------------
# ViT (timm naming) / PARSeq / ViTSTR
# ---------------------------------------------------------------------------


def convert_vit(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """timm VisionTransformer state dict → models/vit.py ViTEncoder params."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    out: Dict = {}
    unknown = []
    for key, v in sd.items():
        parts = key.split(".")
        if key == "pos_embed":
            _set(out, ("pos_embed",), v)
        elif key == "cls_token":
            _set(out, ("cls_token",), v.reshape(1, 1, -1))
        elif parts[0] == "patch_embed" and parts[1] == "proj":
            wb = parts[2]
            _set(out, ("patch_embed", "proj", "kernel" if wb == "weight" else "bias"),
                 t_conv(v) if wb == "weight" else v)
        elif parts[0] == "blocks":
            n, sub, wb = parts[1], ".".join(parts[2:-1]), parts[-1]
            base = (f"blocks_{n}",)
            if sub in ("norm1", "norm2"):
                _set(out, base + (sub, "scale" if wb == "weight" else "bias"), v)
            elif sub in ("attn.qkv", "attn.proj"):
                mod = sub.split(".")[1]
                _set(out, base + ("attn", mod) + _leaf("lin", wb), _val("lin", wb, v))
            elif sub in ("mlp.fc1", "mlp.fc2"):
                mod = sub.split(".")[1]
                _set(out, base + ("mlp", mod) + _leaf("lin", wb), _val("lin", wb, v))
            else:
                unknown.append(key)
        elif parts[0] == "norm":
            _set(out, ("norm", "scale" if parts[-1] == "weight" else "bias"), v)
        else:
            unknown.append(key)
    return {"params": out, "unknown": unknown}


def convert_parseq(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """PARSeq checkpoint (parseq-bb5792a6.pt) → models/parseq.py params."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    out: Dict = {}
    unknown = []

    enc = convert_vit(strip_prefix(sd, "encoder."))
    out["encoder"] = enc["params"]
    unknown += [f"encoder.{k}" for k in enc["unknown"]]

    for key, v in sd.items():
        if key.startswith("encoder."):
            continue
        parts = key.split(".")
        if key == "pos_queries":
            _set(out, ("pos_queries",), v)
        elif key == "text_embed.embedding.weight":
            _set(out, ("text_embed", "embedding"), v)
        elif parts[0] == "head":
            _set(out, ("head",) + _leaf("lin", parts[-1]), _val("lin", parts[-1], v))
        elif parts[0] == "decoder" and parts[1] == "norm":
            _set(out, ("decoder_norm", "scale" if parts[-1] == "weight" else "bias"), v)
        elif parts[0] == "decoder" and parts[1] == "layers":
            n = parts[2]
            sub = ".".join(parts[3:-1])
            wb = parts[-1]
            base = (f"decoder_layers_{n}",)
            if parts[3] in ("self_attn", "cross_attn"):
                attn = parts[3]
                if wb in ("in_proj_weight", "in_proj_bias"):
                    kind = "kernel" if wb.endswith("weight") else "bias"
                    vv = t_lin(v) if kind == "kernel" else v
                    _set(out, base + (attn, f"in_proj_{kind}"), vv)
                elif sub.endswith("out_proj"):
                    _set(out, base + (attn, "out_proj") + _leaf("lin", wb), _val("lin", wb, v))
                else:
                    unknown.append(key)
            elif sub in ("linear1", "linear2"):
                _set(out, base + (sub,) + _leaf("lin", wb), _val("lin", wb, v))
            elif sub in ("norm1", "norm2", "norm_q", "norm_c"):
                _set(out, base + (sub, "scale" if wb == "weight" else "bias"), v)
            else:
                unknown.append(key)
        else:
            unknown.append(key)
    return {"params": out, "unknown": unknown}


def convert_vitstr(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """ViTSTR checkpoint → models/vit.py ViTSTREncoder params (features only;
    the classifier head in the ckpt is dropped, matching the reference which
    replaces it and only consumes features — encoders/modules.py:1030-1066)."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    core = {k: v for k, v in sd.items() if not k.startswith(("head", "dist_token", "pre_logits"))}
    conv = convert_vit(core)
    return {"params": {"vit": conv["params"]}, "unknown": conv["unknown"]}


# ---------------------------------------------------------------------------
# Merging converted weights into initialized param trees (strict=False load)
# ---------------------------------------------------------------------------


def merge_params(init_params: Dict, loaded: Dict, path: str = ""):
    """Deep-merge `loaded` into a copy of `init_params`, keeping init values
    for missing leaves (the reference's strict=False bootstrap semantics,
    diffusion.py:87-105). Returns (merged, missing, unexpected, mismatched).
    """
    missing, unexpected, mismatched = [], [], []

    def rec(init_node, loaded_node, p):
        if not isinstance(init_node, dict):
            if loaded_node is None:
                missing.append(p)
                return init_node
            if tuple(getattr(loaded_node, "shape", ())) != tuple(init_node.shape):
                mismatched.append(
                    f"{p}: ckpt{tuple(loaded_node.shape)} vs init{tuple(init_node.shape)}"
                )
                return init_node
            return np.asarray(loaded_node).astype(np.asarray(init_node).dtype)
        out = {}
        loaded_node = loaded_node if isinstance(loaded_node, dict) else {}
        for k, v in init_node.items():
            out[k] = rec(v, loaded_node.get(k), f"{p}/{k}" if p else k)
        for k in loaded_node:
            if k not in init_node:
                unexpected.append(f"{p}/{k}" if p else k)
        return out

    merged = rec(init_params, loaded, path)
    return merged, missing, unexpected, mismatched


# ---------------------------------------------------------------------------
# TRBA (strhub trba/*.py) — incl. torch-LSTM → flax per-gate layout
# ---------------------------------------------------------------------------


def _lstm_gates(out: Dict, base: Tuple[str, ...], w_ih, w_hh, b_ih, b_hh):
    """torch LSTM packed (4h, in) [i,f,g,o] chunks → flax ii/if/ig/io kernels
    (+ hi/hf/hg/ho with combined bias)."""
    h = w_hh.shape[1]
    names = ("i", "f", "g", "o")
    for gi, gname in enumerate(names):
        sl = slice(gi * h, (gi + 1) * h)
        _set(out, base + (f"i{gname}", "kernel"), t_lin(w_ih[sl]))
        _set(out, base + (f"h{gname}", "kernel"), t_lin(w_hh[sl]))
        _set(out, base + (f"h{gname}", "bias"), b_ih[sl] + b_hh[sl])


def _set_bn(params: Dict, stats: Dict, path: Tuple[str, ...], sub: str, v):
    if sub == "weight":
        _set(params, path + ("scale",), v)
    elif sub == "bias":
        _set(params, path + ("bias",), v)
    elif sub == "running_mean":
        _set(stats, path + ("mean",), v)
    elif sub == "running_var":
        _set(stats, path + ("var",), v)


def convert_trba(sd: Dict[str, np.ndarray], prefix: str = "model.") -> Dict:
    """strhub TRBA checkpoint → models/trba.py params + batch_stats."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    params: Dict = {}
    stats: Dict = {}
    unknown = []

    # torch Sequential indices of the localization conv stack: convs at
    # 0,4,8,12 and BNs at 1,5,9,13 (transformation.py:50-60)
    loc_conv = {0: 0, 4: 1, 8: 2, 12: 3}
    loc_bn = {1: 0, 5: 1, 9: 2, 13: 3}

    # collect LSTM tensors, emit once per cell
    lstms: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}

    for key, v in sd.items():
        parts = key.split(".")
        if key.endswith("num_batches_tracked"):
            continue
        if parts[0] == "Transformation":
            body = parts[2:]
            if body[0] == "conv":
                idx = int(body[1])
                if idx in loc_conv and body[2] == "weight":
                    _set(params, ("tps", "loc", f"conv{loc_conv[idx]}", "kernel"), t_conv(v))
                elif idx in loc_bn:
                    _set_bn(params, stats, ("tps", "loc", f"bn{loc_bn[idx]}"), body[2], v)
                else:
                    unknown.append(key)
            elif body[0] == "localization_fc1":
                _set(params, ("tps", "loc", "fc1", "Dense_0",
                              "kernel" if body[2] == "weight" else "bias"),
                     _val("lin", body[2], v))
            elif body[0] == "localization_fc2":
                if body[1] == "weight":
                    _set(params, ("tps", "loc", "fc2_kernel"), t_lin(v))
                else:
                    _set(params, ("tps", "loc", "fc2_bias"), v)
            elif parts[1] == "GridGenerator":
                continue  # closed-form constants, recomputed
            else:
                unknown.append(key)
        elif parts[0] == "FeatureExtraction":
            body = parts[2:]  # skip 'ConvNet'
            name, sub = body[0], body[-1]
            if name.startswith("layer"):
                li, bi = name[5:], body[1]
                base = ("resnet", f"layer{li}_{bi}")
                mod = body[2]
                if mod in ("conv1", "conv2"):
                    _set(params, base + (mod, "kernel"), t_conv(v))
                elif mod in ("bn1", "bn2"):
                    _set_bn(params, stats, base + (mod,), sub, v)
                elif mod == "downsample":
                    if body[3] == "0":
                        _set(params, base + ("down_conv", "kernel"), t_conv(v))
                    else:
                        _set_bn(params, stats, base + ("down_bn",), sub, v)
                else:
                    unknown.append(key)
            elif name.startswith("conv"):
                _set(params, ("resnet", name, "kernel"), t_conv(v))
            elif name.startswith("bn"):
                _set_bn(params, stats, ("resnet", name), sub, v)
            else:
                unknown.append(key)
        elif parts[0] == "SequenceModeling":
            mod = f"rnn{parts[1]}"
            if parts[2] == "rnn":
                lstms.setdefault((mod,), {})[parts[3]] = v
            elif parts[2] == "linear":
                _set(params, (mod, "proj", "Dense_0",
                              "kernel" if parts[3] == "weight" else "bias"),
                     _val("lin", parts[3], v))
            else:
                unknown.append(key)
        elif parts[0] == "Prediction":
            body = parts[1:]
            if body[0] == "attention_cell":
                mod = body[1]
                if mod in ("i2h", "h2h", "score"):
                    _set(params, ("attn", "cell", mod, "Dense_0",
                                  "kernel" if body[2] == "weight" else "bias"),
                         _val("lin", body[2], v))
                elif mod == "rnn":
                    lstms.setdefault(("attn", "cell", "rnn"), {})[body[2]] = v
                else:
                    unknown.append(key)
            elif body[0] == "generator":
                _set(params, ("attn", "generator", "Dense_0",
                              "kernel" if body[1] == "weight" else "bias"),
                     _val("lin", body[1], v))
            elif body[0] == "char_embeddings":
                _set(params, ("attn", "char_embeddings", "embedding"), v)
            else:
                unknown.append(key)
        else:
            unknown.append(key)

    for base, tensors in lstms.items():
        if "weight_ih" in tensors:  # LSTMCell (attention decoder)
            _lstm_gates(params, base, tensors["weight_ih"], tensors["weight_hh"],
                        tensors["bias_ih"], tensors["bias_hh"])
        else:  # bidirectional nn.LSTM: fwd = cell_0, reverse = cell_1
            _lstm_gates(params, base + ("OptimizedLSTMCell_0",),
                        tensors["weight_ih_l0"], tensors["weight_hh_l0"],
                        tensors["bias_ih_l0"], tensors["bias_hh_l0"])
            _lstm_gates(params, base + ("OptimizedLSTMCell_1",),
                        tensors["weight_ih_l0_reverse"], tensors["weight_hh_l0_reverse"],
                        tensors["bias_ih_l0_reverse"], tensors["bias_hh_l0_reverse"])

    return {"params": params, "batch_stats": stats, "unknown": unknown}


# ---------------------------------------------------------------------------
# ABINet (strhub abinet/*.py)
# ---------------------------------------------------------------------------


def _abi_mha(out: Dict, base: Tuple[str, ...], sub: str, wb: str, v):
    """torch nn.MultiheadAttention → TorchMHA paths."""
    if sub in ("in_proj_weight", "in_proj_bias"):
        kind = "kernel" if sub.endswith("weight") else "bias"
        _set(out, base + (f"in_proj_{kind}",), t_lin(v) if kind == "kernel" else v)
    elif sub == "out_proj":
        _set(out, base + ("out_proj",) + _leaf("lin", wb), _val("lin", wb, v))


def convert_abinet(sd: Dict[str, np.ndarray], prefix: str = "model.") -> Dict:
    """strhub ABINet checkpoint → models/abinet.py params + batch_stats."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    params: Dict = {}
    stats: Dict = {}
    unknown = []

    for key, v in sd.items():
        if key.endswith("num_batches_tracked") or ".pe" in key:
            continue  # BN counters / fixed positional buffers (recomputed)
        parts = key.split(".")
        wb = parts[-1]

        if parts[0] == "vision":
            if parts[1] == "backbone" and parts[2] == "resnet":
                body = parts[3:]
                base = ("vision", "backbone", "resnet")
                if body[0] == "conv1":
                    _set(params, base + ("conv0", "kernel"), t_conv(v))
                elif body[0] == "bn1" and len(body) == 2:
                    _set_bn(params, stats, base + ("bn0",), wb, v)
                elif body[0].startswith("layer"):
                    li, bi = body[0][5:], body[1]
                    bb = base + (f"layer{li}_{bi}",)
                    mod = body[2]
                    if mod in ("conv1", "conv2"):
                        _set(params, bb + (mod, "kernel"), t_conv(v))
                    elif mod in ("bn1", "bn2"):
                        _set_bn(params, stats, bb + (mod,), wb, v)
                    elif mod == "downsample":
                        if body[3] == "0":
                            _set(params, bb + ("down_conv", "kernel"), t_conv(v))
                        else:
                            _set_bn(params, stats, bb + ("down_bn",), wb, v)
                    else:
                        unknown.append(key)
                else:
                    unknown.append(key)
            elif parts[1] == "backbone" and parts[2] == "transformer":
                n = parts[4]
                base = ("vision", "backbone", f"enc_{n}")
                sub = parts[5]
                if sub == "self_attn":
                    _abi_mha(params, base + ("self_attn",),
                             parts[6] if parts[6].startswith("in_proj") else "out_proj",
                             wb, v)
                elif sub in ("linear1", "linear2"):
                    _set(params, base + (sub,) + _leaf("lin", wb), _val("lin", wb, v))
                elif sub in ("norm1", "norm2"):
                    _set(params, base + (sub, "scale" if wb == "weight" else "bias"), v)
                else:
                    unknown.append(key)
            elif parts[1] == "attention":
                base = ("vision", "attention")
                if parts[2] == "k_encoder":
                    i, j = parts[3], parts[4]  # Sequential(conv=0, bn=1)
                    if j == "0":
                        _set(params, base + (f"ke_conv{i}",) + (("kernel",) if wb == "weight" else ("bias",)), _val("conv", wb, v))
                    else:
                        _set_bn(params, stats, base + (f"ke_bn{i}",), wb, v)
                elif parts[2] == "k_decoder":
                    i, j = parts[3], parts[4]  # Sequential(up=0, conv=1, bn=2)
                    if j == "1":
                        _set(params, base + (f"kd_conv{i}",) + (("kernel",) if wb == "weight" else ("bias",)), _val("conv", wb, v))
                    else:
                        _set_bn(params, stats, base + (f"kd_bn{i}",), wb, v)
                elif parts[2] == "project":
                    _set(params, base + ("project",) + _leaf("lin", wb), _val("lin", wb, v))
                else:
                    unknown.append(key)
            elif parts[1] == "cls":
                _set(params, ("vision", "cls") + _leaf("lin", wb), _val("lin", wb, v))
            else:
                unknown.append(key)
        elif parts[0] == "language":
            if parts[1] == "proj":
                _set(params, ("language", "proj") + _leaf("lin", wb), _val("lin", wb, v))
            elif parts[1] == "model" and parts[2] == "layers":
                n = parts[3]
                base = ("language", f"layer_{n}")
                sub = parts[4]
                if sub == "multihead_attn":
                    _abi_mha(params, base + ("multihead_attn",),
                             parts[5] if parts[5].startswith("in_proj") else "out_proj",
                             wb, v)
                elif sub in ("linear1", "linear2"):
                    _set(params, base + (sub,) + _leaf("lin", wb), _val("lin", wb, v))
                elif sub in ("norm2", "norm3"):
                    _set(params, base + (sub, "scale" if wb == "weight" else "bias"), v)
                else:
                    unknown.append(key)
            elif parts[1] == "cls":
                _set(params, ("language", "cls") + _leaf("lin", wb), _val("lin", wb, v))
            else:
                unknown.append(key)
        elif parts[0] == "alignment":
            if parts[1] in ("w_att", "cls"):
                _set(params, ("alignment", parts[1]) + _leaf("lin", wb), _val("lin", wb, v))
            else:
                unknown.append(key)
        else:
            unknown.append(key)

    return {"params": params, "batch_stats": stats, "unknown": unknown}


def convert_crnn(sd: Dict[str, np.ndarray], prefix: str = "model.") -> Dict:
    """strhub CRNN checkpoint → models/str_models.py CRNN params."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    params: Dict = {}
    stats: Dict = {}
    unknown = []
    lstms: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}

    for key, v in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        wb = parts[-1]
        if parts[0] == "cnn":
            name = parts[1]
            if name.startswith("conv"):
                _set(params, (name, "kernel" if wb == "weight" else "bias"),
                     _val("conv", wb, v))
            elif name.startswith("batchnorm"):
                _set_bn(params, stats, (f"bn{name[9:]}",), wb, v)
            else:
                unknown.append(key)
        elif parts[0] == "rnn":
            mod = f"rnn{parts[1]}"
            if parts[2] == "rnn":
                lstms.setdefault((mod,), {})[parts[3]] = v
            elif parts[2] == "linear":
                _set(params, (mod, "proj", "Dense_0",
                              "kernel" if wb == "weight" else "bias"),
                     _val("lin", wb, v))
            else:
                unknown.append(key)
        else:
            unknown.append(key)

    for base, tensors in lstms.items():
        _lstm_gates(params, base + ("OptimizedLSTMCell_0",),
                    tensors["weight_ih_l0"], tensors["weight_hh_l0"],
                    tensors["bias_ih_l0"], tensors["bias_hh_l0"])
        _lstm_gates(params, base + ("OptimizedLSTMCell_1",),
                    tensors["weight_ih_l0_reverse"], tensors["weight_hh_l0_reverse"],
                    tensors["bias_ih_l0_reverse"], tensors["bias_hh_l0_reverse"])

    return {"params": params, "batch_stats": stats, "unknown": unknown}


# ---------------------------------------------------------------------------
# Metrics models: FID InceptionV3 (pytorch_fid pool3 variant) and LPIPS-alex
# ---------------------------------------------------------------------------


def convert_fid_inception(sd: Dict[str, np.ndarray]) -> Dict:
    """pytorch_fid / torchvision InceptionV3 state dict →
    models/inception.FIDInceptionV3 params. AuxLogits / fc are dropped
    (pool3 features only, matching `python -m pytorch_fid`)."""
    params: Dict = {}
    unknown = []
    for key, v in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[0] in ("AuxLogits", "fc"):
            continue
        # {Block}.{branch}.conv.weight / .bn.{weight,bias,running_mean,running_var}
        *mods, sub, wb = parts
        base = tuple(mods)
        if sub == "conv" and wb == "weight":
            _set(params, base + ("conv", "kernel"), t_conv(v))
        elif sub == "bn":
            leaf = {
                "weight": "bn_weight", "bias": "bn_bias",
                "running_mean": "bn_mean", "running_var": "bn_var",
            }.get(wb)
            if leaf is None:
                unknown.append(key)
            else:
                _set(params, base + (leaf,), v)
        else:
            unknown.append(key)
    return {"params": params, "unknown": unknown}


def convert_lpips_alex(
    sd: Dict[str, np.ndarray], alexnet_sd: Optional[Dict[str, np.ndarray]] = None
) -> Dict:
    """LPIPS(net='alex') state dict → models/lpips.LPIPSAlex params.

    Accepts either a full lpips module dump (net.sliceK.I.weight +
    linK.model.1.weight) or the lpips package's lin-only .pth with the
    torchvision AlexNet weights (features.I.weight) passed separately."""
    params: Dict = {}
    unknown = []
    merged = dict(sd)
    if alexnet_sd:
        merged.update({f"features_sep.{k}": v for k, v in alexnet_sd.items()})

    for key, v in merged.items():
        parts = key.split(".")
        if parts[0].startswith("lin") and parts[-1] == "weight":
            # linK.model.1.weight: (1, C, 1, 1) 1x1 conv → (C,) vector
            _set(params, (parts[0],), v.reshape(-1))
        elif parts[0] == "scaling_layer":
            continue  # constants, baked into the module
        elif parts[0] == "net" and parts[1].startswith("slice"):
            # net.sliceK.I.{weight,bias} — I is the torchvision features index
            idx, wb = parts[2], parts[3]
            _set(params, ("net", f"conv{idx}", "kernel" if wb == "weight" else "bias"),
                 t_conv(v) if wb == "weight" else v)
        elif parts[0] == "features_sep" and parts[1] == "features":
            idx, wb = parts[2], parts[3]
            if idx in ("0", "3", "6", "8", "10"):
                _set(params, ("net", f"conv{idx}",
                              "kernel" if wb == "weight" else "bias"),
                     t_conv(v) if wb == "weight" else v)
        elif parts[0] == "features_sep":
            continue  # classifier weights of a full alexnet dump
        else:
            unknown.append(key)
    return {"params": params, "unknown": unknown}


def _open_clip_resblocks(sub_sd: Dict[str, np.ndarray], out: Dict, unknown, ctx: str):
    """transformer.resblocks.{i}.* of an open_clip tower → ResidualAttentionBlock
    params (models/open_clip.py)."""
    for key, v in sub_sd.items():
        parts = key.split(".")
        if parts[0] != "resblocks":
            unknown.append(f"{ctx}transformer.{key}")
            continue
        n, wb = parts[1], parts[-1]
        sub = ".".join(parts[2:-1])
        base = (f"resblocks_{n}",)
        if sub in ("ln_1", "ln_2"):
            _set(out, base + (sub, "scale" if wb == "weight" else "bias"), v)
        elif sub == "attn" and wb in ("in_proj_weight", "in_proj_bias"):
            kind = "kernel" if wb.endswith("weight") else "bias"
            _set(out, base + ("attn", f"in_proj_{kind}"),
                 t_lin(v) if kind == "kernel" else v)
        elif sub == "attn.out_proj":
            _set(out, base + ("attn", "out_proj") + _leaf("lin", wb), _val("lin", wb, v))
        elif sub in ("mlp.c_fc", "mlp.c_proj"):
            mod = sub.split(".")[1]
            _set(out, base + (mod,) + _leaf("lin", wb), _val("lin", wb, v))
        else:
            unknown.append(f"{ctx}transformer.{key}")


def convert_open_clip(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """open_clip CLIP state dict (e.g. ViT-H-14 laion2b) → native tower params
    (models/open_clip.py): {"text": ..., "visual": ...}. Either tower may be
    absent (the reference deletes the unused one, modules.py:459,637)."""
    sd = strip_prefix(sd, prefix) if prefix else dict(sd)
    text: Dict = {}
    visual: Dict = {}
    unknown: list = []
    for key, v in sd.items():
        if key.startswith("visual."):
            k = key[len("visual."):]
            parts = k.split(".")
            if k in ("class_embedding", "positional_embedding", "proj"):
                _set(visual, (k,), v)
            elif k == "conv1.weight":
                _set(visual, ("conv1", "kernel"), t_conv(v))
            elif parts[0] in ("ln_pre", "ln_post"):
                _set(visual, (parts[0], "scale" if parts[-1] == "weight" else "bias"), v)
            elif parts[0] == "transformer":
                _open_clip_resblocks({k[len("transformer."):]: v}, visual, unknown,
                                     "visual.")
            else:
                unknown.append(key)
        elif key == "token_embedding.weight":
            _set(text, ("token_embedding", "embedding"), v)
        elif key in ("positional_embedding", "text_projection"):
            _set(text, (key,), v)
        elif key.startswith("ln_final."):
            _set(text, ("ln_final", "scale" if key.endswith("weight") else "bias"), v)
        elif key.startswith("transformer."):
            _open_clip_resblocks({key[len("transformer."):]: v}, text, unknown, "")
        elif key in ("logit_scale", "attn_mask"):
            pass  # contrastive head / mask buffer — rebuilt, not loaded
        else:
            unknown.append(key)
    return {"params": {"text": text, "visual": visual}, "unknown": unknown}
