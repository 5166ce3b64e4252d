"""Engine parameter initialization and checkpoint loading.

Mirrors the reference boot sequence (util.py:7-22 + diffusion.py:87-105):
build the model graph from YAML, initialize parameters, then strict=False
load a torch checkpoint — either a full UDiffText `.ckpt` (UNet + VAE +
LabelEncoder in one state dict) or the SD2-inpainting bootstrap checkpoint
(UNet trunk only; the fresh t_attn branches keep their zero-output init).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .builders import EngineBundle
from .utils import ckpt_torch as CT


def init_engine_params(
    bundle: EngineBundle, rng: jax.Array, image_size: Optional[int] = None,
    seq_len: int = 12,
) -> Dict[str, Any]:
    """Random-initialize all parameter collections.

    Conv/attention parameter shapes do not depend on the spatial size, so the
    init pass runs at the smallest latent the UNet's downsampling chain
    admits (image_size=None) — initializing a toy graph at a forced 512²
    would otherwise materialize giant init-time attention maps."""
    eng = bundle.engine
    if image_size is None:
        latent = 4 * 2 ** (len(eng.unet.channel_mult) - 1)
        image_size = latent * eng.latent_factor
    latent = image_size // eng.latent_factor
    k1, k2, k3 = jax.random.split(rng, 3)
    t_dim = eng.unet.t_context_dim or 2048
    y = (
        jnp.zeros((1, eng.unet.adm_in_channels))
        if eng.unet.use_label is not None
        else None
    )
    unet_params = eng.unet.init(
        k1,
        jnp.zeros((1, latent, latent, eng.unet.in_channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, seq_len, t_dim)),
        None,
        y,
    )
    vae_params = eng.vae.init(k2, jnp.zeros((1, image_size, image_size, 3)))
    le_params = eng.label_encoder.init(k3, jnp.zeros((1, seq_len), jnp.int32))
    params = {"unet": unet_params, "vae": vae_params, "label_encoder": le_params}
    if eng.general_conditioner is not None:
        extra = eng.general_conditioner.init_params(jax.random.fold_in(rng, 1))
        if extra:
            params["embedders"] = extra
    return params


def load_from_torch_ckpt(
    params: Dict[str, Any],
    ckpt_path: str,
    verbose: bool = True,
) -> Dict[str, Any]:
    """strict=False load of a UDiffText/SD2 checkpoint into `params`."""
    sd = CT.load_torch_state_dict(ckpt_path)
    out = dict(params)

    def _merge(collection: str, conv: Dict, label: str):
        merged, missing, unexpected, mismatched = CT.merge_params(
            jax.tree.map(np.asarray, params[collection]["params"]), conv["params"]
        )
        out[collection] = {"params": jax.tree.map(jnp.asarray, merged)}
        if verbose:
            print(
                f"[{label}] merged with {len(missing)} missing, "
                f"{len(unexpected)} unexpected, {len(mismatched)} mismatched keys"
            )
            for m in mismatched[:10]:
                print(f"  mismatch: {m}")

    if any(k.startswith("model.diffusion_model.") for k in sd):
        _merge("unet", CT.convert_unet(sd, "model.diffusion_model."), "unet")
    if any(k.startswith("first_stage_model.") for k in sd):
        _merge("vae", CT.convert_vae(sd, "first_stage_model."), "vae")
    elif any(k.startswith("encoder.conv_in") or k == "quant_conv.weight" for k in sd):
        _merge("vae", CT.convert_vae(sd), "vae")
    # LabelEncoder inside a full UDiffText ckpt lives under conditioner.embedders.0
    le_prefix = "conditioner.embedders.0."
    if any(k.startswith(le_prefix + "label_embedding") for k in sd):
        _merge(
            "label_encoder",
            CT.convert_label_encoder(CT.strip_prefix(sd, le_prefix)),
            "label_encoder",
        )
    elif any(k.startswith("label_embedding") for k in sd):
        _merge("label_encoder", CT.convert_label_encoder(sd), "label_encoder")
    return out


def load_component_ckpts(
    params: Dict[str, Any], bundle: EngineBundle, verbose: bool = True
) -> Dict[str, Any]:
    """Load the per-component checkpoint paths recorded in the model config
    (VAE safetensors, LabelEncoder ckpt) when the files exist."""
    import os

    out = dict(params)
    vae_path = bundle.ckpt_paths.get("vae")
    if vae_path and os.path.exists(vae_path):
        sd = CT.load_torch_state_dict(vae_path)
        merged, *rest = CT.merge_params(
            jax.tree.map(np.asarray, params["vae"]["params"]),
            CT.convert_vae(sd)["params"],
        )
        out["vae"] = {"params": jax.tree.map(jnp.asarray, merged)}
        if verbose:
            print(f"[vae] loaded {vae_path}")
    pq_path = bundle.ckpt_paths.get("parseq")
    if pq_path and os.path.exists(pq_path) and bundle.engine.ocr_predictor is not None:
        sd = CT.load_torch_state_dict(pq_path)
        out["parseq"] = {"params": jax.tree.map(jnp.asarray, CT.convert_parseq(sd)["params"])}
        if verbose:
            print(f"[parseq] loaded {pq_path}")
    le_path = bundle.ckpt_paths.get("label_encoder")
    if le_path and os.path.exists(le_path):
        sd = CT.load_torch_state_dict(le_path)
        merged, *rest = CT.merge_params(
            jax.tree.map(np.asarray, params["label_encoder"]["params"]),
            CT.convert_label_encoder(sd)["params"],
        )
        out["label_encoder"] = {"params": jax.tree.map(jnp.asarray, merged)}
        if verbose:
            print(f"[label_encoder] loaded {le_path}")
    return out
