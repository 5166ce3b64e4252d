"""Entry-point helpers: init_model / init_sampling / prepare_batch.

Parity: /root/reference/util.py:7-78 — same call surface, returning the
TPU-native EngineBundle + params instead of a torch module.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from udifftext_tpu.builders import EngineBundle, SamplerSettings, build_diffusion_engine
from udifftext_tpu.config import ConfigNode, load_config
from udifftext_tpu.loading import (
    init_engine_params,
    load_component_ckpts,
    load_from_torch_ckpt,
)


def init_model(cfgs, seed: int = 0, image_size: Optional[int] = None) -> Tuple[EngineBundle, Dict[str, Any]]:
    """Build the engine from the model config and load checkpoints
    (reference util.py:7-22)."""
    model_cfg = load_config(cfgs["model_cfg_path"])
    unet_dtype = jnp.bfloat16 if cfgs.get("bf16", True) else jnp.float32
    bundle = build_diffusion_engine(model_cfg["model"]["params"], unet_dtype=unet_dtype)

    params = init_engine_params(bundle, jax.random.PRNGKey(seed), image_size=image_size)
    params = load_component_ckpts(params, bundle)
    ckpt = cfgs.get("load_ckpt_path")
    if ckpt and os.path.exists(str(ckpt)):
        params = load_from_torch_ckpt(params, str(ckpt))
    elif ckpt:
        print(f"[init_model] checkpoint {ckpt} not found — using fresh init")
    return bundle, params


def init_sampling(cfgs) -> SamplerSettings:
    """Sampler settings (reference util.py:24-47): Euler-EDM over the
    LegacyDDPM schedule with VanillaCFG."""
    scale = cfgs.get("scale", [5.0, 0.0])
    scale = scale[0] if isinstance(scale, (list, tuple)) else scale
    return SamplerSettings(num_steps=cfgs.get("steps", 50), cfg_scale=scale)


def numpy_batch_to_device(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Move array fields to device; keep strings/lists host-side."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jnp.asarray(v)
        else:
            out[k] = v
    return out


def prepare_batch(cfgs, batch: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(batch, batch_uc) pair (reference util.py:62-78). The unconditional
    branch empties txt/label; the engine additionally zero-forces the label
    embedding per force_uc_zero_embeddings."""
    batch = numpy_batch_to_device(batch)
    batch_uc = dict(batch)
    if "ntxt" in batch:
        batch_uc["txt"] = batch["ntxt"]
    elif "txt" in batch:
        batch_uc["txt"] = ["" for _ in batch["txt"]]
    if "label" in batch:
        batch_uc["label"] = ["" for _ in batch["label"]]
        batch_uc["label_ids"] = jnp.zeros_like(batch["label_ids"])
    return batch, batch_uc
