"""STR model hub: create_model by name (hubconf.py / strhub/models/utils.py
parity — factories for parseq, vitstr, abinet, trba, crnn with the published
base configurations and checkpoint-conversion hooks)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from ..utils.ckpt_torch import load_torch_state_dict

_BASE_CONFIGS = {
    "parseq": dict(max_label_length=25, img_size=(32, 128), patch_size=(4, 8),
                   embed_dim=384, enc_depth=12, enc_num_heads=6,
                   dec_depth=1, dec_num_heads=12),
    "parseq-tiny": dict(max_label_length=25, img_size=(32, 128), patch_size=(8, 4)[::-1],
                        embed_dim=192, enc_depth=12, enc_num_heads=3,
                        dec_depth=1, dec_num_heads=6),
    "vitstr": dict(max_label_length=25, img_size=(32, 128), patch_size=(4, 8),
                   embed_dim=384, depth=12, num_heads=6, num_classes=95),
    "abinet": dict(max_length=26, num_classes=37, iter_size=3, d_model=512, v_num_layers=3),
    "trba": dict(num_class=96, max_label_length=25, img_size=(32, 128)),
    "crnn": dict(num_classes=95),
}


def create_model(name: str, ckpt_path: Optional[str] = None, **overrides):
    """Build a model (+ params when a checkpoint is given) by hub name."""
    cfg = dict(_BASE_CONFIGS[name.replace("_", "-")])
    cfg.update(overrides)

    if name.startswith("parseq"):
        from .parseq import PARSeq

        model = PARSeq(**cfg)
    elif name == "vitstr":
        from .str_models import ViTSTRSystem

        model = ViTSTRSystem(**cfg)
    elif name == "abinet":
        from .abinet import ABINet

        model = ABINet(**cfg)
    elif name == "trba":
        from .trba import TRBA

        model = TRBA(**cfg)
    elif name == "crnn":
        from .str_models import CRNN

        model = CRNN(**cfg)
    else:
        raise KeyError(name)

    params = None
    if ckpt_path:
        if name.startswith("parseq"):
            from ..utils.ckpt_torch import convert_parseq

            params = {"params": convert_parseq(load_torch_state_dict(ckpt_path))["params"]}
        elif name == "trba":
            from ..utils.ckpt_torch import convert_trba

            conv = convert_trba(load_torch_state_dict(ckpt_path))
            params = {"params": conv["params"], "batch_stats": conv["batch_stats"]}
        elif name == "vitstr":
            import numpy as np

            from ..utils.ckpt_torch import convert_vit

            sd = load_torch_state_dict(ckpt_path)
            conv = convert_vit(sd, prefix="model.")
            p = {"vit": conv["params"]}
            # the strhub ViTSTR ckpt carries the classifier as model.head.*;
            # convert_vit (pure encoder) routes it to `unknown` — without it
            # ViTSTRSystem.apply dies on the missing Dense("head") params
            hw = sd.get("model.head.weight")
            hb = sd.get("model.head.bias")
            if hw is not None:
                p["head"] = {"Dense_0": {
                    "kernel": np.ascontiguousarray(np.asarray(hw).T),
                    "bias": np.asarray(hb),
                }}
            params = {"params": p}
        elif name == "abinet":
            from ..utils.ckpt_torch import convert_abinet

            conv = convert_abinet(load_torch_state_dict(ckpt_path))
            params = {"params": conv["params"], "batch_stats": conv["batch_stats"]}
        elif name == "crnn":
            from ..utils.ckpt_torch import convert_crnn

            conv = convert_crnn(load_torch_state_dict(ckpt_path))
            params = {"params": conv["params"], "batch_stats": conv["batch_stats"]}
        else:
            raise KeyError(name)
    return model, params
