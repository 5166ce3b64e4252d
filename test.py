"""Batch evaluation: generate inpainted scene text on a val split, score OCR
sequence accuracy with frozen PARSeq, optionally FID/LPIPS.

Parity: /root/reference/test.py:19-138 — same flow (init-noise search,
50-step Euler-EDM with CFG, bbox-cropped OCR check, real/fake/grid dumps).
"""

from __future__ import annotations

import os
import random
from os.path import join as ospj

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from metrics import calc_fid, calc_lpips
from udifftext_tpu.config import load_config
from udifftext_tpu.data import get_dataloader
from udifftext_tpu.loading import init_engine_params  # noqa: F401 (config surface)
from udifftext_tpu.models.parseq import PARSeq
from udifftext_tpu.ocr import ParseqPredictor
from udifftext_tpu.predict import JittedPredictor
from udifftext_tpu.utils.ckpt_torch import load_torch_state_dict, convert_parseq
from util import init_model, init_sampling, numpy_batch_to_device, prepare_batch


def load_predictor(cfgs):
    pred_cfg = cfgs.get("predictor_config", {}) or {}
    ckpt = (pred_cfg.get("params", {}) or {}).get("ckpt_path")
    predictor = ParseqPredictor(model=PARSeq())
    params = None
    if ckpt and os.path.exists(str(ckpt)):
        conv = convert_parseq(load_torch_state_dict(str(ckpt)))
        params = {"params": conv["params"]}
        print(f"[parseq] loaded {ckpt}")
    else:
        print(f"[parseq] checkpoint {ckpt} not found — OCR eval disabled")
    return predictor, params


def make_predictor(cfgs, bundle, sampler) -> JittedPredictor:
    """One compiled pipeline (conditioner → noise search → sampler scan →
    decode) reused across batches — reference test.py:19-40 as a single
    XLA program. With eval_data_parallel, the batch is sharded over a
    `data` mesh spanning all local devices (the reference is single-GPU
    here; this is the TPU-slice extension)."""
    mesh = None
    if bool(cfgs.get("eval_data_parallel", False)) and len(jax.devices()) > 1:
        from udifftext_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    return JittedPredictor(
        bundle.engine,
        num_steps=sampler.num_steps,
        cfg_scale=sampler.cfg_scale,
        noise_iters=int(cfgs.get("noise_iters", 10)),
        aae_enabled=bool(cfgs.get("aae_enabled", False)),
        detailed=bool(cfgs.get("detailed", False)),
        mesh=mesh,
        # opt-in APPROXIMATE fast sampling (arXiv 2312.09608); 0 = faithful.
        # The predictor's quality gate refuses encprop for a checkpoint with
        # no recorded quality report (scripts/encprop_quality.py writes one)
        encprop_interval=int(cfgs.get("encprop_interval", 0)),
        ckpt_id=_ckpt_id_if_encprop(cfgs),
        # exact candidate-batched init-noise search; default off for batch
        # eval — memory scales with noise_iters*batch (see engine.sample)
        noise_search_batched=bool(cfgs.get("noise_search_batched", False)),
    )


def _ckpt_id_if_encprop(cfgs):
    """Checkpoint content hash for the encprop quality gate — computed only
    when the approximate mode is requested (hashing a multi-GB ckpt is not
    free)."""
    if int(cfgs.get("encprop_interval", 0)) <= 1:
        return None
    from udifftext_tpu.utils.encprop_gate import ckpt_file_id

    return ckpt_file_id(cfgs.get("load_ckpt_path"))


def predict(cfgs, predictor, params, batch, rng):
    """reference test.py:19-40."""
    batch, _batch_uc = prepare_batch(cfgs, batch)
    samples, aux = predictor(params, batch, rng)
    return np.asarray(samples), aux


def test(bundle, params, sampler, dataloader, cfgs):
    import shutil

    # the reference wipes both dirs first (test.py:45-57) — stale PNGs from a
    # previous eval would otherwise contaminate FID/LPIPS over the union
    output_dir = str(cfgs.get("output_dir", "./outputs"))
    shutil.rmtree(output_dir, ignore_errors=True)
    os.makedirs(ospj(output_dir, "real"), exist_ok=True)
    os.makedirs(ospj(output_dir, "fake"), exist_ok=True)
    temp_dir = str(cfgs.get("temp_dir", "./temp"))
    shutil.rmtree(temp_dir, ignore_errors=True)
    for sub in ("attn_map", "seg_map", "inters"):
        os.makedirs(ospj(temp_dir, sub), exist_ok=True)

    ocr_enabled = bool(cfgs.get("ocr_enabled", False))
    ocr_predictor = pred_params = None
    if ocr_enabled:
        ocr_predictor, pred_params = load_predictor(cfgs)
        ocr_enabled = pred_params is not None
    correct_num = total_num = 0

    pipeline = make_predictor(cfgs, bundle, sampler)
    rng = jax.random.PRNGKey(random.randint(0, 2**31 - 1))
    for idx, batch in enumerate(dataloader):
        if idx >= int(cfgs.get("max_iter", 100)):
            break
        name = batch["name"][0]
        rng, sub = jax.random.split(rng)
        results, aux = predict(cfgs, pipeline, params, batch, sub)  # (B,H,W,3) [0,1]

        if "local_losses" in aux:
            # per-step min-local losses + decoded-intermediate GIF
            # (reference sampling.py:410-418)
            from udifftext_tpu.utils.viz import save_intermediates_gif

            losses = np.asarray(aux.pop("local_losses"))
            print(f"Local losses: {[round(float(l), 4) for l in losses.mean(axis=-1)]}")
            frames = list(np.asarray(aux.pop("inters")))
            save_intermediates_gif(frames, ospj(temp_dir, "inters", f"{name}.gif"))

        if cfgs.get("detailed") and aux:
            # middle-step attention heatmaps + seg maps (reference
            # openaimodel.py:559-591, sampling.py:254-262)
            from udifftext_tpu.utils.viz import (
                average_attn_maps, save_attn_map_grid, save_segment_map,
            )

            maps = average_attn_maps(
                {k: np.asarray(v) for k, v in aux.items()},
                layers=bundle.save_attn_layers or None,
            )
            tokens = batch["label"][0]
            save_attn_map_grid(maps, tokens, ospj(temp_dir, "attn_map", f"attn_map_{name}.png"))
            save_segment_map(maps, tokens, ospj(temp_dir, "seg_map", f"seg_{name}.npy"))

        if ocr_enabled:
            crops = [
                results[i, t:b, l:r]
                for i, (t, b, l, r) in enumerate(np.asarray(batch["r_bbox"]))
            ]
            pred_txt = ocr_predictor.img2txt_ragged(pred_params, crops)
            gt_txt = batch["label"]
            correct = sum(
                int(p.lower() == g.lower()) for p, g in zip(pred_txt, gt_txt)
            )
            color = "\033[1;32m" if correct == len(gt_txt) else "\033[1;31m"
            print(f"Expected text: {gt_txt}")
            print(f"{color} OCR Result: {pred_txt} \033[0m")
            correct_num += correct
            total_num += len(gt_txt)

        # save real/fake/grid PNGs (reference test.py:93-117)
        fake = np.concatenate(np.asarray(results) * 255, axis=-2).astype(np.uint8)
        outputs = []
        for key in ("image", "masked", "mask"):
            if key in batch:
                arr = np.asarray(batch[key], np.float32)
                if key != "mask":
                    arr = (arr + 1.0) / 2.0
                arr = np.concatenate(arr * 255, axis=-2)
                if key == "mask":
                    arr = np.tile(arr, (1, 1, 3))
                outputs.append(arr.astype(np.uint8))
        outputs.append(fake)
        Image.fromarray(outputs[0]).save(ospj(output_dir, "real", f"{name}.png"))
        Image.fromarray(fake).save(ospj(output_dir, "fake", f"{name}.png"))
        Image.fromarray(np.concatenate(outputs, axis=0)).save(
            ospj(output_dir, f"{name}.png")
        )

    if ocr_enabled and total_num:
        print(f"OCR test completed. Mean accuracy: {correct_num / total_num}")
    if cfgs.get("quan_test"):
        calc_fid(ospj(output_dir, "fake"), ospj(output_dir, "real"))
        calc_lpips(ospj(output_dir, "fake"), ospj(output_dir, "real"))


if __name__ == "__main__":
    cfgs = load_config("./configs/test.yaml")
    seed = random.randint(0, 2147483647)
    bundle, params = init_model(cfgs, seed=seed)
    sampler = init_sampling(cfgs)
    dataloader = get_dataloader(cfgs, "val")
    test(bundle, params, sampler, dataloader, cfgs)
