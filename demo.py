"""Interactive scene-text editing demo.

Parity: /root/reference/demo.py:39-198 — build a 512² batch from an image +
sketched mask + target text, run the sampler (optionally with AAE + detailed
attention-map visualization), show the result. Serves the same Gradio UI when
`gradio` is installed; otherwise runs as a CLI one-shot
(`python demo.py --image in.png --mask mask.png --text HELLO --out out.png`).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from udifftext_tpu.charset import encode_labels
from udifftext_tpu.config import load_config
from util import init_model, init_sampling


def build_batch(image: np.ndarray, mask: np.ndarray, text: str, H=512, W=512, seq_len=12):
    """reference demo.py:55-98: resize to 512², mask from sketch, masked =
    image*(1-mask), seg_mask by len(text)."""
    import cv2

    image = cv2.resize(image, (W, H)).astype(np.float32) / 127.5 - 1.0
    mask = cv2.resize(mask.astype(np.uint8), (W, H))[..., None].astype(np.float32)
    mask = (mask > 0.5).astype(np.float32)
    masked = image * (1 - mask)
    seg_mask = np.concatenate(
        [np.ones(len(text), np.float32), np.zeros(seq_len - len(text), np.float32)]
    )
    return {
        "image": image[None],
        "mask": mask[None],
        "masked": masked[None],
        "seg_mask": seg_mask[None],
        "label_ids": encode_labels([text], seq_len),
        "label": [text],
        "txt": [f'"{text}"'],
        "name": ["demo"],
    }


_PREDICTORS = {}


def demo_predict(cfgs, bundle, params, batch, steps, scale, seed, aae=False, detailed=False):
    """reference demo.py:39-116 — one compiled pipeline per sampler setting,
    cached so repeated demo calls reuse the executable."""
    from udifftext_tpu.predict import JittedPredictor

    encprop = int(cfgs.get("encprop_interval", 0))
    # exact candidate-batched init-noise search (engine.get_init_noise) —
    # the right default for the demo's interactive single-image batches
    ns_batched = bool(cfgs.get("noise_search_batched", True))
    key = (id(bundle.engine), int(steps), float(scale), bool(aae), bool(detailed),
           encprop, ns_batched)
    predictor = _PREDICTORS.get(key)
    if predictor is None:
        ckpt_id = None
        if encprop > 1:
            from udifftext_tpu.utils.encprop_gate import ckpt_file_id

            ckpt_id = ckpt_file_id(cfgs.get("load_ckpt_path"))
        predictor = _PREDICTORS[key] = JittedPredictor(
            bundle.engine,
            num_steps=steps,
            cfg_scale=scale,
            noise_iters=int(cfgs.get("noise_iters", 10)),
            aae_enabled=aae,
            detailed=detailed,
            encprop_interval=encprop,
            ckpt_id=ckpt_id,
            noise_search_batched=ns_batched,
        )
    samples, aux = predictor(params, batch, jax.random.PRNGKey(seed))
    out = (np.asarray(samples)[0] * 255).astype(np.uint8)
    return out, aux


def run_cli(cfgs):
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--mask", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--out", default="demo_out.png")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--scale", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--aae", action="store_true")
    p.add_argument("--detailed", action="store_true")
    args = p.parse_args()

    bundle, params = init_model(cfgs)
    sampler = init_sampling(cfgs)
    image = np.asarray(Image.open(args.image).convert("RGB"))
    mask = np.asarray(Image.open(args.mask).convert("L"))
    batch = build_batch(image, mask, args.text, cfgs.get("H", 512), cfgs.get("W", 512),
                        cfgs.get("seq_len", 12))
    # `or` would silently ignore explicit zeros (--scale 0 disables CFG)
    steps = args.steps if args.steps is not None else sampler.num_steps
    scale = args.scale if args.scale is not None else sampler.cfg_scale
    out, aux = demo_predict(cfgs, bundle, params, batch, steps, scale, args.seed,
                            args.aae, args.detailed)
    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")
    if "local_losses" in aux:
        from udifftext_tpu.utils.viz import save_intermediates_gif

        losses = np.asarray(aux.pop("local_losses"))
        print(f"Local losses: {[round(float(l), 4) for l in losses.mean(axis=-1)]}")
        save_intermediates_gif(list(np.asarray(aux.pop("inters"))), "./temp/inters/demo.gif")
    if args.detailed and aux:
        os.makedirs("./temp/attn_map", exist_ok=True)
        for k, v in aux.items():
            np.save(f"./temp/attn_map/{k.replace('.', '_')}.npy", np.asarray(v))
        print("saved attention maps under ./temp/attn_map/")


def run_gradio(cfgs):
    import gradio as gr

    bundle, params = init_model(cfgs)
    sampler = init_sampling(cfgs)

    def fn(editor, text, steps, scale, seed, detailed):
        image = np.asarray(editor["background"].convert("RGB"))
        layers = editor.get("layers") or []
        if layers:
            # paint COVERAGE, not luminance: a dark brush paints (0,0,0,255)
            # and RGBA→L would read it as 0 (= unpainted); the sketch mask is
            # wherever alpha is set
            layer = np.asarray(layers[0].convert("RGBA"))
            mask = layer[..., 3]
        else:
            mask = np.zeros(image.shape[:2])
        batch = build_batch(image, mask, text, cfgs.get("H", 512), cfgs.get("W", 512),
                            cfgs.get("seq_len", 12))
        out, _ = demo_predict(cfgs, bundle, params, batch, int(steps), float(scale),
                              int(seed), detailed=detailed)
        return Image.fromarray(out)

    ui = gr.Interface(
        fn,
        [
            gr.ImageEditor(type="pil", label="image + sketch mask"),
            gr.Textbox(label="text"),
            gr.Slider(10, 100, value=sampler.num_steps, step=1, label="steps"),
            gr.Slider(0, 10, value=sampler.cfg_scale, label="cfg scale"),
            gr.Number(value=0, label="seed"),
            gr.Checkbox(label="detailed"),
        ],
        gr.Image(label="result"),
        title="UDiffText-TPU demo",
    )
    ui.launch()


if __name__ == "__main__":
    cfgs = load_config("./configs/demo.yaml")
    try:
        import gradio  # noqa: F401

        run_gradio(cfgs)
    except ImportError:
        run_cli(cfgs)
