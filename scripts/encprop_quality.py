"""Quality check for the APPROXIMATE encoder-propagation sampling mode.

Runs the SAME fixed-seed sample through the exact Euler-EDM pipeline and
through encoder propagation at each --intervals value, and reports PSNR /
max-abs between the decoded images (plus OCR text agreement when a PARSeq
checkpoint is supplied). This is the gate to run before trusting
`encprop_interval` in production: the mode is an approximation
("Faster Diffusion", arXiv 2312.09608) and its quality cost is
checkpoint-dependent.

Without --ckpt it runs random-init (mechanism smoke only — a random UNet's
outputs say nothing about real quality; the script labels the result
accordingly). With the published UDiffText checkpoint it reports the real
degradation.

Usage:
  python scripts/encprop_quality.py [--ckpt ./checkpoints/udifftext.ckpt]
      [--image demo/in.png --mask demo/mask.png --text WORD]
      [--steps 50] [--intervals 2,3] [--size 512]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_batch(args):
    from PIL import Image

    from udifftext_tpu.charset import encode_label

    s = args.size
    if args.image and args.mask:
        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((s, s)), np.float32
        ) / 127.5 - 1.0
        mask = (
            np.asarray(Image.open(args.mask).convert("L").resize((s, s)), np.float32)
            [..., None] > 127
        ).astype(np.float32)
    else:
        rng = np.random.RandomState(0)
        img = rng.uniform(-1, 1, (s, s, 3)).astype(np.float32)
        mask = np.zeros((s, s, 1), np.float32)
        mask[s // 4 : 3 * s // 4, s // 4 : 3 * s // 4] = 1.0
    masked = img * (1.0 - mask)
    label_ids = encode_label(args.text, 12)
    seg_mask = np.zeros((12,), np.float32)
    seg_mask[: len(args.text)] = 1.0
    return {
        "image": img[None],
        "masked": masked[None],
        "mask": mask[None],
        "seg": np.zeros((1, s, s, 12), np.float32),
        "seg_mask": seg_mask[None],
        "label_ids": np.asarray(label_ids)[None],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--model_cfg", default="./configs/test/textdesign_sd_2.yaml")
    ap.add_argument("--image", default=None)
    ap.add_argument("--mask", default=None)
    ap.add_argument("--text", default="hello")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--intervals", default="2,3")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--scale", type=float, default=5.0)
    ap.add_argument(
        "--report-id", default=None,
        help="override the quality-report key (testing the gate only; "
        "normally the key is the checkpoint's content hash)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from udifftext_tpu.builders import build_diffusion_engine
    from udifftext_tpu.config import load_config
    from udifftext_tpu.loading import init_engine_params

    cfg = load_config(args.model_cfg)
    bundle = build_diffusion_engine(cfg["model"]["params"])
    eng = bundle.engine
    params = init_engine_params(bundle, jax.random.PRNGKey(0))
    mode = "RANDOM-INIT (mechanism smoke only — not a quality statement)"
    # fresh init zeroes the output conv (SD convention) → UNet output would
    # be identically 0 and exact vs encprop would trivially agree; perturb it
    # so the random-init smoke actually exercises the divergence
    oc = params["unet"]["params"]["out_conv"]["Conv_0"]
    oc["kernel"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(7), oc["kernel"].shape, oc["kernel"].dtype
    )
    if args.ckpt and os.path.exists(args.ckpt):
        from udifftext_tpu.loading import load_component_ckpts, load_from_torch_ckpt

        params = load_component_ckpts(params, bundle)
        params = load_from_torch_ckpt(params, args.ckpt)
        mode = f"checkpoint {args.ckpt}"
    elif args.ckpt:
        print(f"SKIPPED: checkpoint not found at {args.ckpt}")
        return

    batch = {k: jnp.asarray(v) for k, v in build_batch(args).items()}
    rng = jax.random.PRNGKey(0)

    def run(interval):
        img, _ = eng.sample(
            params, batch, rng, num_steps=args.steps, cfg_scale=args.scale,
            noise_iters=0, encprop_interval=interval,
        )
        return np.asarray(img)

    print(f"encprop quality vs exact — {mode}; steps={args.steps}")
    exact = run(0)
    intervals = {}
    for k in [int(v) for v in args.intervals.split(",") if v]:
        approx = run(k)
        mse = float(np.mean((exact - approx) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        max_abs = float(np.max(np.abs(exact - approx)))
        print(
            f"interval {k}: PSNR {psnr:6.2f} dB  max|Δ| {max_abs:.4f}"
            f"  mean|Δ| {float(np.mean(np.abs(exact - approx))):.5f}"
        )
        intervals[str(k)] = {"psnr": round(psnr, 3), "max_abs": round(max_abs, 5)}

    # persist the report the predictor's quality gate consumes
    # (udifftext_tpu/utils/encprop_gate.py). Keyed by the checkpoint's
    # content hash; random-init results are NOT written (they say nothing
    # about real quality) unless --report-id forces a key for gate testing.
    from udifftext_tpu.utils.encprop_gate import ckpt_file_id, write_report

    report_id = args.report_id
    if report_id is None and args.ckpt and os.path.exists(args.ckpt):
        report_id = ckpt_file_id(args.ckpt)
    if report_id:
        path = write_report(report_id, {
            "mode": mode, "steps": args.steps, "scale": args.scale,
            "size": args.size, "text": args.text, "intervals": intervals,
        })
        print(f"report written: {path}")
    else:
        print("report NOT written (random-init run — pass --ckpt for a real "
              "report, or --report-id to force a key for gate tests)")


if __name__ == "__main__":
    main()
