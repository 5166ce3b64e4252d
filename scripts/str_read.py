"""Single-image STR inference (src/parseq/read.py parity).

Usage: python scripts/str_read.py <image.png> [--model parseq] [--ckpt path]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="+")
    ap.add_argument("--model", default="parseq")
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    from udifftext_tpu.models.parseq import ParseqTokenizer
    from udifftext_tpu.models.str_hub import create_model
    from udifftext_tpu.ocr import ParseqPredictor

    model, params = create_model(args.model, args.ckpt)
    if params is None:
        print("warning: no checkpoint — random weights, output is meaningless")
        import jax.numpy as jnp

        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)), 1)

    predictor = ParseqPredictor(model=model, tokenizer=ParseqTokenizer())
    crops = [np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0 for p in args.images]
    for path, text in zip(args.images, predictor.img2txt_ragged(params, crops)):
        print(f"{path}: {text!r}")


if __name__ == "__main__":
    main()
