"""STR benchmark-table evaluation (src/parseq/test.py parity).

Evaluates word accuracy / 1-NED / confidence per dataset directory and prints
the markdown summary table. Each benchmark directory may be either an LMDB
database (the parseq distribution format, strhub/data/dataset.py:31-137 —
read by the pure-Python reader in udifftext_tpu/data/lmdb.py) or an image
folder with a `labels.txt` (`<filename> <label>` per line).

Usage: python scripts/str_test.py --data_root <root> [--model parseq --ckpt p]
"""

from __future__ import annotations

import argparse
import os
import sys
from os.path import join as ospj

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCHMARKS = ("IIIT5k", "SVT", "IC13_1015", "IC15_2077", "SVTP", "CUTE80")


def load_folder(d):
    """Items as (open_image_fn, label) pairs from an LMDB database dir (the
    parseq distribution format) or a labels.txt image folder."""
    if os.path.exists(ospj(d, "data.mdb")):
        from udifftext_tpu.data.lmdb import LmdbStrDataset

        ds = LmdbStrDataset(d)
        return [
            (lambda i=i: ds[i][0], ds.labels[i]) for i in range(len(ds))
        ]
    labels_path = ospj(d, "labels.txt")
    items = []
    if not os.path.exists(labels_path):
        return items
    with open(labels_path) as f:
        for line in f:
            parts = line.rstrip("\n").split(" ", 1)
            if len(parts) == 2:
                p = ospj(d, parts[0])
                items.append((lambda p=p: Image.open(p), parts[1]))
    return items


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--model", default="parseq")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from udifftext_tpu.models.parseq import ParseqTokenizer
    from udifftext_tpu.models.str_hub import create_model
    from udifftext_tpu.ocr import ParseqPredictor
    from udifftext_tpu.str_eval import evaluate_predictions, sequence_confidence

    model, params = create_model(args.model, args.ckpt)
    if params is None:
        x0 = jnp.zeros((1, 32, 128, 3))
        try:
            params = model.init(jax.random.PRNGKey(0), x0, 1)
        except TypeError:  # CTC models take no max_len argument
            params = model.init(jax.random.PRNGKey(0), x0)
        print("warning: random weights")
    predictor = ParseqPredictor(model=model, tokenizer=ParseqTokenizer())

    rows = []
    total = None
    for name in BENCHMARKS:
        items = load_folder(ospj(args.data_root, name))
        if not items:
            print(f"skipping {name} (no data)")
            continue
        preds, gts, confs = [], [], []
        for i in range(0, len(items), args.batch):
            chunk = items[i : i + args.batch]
            imgs = [np.asarray(open_fn().convert("RGB"), np.float32) / 255.0 for open_fn, _ in chunk]
            import cv2

            crops = np.stack([cv2.resize(im, (128, 32), interpolation=cv2.INTER_CUBIC) for im in imgs])
            logits = np.asarray(predictor.read_logits(params, jnp.asarray(crops)))
            ids = logits.argmax(-1)
            preds += predictor.tokenizer.decode_ids(ids)
            confs += sequence_confidence(logits)
            gts += [g for _, g in chunk]
        res = evaluate_predictions(preds, gts, confs)
        rows.append((name, res))
        if total is None:
            total = res
        else:
            total.num_samples += res.num_samples
            total.correct += res.correct
            total.ned += res.ned
            total.confidence += res.confidence
            total.label_length += res.label_length

    print("\n| Dataset | # samples | Accuracy | 1 - NED | Confidence |")
    print("|:-------:|----------:|---------:|--------:|-----------:|")
    for name, r in rows:
        print(f"| {name} | {r.num_samples} | {r.accuracy:.2f} | {r.mean_1_minus_ned:.2f} | {r.mean_confidence:.2f} |")
    if total:
        print(f"| **Combined** | {total.num_samples} | {total.accuracy:.2f} | "
              f"{total.mean_1_minus_ned:.2f} | {total.mean_confidence:.2f} |")


if __name__ == "__main__":
    main()
