"""STR benchmark-table evaluation (src/parseq/test.py parity).

Evaluates word accuracy / 1-NED / confidence / label length per dataset and
prints the grouped markdown summary tables (Benchmark (Subset) / Benchmark /
New, test.py:92-130) with a weighted Combined row per group. Flags mirror the
reference: --cased / --punctuation extend the test charset (:80-84), --new
adds the ArT/COCOv1.4/Uber sets (:93-94), --rotation rotates inputs
counter-clockwise before resize (strhub/data/module.py:60-61). With --ckpt
the tables are also written to `<ckpt>.log.txt` (:126).

Each benchmark directory may be either an LMDB database (the parseq
distribution format, strhub/data/dataset.py:31-137 — read by the pure-Python
reader in udifftext_tpu/data/lmdb.py) or an image folder with a `labels.txt`
(`<filename> <label>` per line).

Usage: python scripts/str_test.py --data_root <root> [--model parseq --ckpt p]
"""

from __future__ import annotations

import argparse
import os
import string
import sys
from os.path import join as ospj

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# strhub/data/module.py:27-30
TEST_BENCHMARK_SUB = ("IIIT5k", "SVT", "IC13_857", "IC15_1811", "SVTP", "CUTE80")
TEST_BENCHMARK = ("IIIT5k", "SVT", "IC13_1015", "IC15_2077", "SVTP", "CUTE80")
TEST_NEW = ("ArT", "COCOv1.4", "Uber")
BENCHMARKS = TEST_BENCHMARK  # back-compat alias (str_abinet_lm_acc.py)


def _prep_label(label, adapter, max_label_len=25):
    """strhub/data/dataset.py:84-106 label preprocessing: whitespace removal,
    NFKD→ascii, length filter BEFORE charset adaptation, drop-if-empty.
    Returns None for samples the reference datamodule would exclude."""
    import unicodedata

    label = "".join(label.split())
    label = unicodedata.normalize("NFKD", label).encode("ascii", "ignore").decode()
    if len(label) > max_label_len:
        return None
    if adapter is not None:
        label = adapter(label)
    return label or None


def load_folder(d, charset=None, max_label_len=25):
    """Items as (open_image_fn, label) pairs from an LMDB database dir (the
    parseq distribution format) or a labels.txt image folder, with the
    reference datamodule's label filtering so evaluated populations (and the
    tables' #samples) match parseq's."""
    if os.path.exists(ospj(d, "data.mdb")):
        from udifftext_tpu.data.lmdb import LmdbStrDataset

        ds = LmdbStrDataset(d, max_label_len=max_label_len, charset=charset)
        return [
            (lambda i=i: ds[i][0], ds.labels[i]) for i in range(len(ds))
        ]
    labels_path = ospj(d, "labels.txt")
    items = []
    if not os.path.exists(labels_path):
        return items
    from udifftext_tpu.str_eval import CharsetAdapter

    adapter = CharsetAdapter(charset) if charset is not None else None
    with open(labels_path) as f:
        for line in f:
            parts = line.rstrip("\n").split(" ", 1)
            if len(parts) == 2:
                label = _prep_label(parts[1], adapter, max_label_len)
                if label is None:
                    continue
                p = ospj(d, parts[0])
                items.append((lambda p=p: Image.open(p), label))
    return items


def print_results_table(rows, file=None):
    """test.py:40-61 table: per-set rows + sample-weighted Combined row."""
    names = [name for name, _ in rows]
    w = max(map(len, names + ["Dataset", "Combined"]))
    print("| {:<{w}} | # samples | Accuracy | 1 - NED | Confidence | Label Length |".format("Dataset", w=w), file=file)
    print("|:{:-<{w}}:|----------:|---------:|--------:|-----------:|-------------:|".format("----", w=w), file=file)
    tot_n = tot_acc = tot_ned = tot_conf = tot_len = 0
    for name, r in rows:
        n = r.num_samples
        mean_len = r.label_length / max(n, 1)
        print(f"| {name:<{w}} | {n:>9} | {r.accuracy:>8.2f} | {r.mean_1_minus_ned:>7.2f} "
              f"| {r.mean_confidence:>10.2f} | {mean_len:>12.2f} |", file=file)
        tot_n += n
        tot_acc += n * r.accuracy
        tot_ned += n * r.mean_1_minus_ned
        tot_conf += n * r.mean_confidence
        tot_len += n * mean_len
    d = max(tot_n, 1)
    print("|-{:-<{w}}-|-----------|----------|---------|------------|--------------|".format("----", w=w), file=file)
    print(f"| {'Combined':<{w}} | {tot_n:>9} | {tot_acc / d:>8.2f} | {tot_ned / d:>7.2f} "
          f"| {tot_conf / d:>10.2f} | {tot_len / d:>12.2f} |", file=file)


def evaluate_set(predictor, params, items, batch, rotation, charset_test):
    import cv2
    import jax.numpy as jnp

    from udifftext_tpu.str_eval import evaluate_predictions, sequence_confidence

    preds, gts, confs = [], [], []
    for i in range(0, len(items), batch):
        chunk = items[i : i + batch]
        imgs = []
        for open_fn, _ in chunk:
            im = open_fn().convert("RGB")
            if rotation:
                im = im.rotate(rotation, expand=True)
            imgs.append(np.asarray(im, np.float32) / 255.0)
        crops = np.stack([cv2.resize(im, (128, 32), interpolation=cv2.INTER_CUBIC) for im in imgs])
        logits = np.asarray(predictor.read_logits(params, jnp.asarray(crops)))
        ids = logits.argmax(-1)
        preds += predictor.tokenizer.decode_ids(ids)
        confs += sequence_confidence(logits)
        gts += [g for _, g in chunk]
    return evaluate_predictions(preds, gts, confs, charset_test=charset_test)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--model", default="parseq")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cased", action="store_true", help="Cased comparison")
    ap.add_argument("--punctuation", action="store_true", help="Check punctuation")
    ap.add_argument("--new", action="store_true", help="Evaluate on new benchmark datasets")
    ap.add_argument("--rotation", type=int, default=0,
                    help="Angle of rotation (counter clockwise) in degrees")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from udifftext_tpu.models.parseq import ParseqTokenizer
    from udifftext_tpu.models.str_hub import create_model
    from udifftext_tpu.ocr import ParseqPredictor

    charset_test = string.digits + string.ascii_lowercase
    if args.cased:
        charset_test += string.ascii_uppercase
    if args.punctuation:
        charset_test += string.punctuation

    model, params = create_model(args.model, args.ckpt)
    if params is None:
        x0 = jnp.zeros((1, 32, 128, 3))
        try:
            params = model.init(jax.random.PRNGKey(0), x0, 1)
        except TypeError:  # CTC models take no max_len argument
            params = model.init(jax.random.PRNGKey(0), x0)
        print("warning: random weights")
    predictor = ParseqPredictor(model=model, tokenizer=ParseqTokenizer())

    test_set = TEST_BENCHMARK_SUB + TEST_BENCHMARK
    if args.new:
        test_set += TEST_NEW
    test_set = sorted(set(test_set))

    results = {}
    for name in test_set:
        items = load_folder(ospj(args.data_root, name), charset=charset_test)
        if not items:
            print(f"skipping {name} (no data)")
            continue
        results[name] = evaluate_set(predictor, params, items, args.batch,
                                     args.rotation, charset_test)

    result_groups = {
        "Benchmark (Subset)": TEST_BENCHMARK_SUB,
        "Benchmark": TEST_BENCHMARK,
    }
    if args.new:
        result_groups["New"] = TEST_NEW
    outs = [sys.stdout]
    log = open(args.ckpt + ".log.txt", "w") if args.ckpt else None
    if log:
        outs.append(log)
    for out in outs:
        for group, subset in result_groups.items():
            rows = [(s, results[s]) for s in subset if s in results]
            if not rows:
                continue
            print(f"{group} set:", file=out)
            print_results_table(rows, file=out)
            print("\n", file=out)
    if log:
        log.close()


if __name__ == "__main__":
    main()
