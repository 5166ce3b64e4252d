"""Measure ABINet language-model word accuracy from ground-truth input.

Parity: src/parseq/tools/test_abinet_lm_acc.py — feeds each benchmark set's
ground-truth labels (as one-hot token distributions) straight into ABINet's
BCN cloze language model and measures how often the LM reproduces the word,
i.e. the LM's standalone spelling accuracy with a perfect vision front-end.

Encoding semantics (:23-36 upstream): charset is ascii_lowercase+'1234567890'
with the strhub Tokenizer layout (EOS id 0 first, charset, BOS, PAD); targets
are the bare char ids zero(EOS)-padded to max_label_length+1=26 columns,
one-hot over the first 37 classes (EOS+charset — BOS/PAD sliced off);
lengths are len(label)+1.

Usage:
  python scripts/str_abinet_lm_acc.py --data_root <root> [--ckpt abinet.pt]
"""

from __future__ import annotations

import argparse
import os
import string
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# original ABINet charset (test_abinet_lm_acc.py:53)
LM_CHARSET = string.ascii_lowercase + "1234567890"
MAX_LEN = 26  # max_label_length + 1
NUM_CLASSES = len(LM_CHARSET) + 1  # + EOS


def encode_labels(labels) -> tuple[np.ndarray, np.ndarray]:
    """(B, 26, 37) one-hot targets + (B,) lengths, ABINetLM._encode parity."""
    stoi = {c: i + 1 for i, c in enumerate(LM_CHARSET)}
    ids = np.zeros((len(labels), MAX_LEN), np.int32)  # pad id 0 == EOS
    lengths = np.zeros((len(labels),), np.int32)
    for i, label in enumerate(labels):
        row = [stoi[c] for c in label]
        ids[i, : len(row)] = row
        lengths[i] = len(label) + 1
    onehot = np.zeros((len(labels), MAX_LEN, NUM_CLASSES), np.float32)
    np.put_along_axis(onehot, ids[..., None], 1.0, axis=-1)
    return onehot, lengths


def language_model_params(ckpt: str | None):
    """BCNLanguage module + params — sliced from a converted full-ABINet
    checkpoint, or random-init when no weights are available."""
    import jax
    from udifftext_tpu.models.abinet import BCNLanguage
    from udifftext_tpu.models.str_hub import _BASE_CONFIGS

    cfg = _BASE_CONFIGS["abinet"]
    lm = BCNLanguage(max_length=cfg["max_length"], num_classes=cfg["num_classes"],
                     d_model=cfg["d_model"])
    if ckpt:
        from udifftext_tpu.models.str_hub import create_model

        _, params = create_model("abinet", ckpt)
        lm_params = {"params": params["params"]["language"]}
    else:
        print("warning: random weights")
        tokens, lengths = encode_labels(["abc"])
        lm_params = lm.init(jax.random.PRNGKey(0), tokens, lengths)
    return lm, lm_params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--ckpt", default=None, help="abinet checkpoint (.pt)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--new", action="store_true",
                    help="Evaluate on new benchmark datasets")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from str_test import TEST_BENCHMARK, TEST_NEW, load_folder, print_results_table
    from udifftext_tpu.models.parseq import ParseqTokenizer
    from udifftext_tpu.str_eval import evaluate_predictions, sequence_confidence

    lm, lm_params = language_model_params(args.ckpt)
    fwd = jax.jit(lambda t, l: lm.apply(lm_params, t, l)["logits"])
    tokenizer = ParseqTokenizer(charset=LM_CHARSET)

    test_set = TEST_BENCHMARK + (TEST_NEW if args.new else ())
    results = {}
    for name in sorted(set(test_set)):
        # charset filter here mirrors the upstream datamodule: labels adapt
        # to the LM charset at load, over-length/empty samples are excluded
        items = load_folder(os.path.join(args.data_root, name), charset=LM_CHARSET)
        if not items:
            print(f"skipping {name} (no data)")
            continue
        # LM-only eval never opens the images
        gts = [g for _, g in items]
        preds, confs = [], []
        for i in range(0, len(gts), args.batch):
            chunk = gts[i : i + args.batch]
            tokens, lengths = encode_labels(chunk)
            # pad to full batch width so every step reuses one compilation
            pad = args.batch - len(chunk)
            if pad:
                tokens = np.pad(tokens, ((0, pad), (0, 0), (0, 0)))
                lengths = np.pad(lengths, (0, pad), constant_values=1)
            logits = np.asarray(fwd(jnp.asarray(tokens), jnp.asarray(lengths)))
            logits = logits[: len(chunk)]
            preds += tokenizer.decode_ids(logits.argmax(-1))
            confs += sequence_confidence(logits)
        results[name] = evaluate_predictions(preds, gts, confs, charset_test=LM_CHARSET)

    groups = {"Benchmark": TEST_BENCHMARK}
    if args.new:
        groups["New"] = TEST_NEW
    for group, subset in groups.items():
        rows = [(s, results[s]) for s in subset if s in results]
        if rows:
            print(f"{group} set:")
            print_results_table(rows)


if __name__ == "__main__":
    main()
