"""Merge + filter parseq-layout LMDB datasets into one LMDB.

Parity: src/parseq/tools/filter_lmdb.py — same semantics (concatenate the
input databases in order, drop samples whose decoded image has a width or
height below --min_image_dim, renumber surviving samples 1-based, write
b'num-samples' at the end) through the pure-Python LMDB reader/writer
instead of the `lmdb` C library.

Usage:
  python scripts/str_filter_lmdb.py <in_lmdb> [<in_lmdb> ...] --output <out_lmdb> \
      [--min_image_dim 8]
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def filter_lmdb(inputs, output: str, min_image_dim: int = 8) -> int:
    from PIL import Image

    from udifftext_tpu.data.lmdb import open_lmdb, write_lmdb

    items = {}
    in_samples = 0
    out_samples = 0
    for lmdb_in in inputs:
        with open_lmdb(lmdb_in) as db:
            raw = db.get(b"num-samples")
            if raw is None:
                raise SystemExit(f"{lmdb_in}: no b'num-samples' key (not a parseq-layout LMDB)")
            num_samples = int(raw)
            in_samples += num_samples
            for index in range(1, num_samples + 1):
                image_bin = db.get(b"image-%09d" % index)
                if image_bin is None:
                    print(f"Skipping: {index} in {lmdb_in} (missing image record)")
                    continue
                w, h = Image.open(io.BytesIO(image_bin)).size
                if w < min_image_dim or h < min_image_dim:
                    print(f"Skipping: {index}, w = {w}, h = {h}")
                    continue
                out_samples += 1  # 1-based renumbering, matching the reference tool
                items[b"image-%09d" % out_samples] = image_bin
                items[b"label-%09d" % out_samples] = db.get(b"label-%09d" % index) or b""
    items[b"num-samples"] = str(out_samples).encode()
    write_lmdb(output, items)
    print(f"Written {out_samples} samples to {output} out of {in_samples} input samples.")
    return out_samples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help="paths to input LMDBs")
    ap.add_argument("--output", required=True, help="path to output LMDB")
    ap.add_argument("--min_image_dim", type=int, default=8)
    args = ap.parse_args()
    filter_lmdb(args.inputs, args.output, args.min_image_dim)


if __name__ == "__main__":
    main()
