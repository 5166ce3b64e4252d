"""Tests for the parseq tools/ parity scripts: str_convert_datasets.py and
str_abinet_lm_acc.py (reference: src/parseq/tools/*_converter.py,
test_abinet_lm_acc.py). Each converter runs over a tiny synthetic fixture of
the dataset's native annotation format."""

import importlib.util
import json
import os
from os.path import join as ospj

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_script(name):
    spec = importlib.util.spec_from_file_location(name, ospj(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def conv():
    return load_script("str_convert_datasets")


def save_jpeg(path, h=24, w=48, seed=0):
    arr = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path, quality=90)


def read_gt(path):
    with open(path, encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def test_convert_art(conv, tmp_path):
    """art_converter.py parity: latin/legible/'#' filters, LocaL#3 kept."""
    root = str(tmp_path)
    labels = {
        "gt_1": [{"language": "Latin", "illegibility": False, "transcription": " shop "}],
        "gt_2": [{"language": "Chinese", "illegibility": False, "transcription": "x"}],
        "gt_3": [{"language": "Latin", "illegibility": True, "transcription": "x"}],
        "gt_4": [{"language": "Latin", "illegibility": False, "transcription": "  "}],
        "gt_5": [{"language": "Latin", "illegibility": False, "transcription": "bad#label"}],
        "gt_6": [{"language": "Latin", "illegibility": False, "transcription": "LocaL#3"}],
    }
    with open(ospj(root, "train_task2_labels.json"), "w") as f:
        json.dump(labels, f)
    conv.convert_art(root)
    assert read_gt(ospj(root, "gt.txt")) == [
        "train_task2_images/gt_1.jpg\tshop",
        "train_task2_images/gt_6.jpg\tLocaL#3",
    ]


def test_convert_case_sensitive(conv, tmp_path):
    root = str(tmp_path)
    os.makedirs(ospj(root, "label"))
    for i, label in enumerate(["Cat", "DoG"], start=1):
        save_jpeg(ospj(root, "IMG", f"{i}.png"), seed=i)  # png layout branch
        with open(ospj(root, "label", f"{i}.txt"), "w") as f:
            f.write(label + "\n")
    conv.convert_case_sensitive(root)
    assert read_gt(ospj(root, "lmdb.txt")) == ["IMG/1.png\tCat", "IMG/2.png\tDoG"]


def test_convert_coco_text(conv, tmp_path):
    root = str(tmp_path)
    with open(ospj(root, "train_words_gt.txt"), "w") as f:
        f.write("1001,hello\nmalformed-line\n1002,|piped|\n")
    with open(ospj(root, "val_words_gt.txt"), "w") as f:
        f.write("2001,world\n")
    conv.convert_coco_text(root)
    assert read_gt(ospj(root, "train_lmdb.txt")) == [
        "train_words/1001.jpg\thello",
        "train_words/1002.jpg\tpiped",
    ]
    assert read_gt(ospj(root, "val_lmdb.txt")) == ["val_words/2001.jpg\tworld"]


def test_convert_mlt19(conv, tmp_path):
    root = str(tmp_path)
    with open(ospj(root, "gt.txt"), "w") as f:
        f.write("a.jpg,Latin,word\n"
                "b.jpg,Arabic,word\n"
                "c.jpg,Symbols,!!,with,commas\n"
                "d.jpg,Latin,\n")
    conv.convert_mlt19(root)
    # label split uses maxsplit=2 so commas inside the label survive
    assert read_gt(ospj(root, "lmdb.txt")) == [
        "a.jpg\tword", "c.jpg\t!!,with,commas"]


def test_convert_lsvt(conv, tmp_path):
    """lsvt_converter.py parity: polygon hull crops, shard-0/shard-1 image
    lookup fallback, CJK/illegible/blacklist filters."""
    root = str(tmp_path)
    save_jpeg(ospj(root, "train_full_images_0", "img0.jpg"), h=40, w=80, seed=1)
    save_jpeg(ospj(root, "train_full_images_1", "img1.jpg"), h=40, w=80, seed=2)
    ann = {
        "img0": [
            {"transcription": "good", "illegibility": False,
             "points": [[10, 5], [30, 5], [30, 20], [10, 20]]},
            {"transcription": "中文", "illegibility": False,
             "points": [[0, 0], [10, 0], [10, 10], [0, 10]]},
            {"transcription": "LOFTINESS*", "illegibility": False,
             "points": [[0, 0], [10, 0], [10, 10], [0, 10]]},
            {"transcription": "Story #", "illegibility": False,
             "points": [[2, 2], [12, 2], [12, 12], [2, 12]]},
        ],
        "img1": [  # exercises the shard-1 IOError fallback
            {"transcription": "skip#this", "illegibility": False,
             "points": [[0, 0], [8, 0], [8, 8], [0, 8]]},
            {"transcription": "ok", "illegibility": False,
             "points": [[4, 4], [24, 4], [24, 14], [4, 14]]},
        ],
    }
    with open(ospj(root, "train_full_labels.json"), "w") as f:
        json.dump(ann, f)
    conv.convert_lsvt(root)
    rows = read_gt(ospj(root, "train_label.txt"))
    assert rows == [
        "image_train/img_0_0.jpg good",
        "image_train/img_0_3.jpg Story #",
        "image_train/img_1_1.jpg ok",
    ]
    assert Image.open(ospj(root, "image_train", "img_0_0.jpg")).size == (20, 15)
    assert Image.open(ospj(root, "image_train", "img_1_1.jpg")).size == (20, 10)


def test_convert_textocr(conv, tmp_path):
    """textocr_converter.py parity: bbox floor/ceil crops, '.' skip, val image
    indices continuing after train's, --rectify_pose rotation."""
    root = str(tmp_path)
    save_jpeg(ospj(root, "train_imgs", "t0.jpg"), h=50, w=100, seed=3)
    save_jpeg(ospj(root, "val_imgs", "v0.jpg"), h=50, w=100, seed=4)

    def make(split, img_dir, fname, anns):
        data = {
            "imgs": {"i1": {"id": "i1", "file_name": f"{img_dir}/{fname}"}},
            "imgToAnns": {"i1": [f"a{k}" for k in range(len(anns))]},
            "anns": {f"a{k}": a for k, a in enumerate(anns)},
        }
        with open(ospj(root, f"TextOCR_0.1_{split}.json"), "w") as f:
            json.dump(data, f)

    # vertical box (h > w) with points running top-left downward → rot 90
    make("train", "train_imgs", "t0.jpg", [
        {"utf8_string": "word", "bbox": [10.2, 5.7, 19.5, 9.1],
         "points": [10, 5, 30, 5, 30, 15, 10, 15]},
        {"utf8_string": ".", "bbox": [0, 0, 5, 5], "points": [0, 0, 5, 0, 5, 5, 0, 5]},
    ])
    make("val", "val_imgs", "v0.jpg", [
        {"utf8_string": "tall", "bbox": [20, 10, 8, 24],
         "points": [20, 10, 28, 10, 28, 34, 20, 34]},
    ])
    conv.convert_textocr(root, rectify_pose=True)
    assert read_gt(ospj(root, "train_label.txt")) == ["image/img_0_0.jpg word"]
    # val img_idx continues after the 1 train image
    assert read_gt(ospj(root, "val_label.txt")) == ["image/img_1_0.jpg tall"]
    # floor(10.2)=10, ceil(19.5)=20 → width 20; floor(5.7)=5, ceil(9.1)=10
    assert Image.open(ospj(root, "image", "img_0_0.jpg")).size == (20, 10)


def test_rectify_pose_rotations(conv):
    """The four orientation cases of textocr_converter.py:29-49."""
    img = Image.fromarray(np.zeros((10, 20, 3), np.uint8))  # landscape crop
    # horizontal, reading left→right: first/last points nearest top-left
    out = conv._rectify_pose(img, (0, 0), [0, 0, 20, 0, 20, 10, 0, 10])
    assert out.size == (20, 10)
    # upside-down: first/last points are the far corners
    out = conv._rectify_pose(img, (0, 0), [20, 10, 0, 10, 0, 0, 20, 0])
    assert out.size == (20, 10)  # rot 180 keeps size
    tall = Image.fromarray(np.zeros((20, 10, 3), np.uint8))
    # vertical text: rotated ±90 becomes landscape
    out = conv._rectify_pose(tall, (0, 0), [0, 0, 0, 20, 10, 20, 10, 0])
    assert out.size in ((20, 10), (10, 20))


def test_convert_coco2(conv, tmp_path):
    """coco_2_converter.py parity: class/language/legibility filters, html
    unescape, '#'/'*' filters, pad-2 crop clamped to the image."""
    root = str(tmp_path)
    save_jpeg(ospj(root, "train2014", "c0.jpg"), h=30, w=60, seed=5)
    anns = {
        "1": {"utf8_string": "A&amp;W", "class": "machine printed",
              "language": "english", "legibility": "legible", "bbox": [4, 4, 10, 8]},
        "2": {"utf8_string": "hand", "class": "handwritten",
              "language": "english", "legibility": "legible", "bbox": [0, 0, 5, 5]},
        "3": {"utf8_string": "non", "class": "machine printed",
              "language": "not english", "legibility": "legible", "bbox": [0, 0, 5, 5]},
        "4": {"utf8_string": "blur", "class": "machine printed",
              "language": "english", "legibility": "illegible", "bbox": [0, 0, 5, 5]},
        "5": {"utf8_string": "par#tial", "class": "machine printed",
              "language": "english", "legibility": "legible", "bbox": [0, 0, 5, 5]},
        "6": {"utf8_string": "*bad", "class": "machine printed",
              "language": "english", "legibility": "legible", "bbox": [0, 0, 5, 5]},
        "7": {"utf8_string": "edge", "class": "machine printed",
              "language": "english", "legibility": "legible", "bbox": [55, 25, 10, 10]},
    }
    data = {
        "imgs": {"10": {"id": 10, "set": "train", "file_name": "c0.jpg"}},
        "imgToAnns": {"10": [1, 2, 3, 4, 5, 6, 7]},
        "anns": anns,
    }
    with open(ospj(root, "cocotext.v2.json"), "w") as f:
        json.dump(data, f)
    conv.convert_coco2(root)
    rows = read_gt(ospj(root, "train_label.txt"))
    assert rows == ["image/img_0_0.jpg A&W", "image/img_0_6.jpg edge"]
    assert read_gt(ospj(root, "val_label.txt")) == []
    # bbox [4,4,10,8] pad 2 → x1=2, x2=2+10+4=16; y1=2, y2=2+8+4=14: 14×12
    assert Image.open(ospj(root, "image", "img_0_0.jpg")).size == (14, 12)
    # bbox [55,25,10,10] pad 2 → x1=53, x2 clamped to 60; y1=23, y2→30
    assert Image.open(ospj(root, "image", "img_0_6.jpg")).size == (7, 7)


def test_convert_openvino(conv, tmp_path):
    """openvino_converter.py parity: per-shard label files, missing shards
    skipped, legible/english filter."""
    root = str(tmp_path)
    save_jpeg(ospj(root, "o0.jpg"), h=40, w=40, seed=6)
    data = {
        "images": [{"id": 7, "file_name": "o0.jpg"}],
        "annotations": [
            {"image_id": 7, "bbox": [2, 2, 10, 10],
             "attributes": {"legible": True, "language": "english", "transcription": "sign"}},
            {"image_id": 7, "bbox": [0, 0, 5, 5],
             "attributes": {"legible": False, "language": "english", "transcription": "x"}},
        ],
    }
    with open(ospj(root, "text_spotting_openimages_v5_train_1.json"), "w") as f:
        json.dump(data, f)  # shards 2/5/f and validation intentionally absent
    conv.convert_openvino(root)
    assert read_gt(ospj(root, "train_1_label.txt")) == ["image_1/img_0_0.jpg sign"]
    assert Image.open(ospj(root, "image_1", "img_0_0.jpg")).size == (10, 10)
    assert not os.path.exists(ospj(root, "val_label.txt"))


def test_converter_output_feeds_create_lmdb(conv, tmp_path):
    """End-to-end: art gt.txt → str_create_lmdb → LmdbStrDataset."""
    from udifftext_tpu.data.lmdb import LmdbStrDataset

    root = str(tmp_path)
    save_jpeg(ospj(root, "train_task2_images", "gt_1.jpg"), seed=7)
    with open(ospj(root, "train_task2_labels.json"), "w") as f:
        json.dump({"gt_1": [{"language": "Latin", "illegibility": False,
                             "transcription": "shop"}]}, f)
    conv.convert_art(root)
    create = load_script("str_create_lmdb")
    out = ospj(root, "lmdb_out")
    n = create.create_lmdb(root, ospj(root, "gt.txt"), out)
    assert n == 1
    ds = LmdbStrDataset(out)
    assert ds.labels == ["shop"]


def test_abinet_lm_encode_labels():
    """ABINetLM._encode parity: bare char ids (no EOS appended), zero(EOS)
    padding to 26 columns, one-hot over EOS+charset, lengths len+1."""
    lm_acc = load_script("str_abinet_lm_acc")
    onehot, lengths = lm_acc.encode_labels(["ab1", "z"])
    assert onehot.shape == (2, 26, 37) and lengths.tolist() == [4, 2]
    # charset order: ascii_lowercase then '1234567890' → a=1, b=2, '1'=27
    assert onehot[0].argmax(-1).tolist()[:4] == [1, 2, 27, 0]
    assert onehot[1].argmax(-1).tolist()[:2] == [26, 0]
    assert np.all(onehot.sum(-1) == 1.0)  # padding rows one-hot at EOS


def test_str_test_groups_and_flags(tmp_path, capsys):
    """str_test.py parity flags: grouped tables (Benchmark (Subset) /
    Benchmark / New), --new set list, --cased charset, --rotation pre-resize
    rotate (src/parseq/test.py:71-130, strhub/data/module.py:60-61)."""
    str_test = load_script("str_test")
    for name, labels in (("IIIT5k", ["Cat", "dog"]), ("ArT", ["Sign"])):
        d = tmp_path / name
        d.mkdir()
        lines = []
        for i, label in enumerate(labels):
            save_jpeg(str(d / f"w{i}.jpg"), h=20, w=40, seed=20 + i)
            lines.append(f"w{i}.jpg {label}")
        (d / "labels.txt").write_text("\n".join(lines) + "\n")
    str_test.main(["--data_root", str(tmp_path), "--model", "crnn",
                   "--new", "--cased", "--rotation", "90", "--batch", "4"])
    out = capsys.readouterr().out
    # IIIT5k appears in both benchmark groups; ArT only under New
    assert out.count("| IIIT5k") == 2
    assert "Benchmark (Subset) set:" in out and "New set:" in out
    assert "| ArT" in out and "| Combined" in out
    # the missing sets are skipped with a notice, not errors
    assert "skipping SVT (no data)" in out


REF_TOOLS = "/root/reference/src/parseq/tools"


def run_ref_tool(name, cwd, argv=()):
    import subprocess
    import sys

    r = subprocess.run([sys.executable, ospj(REF_TOOLS, f"{name}.py"), *argv],
                       cwd=cwd, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.skipif(not os.path.isdir(REF_TOOLS), reason="reference tree unavailable")
def test_differential_vs_reference_tools(conv, tmp_path):
    """Byte-for-byte differential: run the reference's own stdlib-only
    converter scripts (art/case-sensitive/coco-text/mlt19) on a copy of each
    fixture and require identical output files from ours."""
    import shutil

    # --- fixtures (exercising every filter branch) ---
    art = tmp_path / "art"
    art.mkdir()
    with open(art / "train_task2_labels.json", "w") as f:
        json.dump({
            "gt_1": [{"language": "Latin", "illegibility": False, "transcription": " shop "}],
            "gt_2": [{"language": "Chinese", "illegibility": False, "transcription": "x"}],
            "gt_3": [{"language": "Latin", "illegibility": True, "transcription": "x"}],
            "gt_4": [{"language": "latin", "illegibility": False, "transcription": "LocaL#3"}],
            "gt_5": [{"language": "Latin", "illegibility": False, "transcription": "no#pe"}],
        }, f)

    cs = tmp_path / "cs"
    (cs / "label").mkdir(parents=True)
    (cs / "IMG").mkdir()
    for i, label in enumerate(["Cat ", "DoG"], start=1):
        save_jpeg(str(cs / "IMG" / f"{i}.png"), seed=i)
        (cs / "label" / f"{i}.txt").write_text(label + "\n")

    coco = tmp_path / "coco"
    coco.mkdir()
    (coco / "train_words_gt.txt").write_text("1001,hello\nbad-line\n1002,|pipe|\n")
    (coco / "val_words_gt.txt").write_text("2001,with,comma\n")

    mlt = tmp_path / "mlt"
    mlt.mkdir()
    (mlt / "gt.txt").write_text(
        "a.jpg,Latin,word\nb.jpg,Arabic,word\nc.jpg,Symbols,x,y\nd.jpg,Latin,\n")

    cases = [
        # (fixture dir, ours fn, ref tool, ref argv-or-cwd mode, output files)
        (art, conv.convert_art, "art_converter", "cwd", ["gt.txt"]),
        (cs, conv.convert_case_sensitive, "case_sensitive_str_datasets_converter",
         "argv", ["lmdb.txt"]),
        (coco, conv.convert_coco_text, "coco_text_converter", "cwd",
         ["train_lmdb.txt", "val_lmdb.txt"]),
        (mlt, conv.convert_mlt19, "mlt19_converter", "argv", ["lmdb.txt"]),
    ]
    for fixture, ours_fn, tool, mode, outputs in cases:
        ref_dir = tmp_path / (fixture.name + "_ref")
        shutil.copytree(fixture, ref_dir)
        ours_fn(str(fixture))
        run_ref_tool(tool, cwd=str(ref_dir),
                     argv=[str(ref_dir)] if mode == "argv" else [])
        for out in outputs:
            ours = (fixture / out).read_bytes()
            theirs = (ref_dir / out).read_bytes()
            assert ours == theirs, f"{tool}/{out}: ours={ours!r} theirs={theirs!r}"


def test_load_folder_filters_like_datamodule(tmp_path):
    """str_test.load_folder applies the reference datamodule's label
    filtering to labels.txt folders when a charset is given: whitespace
    removal, NFKD→ascii, length≤25 BEFORE adaptation, drop-if-empty
    (strhub/data/dataset.py:84-106)."""
    str_test = load_script("str_test")
    d = tmp_path / "set"
    d.mkdir()
    lines = [
        "a.jpg CaT",               # folds to 'cat' under lowercase charset
        "b.jpg " + "x" * 30,       # over-length → dropped
        "c.jpg !!!",               # adapts to '' → dropped
        "d.jpg ca fé",             # whitespace removed, é → e
    ]
    for fname in ("a.jpg", "b.jpg", "c.jpg", "d.jpg"):
        save_jpeg(str(d / fname), seed=3)
    (d / "labels.txt").write_text("\n".join(lines) + "\n")
    charset = "0123456789abcdefghijklmnopqrstuvwxyz"
    items = str_test.load_folder(str(d), charset=charset)
    assert [g for _, g in items] == ["cat", "cafe"]
    # no charset → no adaptation/empty-drop, but the datamodule's
    # unconditional normalization (whitespace/NFKD/length) still applies
    assert [g for _, g in str_test.load_folder(str(d))] == ["CaT", "!!!", "cafe"]


def test_abinet_lm_acc_main(tmp_path, capsys):
    """scripts/str_abinet_lm_acc.py runs end-to-end on a labels.txt benchmark
    folder with random LM weights and prints the results table."""
    lm_acc = load_script("str_abinet_lm_acc")
    for name, labels in (("IIIT5k", ["cat", "dog42"]), ("ArT", ["sign"])):
        bench = tmp_path / name
        bench.mkdir()
        lines = []
        for i, label in enumerate(labels):
            save_jpeg(str(bench / f"w{i}.jpg"), seed=10 + i)
            lines.append(f"w{i}.jpg {label}")
        (bench / "labels.txt").write_text("\n".join(lines) + "\n")
    lm_acc.main(["--data_root", str(tmp_path), "--batch", "4", "--new"])
    out = capsys.readouterr().out
    assert "Benchmark set:" in out and "New set:" in out
    assert "| IIIT5k" in out and "         2 |" in out
    assert "| ArT" in out and "| Combined" in out
