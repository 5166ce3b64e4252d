"""Pure-Python LMDB reader/writer round-trip + the parseq-layout STR dataset
(strhub/data/dataset.py:31-137 parity without the lmdb C library)."""

import os
import io

import numpy as np
import pytest
from PIL import Image

from udifftext_tpu.data.lmdb import LMDBReader, LmdbStrDataset, write_lmdb


def test_lmdb_roundtrip_small(tmp_path):
    d = str(tmp_path / "db")
    items = {f"key-{i:04d}".encode(): f"value {i}".encode() for i in range(500)}
    write_lmdb(d, items)
    with LMDBReader(d) as db:
        assert len(db) == 500
        assert db.get(b"key-0007") == b"value 7"
        assert db.get(b"key-0499") == b"value 499"
        assert db.get(b"missing") is None
        got = dict(db.items())
    assert got == items


def test_lmdb_overflow_values(tmp_path):
    """Values larger than half a page ride overflow pages (F_BIGDATA)."""
    d = str(tmp_path / "db")
    big = bytes(range(256)) * 64  # 16 KB, spans >4 pages
    items = {b"small": b"x", b"big": big, b"big2": big[::-1]}
    write_lmdb(d, items)
    with LMDBReader(d) as db:
        assert db.get(b"big") == big
        assert db.get(b"big2") == big[::-1]
        assert db.get(b"small") == b"x"
        assert dict(db.items()) == items


def test_lmdb_multilevel_tree(tmp_path):
    """Enough entries to force branch pages (depth > 1)."""
    d = str(tmp_path / "db")
    rng = np.random.RandomState(0)
    items = {
        bytes(rng.randint(97, 123, 24).astype(np.uint8)): bytes(
            rng.randint(0, 256, 100).astype(np.uint8)
        )
        for _ in range(3000)
    }
    write_lmdb(d, items)
    with LMDBReader(d) as db:
        assert len(db) == len(items)
        keys = sorted(items)
        for k in (keys[0], keys[len(keys) // 2], keys[-1]):
            assert db.get(k) == items[k]
        assert [k for k, _ in db.items()] == keys


def test_lmdb_str_dataset(tmp_path):
    d = str(tmp_path / "IIIT5k")
    items = {b"num-samples": b"3"}
    labels = ["cat", "dog", "toolongtoolongtoolongtoolong"]
    for i, label in enumerate(labels, start=1):
        arr = (np.random.RandomState(i).rand(32, 100, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        items[b"image-%09d" % i] = buf.getvalue()
        items[b"label-%09d" % i] = label.encode()
    write_lmdb(d, items)

    ds = LmdbStrDataset(d, max_label_len=25)
    assert len(ds) == 2  # the 28-char label is filtered out
    img, label = ds[0]
    assert label == "cat"
    assert img.size == (100, 32)

    # charset filtering (CharsetAdapter semantics)
    ds2 = LmdbStrDataset(d, charset="cat")
    assert len(ds2) == 1 and ds2.labels == ["cat"]


def test_str_test_cli_consumes_lmdb(tmp_path):
    """scripts/str_test.py evaluates an LMDB benchmark dir end-to-end."""
    import os
    import subprocess
    import sys

    d = str(tmp_path / "IIIT5k")
    items = {b"num-samples": b"2"}
    for i, label in enumerate(["cat", "dog"], start=1):
        arr = (np.random.RandomState(i).rand(32, 100, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        items[b"image-%09d" % i] = buf.getvalue()
        items[b"label-%09d" % i] = label.encode()
    write_lmdb(d, items)

    env = {
        k: v for k, v in os.environ.items()
        # the axon sitecustomize forces the TPU backend via jax.config unless
        # its trigger vars are absent (same dance as __graft_entry__)
        if not k.startswith(("PALLAS_AXON_", "AXON_")) and not k.startswith("TPU_")
    }
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "scripts/str_test.py", "--data_root", str(tmp_path),
         "--model", "crnn"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Benchmark set:" in out.stdout, out.stdout
    assert "| IIIT5k" in out.stdout and "| Combined" in out.stdout, out.stdout


def _cpu_subprocess_env():
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON_", "AXON_")) and not k.startswith("TPU_")
    }
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_str_train_cli_on_folder_and_lmdb(tmp_path):
    """scripts/str_train.py trains 2 steps from both item layouts (the
    load_folder contract covers folder labels.txt and LMDB dirs)."""
    import os
    import subprocess
    import sys

    # folder layout
    fd = tmp_path / "folder"
    fd.mkdir()
    lines = []
    for i, label in enumerate(["cat", "dog"]):
        arr = (np.random.RandomState(i).rand(32, 100, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(fd / f"im{i}.png")
        lines.append(f"im{i}.png {label}")
    (fd / "labels.txt").write_text("\n".join(lines) + "\n")

    # lmdb layout
    ld = str(tmp_path / "lmdb")
    items = {b"num-samples": b"2"}
    for i, label in enumerate(["cat", "dog"], start=1):
        arr = (np.random.RandomState(i).rand(32, 100, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        items[b"image-%09d" % i] = buf.getvalue()
        items[b"label-%09d" % i] = label.encode()
    write_lmdb(ld, items)

    # folder layout also exercises --swa (reference wires Lightning
    # StochasticWeightAveraging(swa_epoch_start=0.75) into the parseq
    # trainer, src/parseq/train.py:69): the tail-averaged params are what
    # gets checkpointed, i.e. what str_test.py evaluates
    for root, extra in ((str(fd), ["--steps", "4", "--swa",
                                   "--swa_start_pct", "0.5"]),
                        (ld, ["--steps", "2"])):
        out = subprocess.run(
            [sys.executable, "scripts/str_train.py", "--data_root", root,
             "--batch", "2", "--ckpt_dir", str(tmp_path / "ckpt")] + extra,
            capture_output=True, text=True, env=_cpu_subprocess_env(),
            cwd="/root/repo", timeout=900,
        )
        assert out.returncode == 0, (root, out.stderr[-2000:])
        assert "saved" in out.stdout, out.stdout
        if "--swa" in extra:
            assert "swa: averaged 2 snapshots from step 3" in out.stdout, out.stdout


def test_lmdb_str_dataset_charset_adapter(tmp_path):
    """Label preprocessing mirrors strhub CharsetAdapter + dataset.py:84-106:
    mixed-case labels are case-folded (not dropped) for single-case charsets,
    unicode is NFKD-normalized, and unsupported chars are stripped."""
    d = str(tmp_path / "db")
    labels = ["CaT", "Dog!", "café", "123", "...."]
    items = {b"num-samples": str(len(labels)).encode()}
    for i, label in enumerate(labels, start=1):
        arr = (np.random.RandomState(i).rand(16, 48, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        items[b"image-%09d" % i] = buf.getvalue()
        items[b"label-%09d" % i] = label.encode()
    write_lmdb(d, items)

    lower36 = "0123456789abcdefghijklmnopqrstuvwxyz"
    ds = LmdbStrDataset(d, charset=lower36)
    # CaT → cat; Dog! → dog; café → cafe (NFKD é → e); 123 kept; "...." → ""
    assert ds.labels == ["cat", "dog", "cafe", "123"]

    upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ds_up = LmdbStrDataset(d, charset=upper)
    assert ds_up.labels == ["CAT", "DOG", "CAFE"]


def test_str_create_lmdb_script(tmp_path):
    """scripts/str_create_lmdb.py (tools/create_lmdb_dataset.py parity):
    folder + gt file → LMDB that LmdbStrDataset consumes."""
    import subprocess
    import sys

    src = tmp_path / "raw"
    src.mkdir()
    lines = []
    for i, label in enumerate(["hello", "world"]):
        arr = (np.random.RandomState(i).rand(20, 60, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(src / f"img{i}.png")
        lines.append(f"img{i}.png {label}")
    # one bogus entry that must be skipped by the validity check
    (src / "broken.png").write_bytes(b"not an image")
    lines.append("broken.png junk")
    (src / "labels.txt").write_text("\n".join(lines) + "\n")

    out_dir = str(tmp_path / "lmdb_out")
    proc = subprocess.run(
        [sys.executable, "scripts/str_create_lmdb.py",
         "--input", str(src), "--output", out_dir],
        capture_output=True, text=True, env=_cpu_subprocess_env(),
        cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "2 samples" in proc.stdout

    ds = LmdbStrDataset(out_dir)
    assert ds.labels == ["hello", "world"]
    img, label = ds[0]
    assert img.size == (60, 20) and label == "hello"


def test_str_filter_lmdb_script(tmp_path):
    """scripts/str_filter_lmdb.py (tools/filter_lmdb.py parity): merge two
    LMDBs, drop under-sized images, renumber 1-based."""
    import subprocess
    import sys

    def make_db(name, samples):
        items = {}
        for i, (label, hw) in enumerate(samples, start=1):
            arr = (np.random.RandomState(i).rand(*hw, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            items[b"image-%09d" % i] = buf.getvalue()
            items[b"label-%09d" % i] = label.encode()
        items[b"num-samples"] = str(len(samples)).encode()
        d = str(tmp_path / name)
        write_lmdb(d, items)
        return d

    db_a = make_db("a", [("keep1", (20, 60)), ("tiny", (4, 60)), ("keep2", (16, 16))])
    db_b = make_db("b", [("keep3", (32, 32))])

    out_dir = str(tmp_path / "merged")
    proc = subprocess.run(
        [sys.executable, "scripts/str_filter_lmdb.py", db_a, db_b,
         "--output", out_dir, "--min_image_dim", "8"],
        capture_output=True, text=True, env=_cpu_subprocess_env(),
        cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Written 3 samples" in proc.stdout and "out of 4" in proc.stdout

    ds = LmdbStrDataset(out_dir)
    assert ds.labels == ["keep1", "keep2", "keep3"]
    img, label = ds[2]
    assert img.size == (32, 32) and label == "keep3"


# -- native C++ reader (udifftext_tpu/native/lmdb_reader.cpp) -----------------


def _native_or_skip():
    from udifftext_tpu.data import lmdb_native

    if not lmdb_native.available():
        pytest.skip(f"no native build: {lmdb_native.build_error()}")
    return lmdb_native


def test_native_reader_differential(tmp_path):
    """The C++ reader returns byte-identical results to the Python reader on
    every tree shape the writer produces: single leaf, overflow values, and a
    multi-level branch tree with random keys."""
    lmdb_native = _native_or_skip()
    rng = np.random.RandomState(1)
    cases = {
        "small": {f"key-{i:04d}".encode(): f"value {i}".encode()
                  for i in range(500)},
        "overflow": {b"small": b"x", b"big": bytes(range(256)) * 64,
                     b"big2": (bytes(range(256)) * 64)[::-1]},
        "tree": {
            bytes(rng.randint(97, 123, 24).astype(np.uint8)): bytes(
                rng.randint(0, 256, 100).astype(np.uint8))
            for _ in range(3000)
        },
    }
    for name, items in cases.items():
        d = str(tmp_path / name)
        write_lmdb(d, items)
        with LMDBReader(d) as py, lmdb_native.NativeLMDBReader(d) as cc:
            assert len(cc) == len(py) == len(items)
            for k, v in items.items():
                assert cc.get(k) == v
            assert cc.get(b"\x00definitely-missing") is None
            assert cc.get(b"\xffdefinitely-missing") is None
            assert list(cc.items()) == list(py.items())


def test_open_lmdb_backend_selection(tmp_path, monkeypatch):
    """open_lmdb prefers the native reader, honors UDIFFTEXT_LMDB=py, and the
    STR dataset path works over whichever backend is selected."""
    from udifftext_tpu.data import lmdb_native
    from udifftext_tpu.data.lmdb import open_lmdb

    d = str(tmp_path / "db")
    write_lmdb(d, {b"num-samples": b"0", b"k": b"v"})
    monkeypatch.setenv("UDIFFTEXT_LMDB", "py")
    assert isinstance(open_lmdb(d), LMDBReader)
    monkeypatch.delenv("UDIFFTEXT_LMDB")
    db = open_lmdb(d)
    if lmdb_native.available():
        assert isinstance(db, lmdb_native.NativeLMDBReader)
    assert db.get(b"k") == b"v"
    db.close()
