"""Encoder-propagation quality gate (utils/encprop_gate.py): the APPROXIMATE
sampling mode must be refused for a checkpoint with no recorded quality
evidence (round-3 verdict weak #5)."""

import json
import os
import types

import pytest

from udifftext_tpu.utils import encprop_gate as G


@pytest.fixture(autouse=True)
def _reports_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("UDIFFTEXT_ENCPROP_REPORTS", str(tmp_path / "reports"))
    monkeypatch.delenv("UDIFFTEXT_ENCPROP_UNGATED", raising=False)
    G._WARNED.clear()
    yield


def test_report_roundtrip_and_ckpt_id(tmp_path):
    ck = tmp_path / "model.ckpt"
    ck.write_bytes(b"weights" * 1000)
    cid = G.ckpt_file_id(str(ck))
    assert cid and len(cid) == 16
    assert G.ckpt_file_id(str(ck)) == cid  # stable
    assert G.ckpt_file_id(str(tmp_path / "missing.ckpt")) is None
    path = G.write_report(cid, {"intervals": {"2": {"psnr": 41.5}}})
    assert os.path.exists(path)
    rep = G.load_report(cid)
    assert rep["ckpt_id"] == cid
    assert rep["intervals"]["2"]["psnr"] == 41.5


def test_gate_refuses_without_report():
    with pytest.raises(RuntimeError, match="no quality report"):
        G.gate_encprop("abc123", 2)


def test_gate_refuses_low_psnr_and_missing_interval():
    G.write_report("abc123", {"intervals": {"2": {"psnr": 12.0}}})
    with pytest.raises(RuntimeError, match="below the"):
        G.gate_encprop("abc123", 2)
    with pytest.raises(RuntimeError, match="no measurement for interval 5"):
        G.gate_encprop("abc123", 5)
    # a lower explicit gate admits the same report
    G.gate_encprop("abc123", 2, min_psnr=10.0)


def test_gate_passes_good_report(capsys):
    G.write_report("good1", {"intervals": {"3": {"psnr": 44.0}}})
    G.gate_encprop("good1", 3)
    assert "quality gate passed" in capsys.readouterr().out


def test_gate_warns_once_without_ckpt_id(capsys):
    G.gate_encprop(None, 2)
    G.gate_encprop(None, 2)
    err = capsys.readouterr().err
    assert err.count("UNVALIDATED") == 1


def test_gate_env_bypass(monkeypatch):
    monkeypatch.setenv("UDIFFTEXT_ENCPROP_UNGATED", "1")
    G.gate_encprop("abc123", 2)  # would refuse without the bypass


def test_jitted_predictor_enforces_gate():
    from udifftext_tpu.predict import JittedPredictor

    eng = types.SimpleNamespace(sample=lambda *a, **k: None,
                                general_conditioner=None)
    with pytest.raises(RuntimeError, match="refused"):
        JittedPredictor(eng, encprop_interval=2, ckpt_id="deadbeef")
    # with a recorded report it constructs
    G.write_report("deadbeef", {"intervals": {"2": {"psnr": 39.0}}})
    p = JittedPredictor(eng, encprop_interval=2, ckpt_id="deadbeef")
    assert p.encprop_interval == 2
    # exact sampling never consults the gate
    p2 = JittedPredictor(eng, encprop_interval=0, ckpt_id=None)
    assert p2.encprop_interval == 0


def test_quality_script_writes_gateable_report(tmp_path):
    """scripts/encprop_quality.py --report-id writes a report the gate
    accepts end-to-end (tiny graph exercised via the module's own API is
    covered above; here we validate the JSON contract the script emits)."""
    # simulate the script's write path without the 512^2 sampling cost
    from udifftext_tpu.utils.encprop_gate import write_report

    path = write_report("testkey", {
        "mode": "RANDOM-INIT", "steps": 2, "scale": 5.0, "size": 32,
        "text": "ok", "intervals": {"2": {"psnr": 55.0, "max_abs": 0.001}},
    })
    with open(path) as f:
        rep = json.load(f)
    assert rep["intervals"]["2"]["psnr"] == 55.0
    G.gate_encprop("testkey", 2)


def test_gate_refuses_settings_mismatch():
    """A report measured at different sampler settings is not evidence —
    encprop quality is strongly steps-dependent (review round 4)."""
    G.write_report("cfg1", {"steps": 4, "scale": 5.0,
                            "intervals": {"2": {"psnr": 45.0}}})
    with pytest.raises(RuntimeError, match="different sampler settings"):
        G.gate_encprop("cfg1", 2, settings={"steps": 50, "scale": 5.0})
    # matching settings pass; reports predating the fields warn but pass
    G.gate_encprop("cfg1", 2, settings={"steps": 4, "scale": 5.0})
    G.write_report("cfg2", {"intervals": {"2": {"psnr": 45.0}}})
    G.gate_encprop("cfg2", 2, settings={"steps": 50, "scale": 5.0})


def test_write_report_merges_matching_settings():
    """Measuring --intervals 2 then --intervals 3 under the same settings
    accumulates; different settings overwrite wholesale (mixed-settings
    intervals must not coexist)."""
    base = {"steps": 50, "scale": 5.0, "size": 512}
    G.write_report("m1", {**base, "intervals": {"2": {"psnr": 40.0}}})
    G.write_report("m1", {**base, "intervals": {"3": {"psnr": 36.0}}})
    rep = G.load_report("m1")
    assert set(rep["intervals"]) == {"2", "3"}
    G.write_report("m1", {"steps": 4, "scale": 5.0, "size": 512,
                          "intervals": {"2": {"psnr": 48.0}}})
    rep = G.load_report("m1")
    assert set(rep["intervals"]) == {"2"} and rep["steps"] == 4


def test_ckpt_dir_id_distinguishes_same_layout(tmp_path):
    """Two orbax-style checkpoint dirs with IDENTICAL file layout and sizes
    but different weight bytes must hash differently — a size-only manifest
    collided and let a stale report admit unmeasured weights."""
    for name, fill in (("ck_a", b"\x01"), ("ck_b", b"\x02")):
        d = tmp_path / name / "array_store"
        d.mkdir(parents=True)
        (d / "chunk_0").write_bytes(fill * 4096)
        (tmp_path / name / "manifest.json").write_text('{"v": 1}')
    id_a = G.ckpt_file_id(str(tmp_path / "ck_a"))
    id_b = G.ckpt_file_id(str(tmp_path / "ck_b"))
    assert id_a and id_b and id_a != id_b
    # and large files sample head+tail: a tail-only change is caught
    big = tmp_path / "ck_a" / "array_store" / "big"
    big.write_bytes(b"\x03" * (1 << 18))
    id_1 = G.ckpt_file_id(str(tmp_path / "ck_a"))
    data = bytearray(b"\x03" * (1 << 18)); data[-1] = 0x04
    big.write_bytes(bytes(data))
    assert G.ckpt_file_id(str(tmp_path / "ck_a")) != id_1
