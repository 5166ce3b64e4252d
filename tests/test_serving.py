"""Serving layer: micro-batching scheduler + HTTP front-end.

The model side is injected as a fake predictor, so these run on any host —
they pin the scheduling contract (static batch shapes, ordering, deadline
flush, failure isolation) that keeps the TPU predictor at one compile.
"""

import base64
import importlib.util
import io
import json
import threading
import time
import urllib.request
from os.path import dirname
from os.path import join as ospj

import numpy as np
import pytest

from udifftext_tpu.serving import InpaintRequest, InpaintService, MicroBatcher

REPO = dirname(dirname(__file__))


def _load_serve_module():
    spec = importlib.util.spec_from_file_location(
        "serve", ospj(REPO, "scripts", "serve.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# -- MicroBatcher ------------------------------------------------------------


def test_full_batch_dispatches_before_deadline():
    calls = []

    def run(items):
        calls.append(list(items))
        return [i * 10 for i in items]

    mb = MicroBatcher(run, max_batch=4, max_delay_ms=5000.0)
    t0 = time.monotonic()
    futs = [mb.submit(i) for i in range(4)]
    results = [f.result(timeout=10) for f in futs]
    elapsed = time.monotonic() - t0
    mb.shutdown()
    assert results == [0, 10, 20, 30]
    assert elapsed < 4.0, "a full batch must not wait out the deadline"
    assert [sorted(c) for c in calls] == [[0, 1, 2, 3]]


def test_stats_latency_windows():
    """stats() reports rolling queue-wait and model-call latency percentiles
    — the two halves of end-to-end latency a capacity planner needs."""
    def run(items):
        time.sleep(0.05)
        return list(items)

    mb = MicroBatcher(run, max_batch=2, max_delay_ms=1.0)
    futs = [mb.submit(i) for i in range(4)]
    [f.result(timeout=10) for f in futs]
    st = mb.stats()
    mb.shutdown()
    assert st["run"]["p50_s"] >= 0.05
    assert st["run"]["p95_s"] >= st["run"]["p50_s"]
    assert st["queue_wait"]["p95_s"] >= st["queue_wait"]["p50_s"] >= 0.0


def test_deadline_flushes_partial_batch():
    sizes = []

    def run(items):
        sizes.append(len(items))
        return items

    mb = MicroBatcher(run, max_batch=8, max_delay_ms=100.0)
    assert mb.submit("only").result(timeout=10) == "only"
    mb.shutdown()
    assert sizes == [1]


def test_results_map_to_their_requests():
    def run(items):
        return [f"r:{i}" for i in items]

    mb = MicroBatcher(run, max_batch=3, max_delay_ms=50.0)
    futs = {i: mb.submit(i) for i in range(7)}
    for i, f in futs.items():
        assert f.result(timeout=10) == f"r:{i}"
    mb.shutdown()
    st = mb.stats()
    assert st["requests"] == 7
    assert st["batches"] >= 3  # 7 items across max-3 groups


def test_error_fails_group_but_keeps_serving():
    state = {"fail": True}

    def run(items):
        if state["fail"]:
            raise RuntimeError("backend down")
        return items

    mb = MicroBatcher(run, max_batch=2, max_delay_ms=30.0)
    f1, f2 = mb.submit(1), mb.submit(2)
    with pytest.raises(RuntimeError, match="backend down"):
        f1.result(timeout=10)
    with pytest.raises(RuntimeError, match="backend down"):
        f2.result(timeout=10)
    state["fail"] = False
    assert mb.submit(3).result(timeout=10) == 3
    assert mb.stats()["errors"] == 2
    mb.shutdown()


def test_result_count_mismatch_is_an_error():
    mb = MicroBatcher(lambda items: items[:-1] if len(items) > 1 else items,
                      max_batch=2, max_delay_ms=1000.0)
    f1, f2 = mb.submit(1), mb.submit(2)
    with pytest.raises(RuntimeError, match="returned 1 results"):
        f1.result(timeout=10)
    with pytest.raises(RuntimeError):
        f2.result(timeout=10)
    mb.shutdown()


def test_shutdown_rejects_new_requests():
    mb = MicroBatcher(lambda items: items, max_batch=2, max_delay_ms=10.0)
    mb.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        mb.submit(1)


# -- InpaintService ----------------------------------------------------------


def _fake_predictor(max_batch, size, shapes_seen):
    def predict(arr_batch, key):
        shapes_seen.append({k: v.shape for k, v in arr_batch.items()})
        # uint8 wire format: the service ships raw uint8 image/mask; the
        # predictor normalizes and synthesizes `masked` on-device
        assert arr_batch["image"].shape == (max_batch, size, size, 3)
        assert arr_batch["image"].dtype == np.uint8
        assert arr_batch["mask"].shape == (max_batch, size, size, 1)
        assert arr_batch["mask"].dtype == np.uint8
        assert arr_batch["seg_mask"].shape == (max_batch, 12)
        assert arr_batch["label_ids"].shape == (max_batch, 12)
        # per-row identifiable output: row index / 255 as a constant image
        out = np.zeros((max_batch, size, size, 3), np.float32)
        for i in range(max_batch):
            out[i] = i / 255.0
        return out

    return predict


def test_inpaint_service_pads_to_static_shape():
    shapes = []
    svc = InpaintService(
        _fake_predictor(4, 16, shapes), max_batch=4, max_delay_ms=200.0, size=16
    )
    reqs = [
        InpaintRequest(
            image=np.full((8, 8, 3), 100, np.uint8),
            mask=np.ones((8, 8), np.uint8),
            text=f"t{i}",
        )
        for i in range(3)
    ]
    futs = [svc.submit(r) for r in reqs]
    results = [f.result(timeout=20) for f in futs]
    svc.shutdown()
    # 3 requests -> one padded batch of 4; every presented shape identical
    assert len(shapes) == 1
    for i, res in enumerate(results):
        assert res["row"] == i
        assert res["batch_key"] == 0
        assert np.all(res["image"] == i)  # row i's identifiable constant
        assert res["image"].dtype == np.uint8


def test_inpaint_service_key_counter_advances():
    shapes = []
    svc = InpaintService(
        _fake_predictor(1, 16, shapes), max_batch=1, max_delay_ms=1.0, size=16
    )
    req = InpaintRequest(
        image=np.zeros((8, 8, 3), np.uint8), mask=np.ones((8, 8)), text="x"
    )
    a = svc.inpaint(req, timeout=20)
    b = svc.inpaint(req, timeout=20)
    svc.shutdown()
    assert (a["batch_key"], b["batch_key"]) == (0, 1)


def test_inpaint_service_rejects_bad_text():
    svc = InpaintService(
        _fake_predictor(1, 16, []), max_batch=1, max_delay_ms=1.0, size=16
    )
    req = InpaintRequest(
        image=np.zeros((8, 8, 3), np.uint8),
        mask=np.ones((8, 8)),
        text="way-too-long-for-twelve",
    )
    with pytest.raises(ValueError, match="1..12 characters"):
        svc.inpaint(req, timeout=20)
    svc.shutdown()


def test_bad_request_does_not_poison_cobatched_group():
    """Validation happens at submit time: an invalid request fails alone,
    while the valid request it would have been co-batched with succeeds."""
    svc = InpaintService(
        _fake_predictor(2, 16, []), max_batch=2, max_delay_ms=150.0, size=16
    )
    good = svc.submit(
        InpaintRequest(
            image=np.zeros((8, 8, 3), np.uint8), mask=np.ones((8, 8)), text="ok"
        )
    )
    with pytest.raises(ValueError, match="1..12 characters"):
        svc.submit(
            InpaintRequest(
                image=np.zeros((8, 8, 3), np.uint8),
                mask=np.ones((8, 8)),
                text="",
            )
        )
    res = good.result(timeout=20)
    svc.shutdown()
    assert res["row"] == 0 and np.all(res["image"] == 0)


def _echo_predictor(size, batch_sizes_seen):
    """Bucket-agnostic fake: returns output matching the presented batch."""

    def predict(arr_batch, key):
        b = arr_batch["image"].shape[0]
        batch_sizes_seen.append(b)
        out = np.zeros((b, size, size, 3), np.float32)
        for i in range(b):
            out[i] = i / 255.0
        return out

    return predict


def _req(text="ok"):
    return InpaintRequest(
        image=np.zeros((8, 8, 3), np.uint8), mask=np.ones((8, 8)), text=text
    )


def test_inpaint_service_buckets_pad_to_smallest_fit():
    """With batch_buckets, a group is padded only to the smallest bucket that
    fits it (latency: a lone request no longer pays the max_batch dispatch),
    and the response records the bucket for exact replay."""
    sizes = []
    svc = InpaintService(
        _echo_predictor(16, sizes), max_batch=4, max_delay_ms=120.0, size=16,
        batch_buckets=(1, 4),
    )
    lone = svc.inpaint(_req(), timeout=20)
    futs = [svc.submit(_req()) for _ in range(3)]
    grouped = [f.result(timeout=20) for f in futs]
    svc.shutdown()
    assert sizes == [1, 4]  # lone request at bucket 1, group of 3 padded to 4
    assert lone["batch_size"] == 1 and lone["row"] == 0
    assert all(r["batch_size"] == 4 for r in grouped)
    assert [r["row"] for r in grouped] == [0, 1, 2]


def test_inpaint_service_bucket_validation():
    with pytest.raises(ValueError, match="must equal max_batch"):
        InpaintService(_echo_predictor(16, []), max_batch=4, size=16,
                       batch_buckets=(1, 2))
    with pytest.raises(ValueError, match="positive"):
        InpaintService(_echo_predictor(16, []), max_batch=4, size=16,
                       batch_buckets=(0, 4))


def test_inpaint_service_dp_divisibility():
    """dp (data-parallel serving degree) must divide every bucket so GSPMD
    sharding never sees an indivisible batch — validated at construction,
    not as an opaque error on the first unlucky group."""
    with pytest.raises(ValueError, match="divisible by the data-parallel"):
        InpaintService(_echo_predictor(16, []), max_batch=4, size=16,
                       batch_buckets=(1, 4), dp=2)
    with pytest.raises(ValueError, match="dp must be >= 1"):
        InpaintService(_echo_predictor(16, []), max_batch=4, size=16, dp=0)
    sizes = []
    svc = InpaintService(_echo_predictor(16, sizes), max_batch=4, size=16,
                         max_delay_ms=1.0, batch_buckets=(2, 4), dp=2)
    res = svc.inpaint(_req(), timeout=20)
    svc.shutdown()
    assert sizes == [2] and res["batch_size"] == 2  # lone request pads to dp


def test_inpaint_service_warmup_compiles_each_bucket():
    sizes = []
    svc = InpaintService(
        _echo_predictor(16, sizes), max_batch=4, max_delay_ms=1.0, size=16,
        batch_buckets=(1, 2, 4),
    )
    svc.warmup()
    svc.shutdown()
    assert sizes == [1, 2, 4]


def test_inpaint_service_default_single_bucket_unchanged():
    """No batch_buckets -> the strict one-compile behavior: every group padded
    to max_batch exactly as before."""
    sizes = []
    svc = InpaintService(
        _echo_predictor(16, sizes), max_batch=4, max_delay_ms=1.0, size=16
    )
    res = svc.inpaint(_req(), timeout=20)
    svc.shutdown()
    assert sizes == [4] and res["batch_size"] == 4


# -- HTTP front-end -----------------------------------------------------------


def _b64_png(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def test_http_server_roundtrip():
    from http.server import ThreadingHTTPServer

    serve_mod = _load_serve_module()
    svc = InpaintService(
        _fake_predictor(2, 16, []), max_batch=2, max_delay_ms=10.0, size=16
    )
    ready = threading.Event()
    ready.set()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_mod.make_handler(svc, ready)
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert r.status == 200

        payload = json.dumps(
            {
                "image": _b64_png(np.full((8, 8, 3), 128, np.uint8)),
                "mask": _b64_png(np.full((8, 8), 255, np.uint8)),
                "text": "ok",
            }
        ).encode()
        req = urllib.request.Request(
            base + "/v1/inpaint", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        assert body["row"] == 0
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(body["image"])))
        assert img.size == (16, 16)

        with urllib.request.urlopen(base + "/v1/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 1

        # malformed request -> 400, server stays up
        bad = urllib.request.Request(
            base + "/v1/inpaint", data=b'{"text": "no images"}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        svc.shutdown()


# -- pipelined dispatch (launch/finalize split) ------------------------------


def test_pipelined_batcher_overlaps_launch_with_finalize():
    """With finalize given and depth 2, the dispatcher may LAUNCH group N+1
    while group N is still finalizing (the overlap that hides host work and
    wire transfer behind device compute), and results still resolve in
    dispatch order."""
    import threading as _t

    launches, finals = [], []
    gate = _t.Event()

    def launch(items):
        launches.append((time.monotonic(), list(items)))
        return list(items)

    def finalize(handle):
        if not finals:
            gate.wait(5.0)  # hold group 0 in finalize until group 1 launched
        finals.append(time.monotonic())
        return [f"done-{i}" for i in handle]

    mb = MicroBatcher(launch, max_batch=1, max_delay_ms=0.0,
                      finalize=finalize, pipeline_depth=2)
    f0 = mb.submit(0)
    f1 = mb.submit(1)
    # wait for BOTH launches, then open the gate
    t0 = time.monotonic()
    while len(launches) < 2 and time.monotonic() - t0 < 5.0:
        time.sleep(0.005)
    n_launched_while_finalizing = len(launches)
    gate.set()
    assert f0.result(timeout=10) == "done-0"
    assert f1.result(timeout=10) == "done-1"
    mb.shutdown()
    # group 1 launched while group 0 sat in finalize -> true overlap
    assert n_launched_while_finalizing == 2
    st = mb.stats()
    assert st["batches"] == 2 and st["errors"] == 0


def test_pipelined_depth_one_serializes():
    """pipeline_depth=1 must never launch group N+1 before group N finished
    finalizing (the semaphore bound)."""
    import threading as _t

    active = []
    overlap = []
    lock = _t.Lock()

    def launch(items):
        with lock:
            active.append(1)
            overlap.append(sum(active))
        return list(items)

    def finalize(handle):
        time.sleep(0.05)
        with lock:
            active.pop()
        return ["ok" for _ in handle]

    mb = MicroBatcher(launch, max_batch=1, max_delay_ms=0.0,
                      finalize=finalize, pipeline_depth=1)
    futs = [mb.submit(i) for i in range(4)]
    assert all(f.result(timeout=10) == "ok" for f in futs)
    mb.shutdown()
    assert max(overlap) == 1  # never two groups in flight


def test_pipelined_finalize_error_fails_only_its_group():
    def launch(items):
        return list(items)

    def finalize(handle):
        if handle[0] == "bad":
            raise RuntimeError("boom in finalize")
        return [f"ok-{x}" for x in handle]

    mb = MicroBatcher(launch, max_batch=1, max_delay_ms=0.0,
                      finalize=finalize, pipeline_depth=2)
    good1 = mb.submit("a")
    bad = mb.submit("bad")
    good2 = mb.submit("b")
    assert good1.result(timeout=10) == "ok-a"
    with pytest.raises(RuntimeError, match="boom in finalize"):
        bad.result(timeout=10)
    assert good2.result(timeout=10) == "ok-b"
    mb.shutdown()
    assert mb.stats()["errors"] == 1


def test_pipelined_launch_error_fails_only_its_group():
    def launch(items):
        if items[0] == "bad":
            raise RuntimeError("boom in launch")
        return list(items)

    def finalize(handle):
        return [f"ok-{x}" for x in handle]

    mb = MicroBatcher(launch, max_batch=1, max_delay_ms=0.0,
                      finalize=finalize, pipeline_depth=2)
    bad = mb.submit("bad")
    good = mb.submit("a")
    with pytest.raises(RuntimeError, match="boom in launch"):
        bad.result(timeout=10)
    assert good.result(timeout=10) == "ok-a"
    mb.shutdown()


def test_inpaint_service_pipelined_end_to_end():
    """InpaintService(pipeline_depth=2) over a LAZY fake predictor: per-row
    results identical to the sync service's contract (row images, keys,
    bucket bookkeeping), warmup works, shutdown drains."""
    calls = []

    def lazy_predictor(arr_batch, key):
        b = arr_batch["image"].shape[0]
        calls.append(b)

        class _Lazy:
            # materializes only under np.asarray — like a jax.Array
            def __array__(self, dtype=None, copy=None):
                out = np.zeros((b, 16, 16, 3), np.float32)
                for i in range(b):
                    out[i] = i / 255.0
                return out

            shape = (b, 16, 16, 3)

        return _Lazy()

    svc = InpaintService(lazy_predictor, max_batch=4, max_delay_ms=100.0,
                         size=16, batch_buckets=(1, 4), pipeline_depth=2)
    svc.warmup()
    reqs = [
        InpaintRequest(
            image=np.full((8, 8, 3), 50, np.uint8),
            mask=np.ones((8, 8), np.uint8),
            text=f"t{i}",
        )
        for i in range(3)
    ]
    futs = [svc.submit(r) for r in reqs]
    results = [f.result(timeout=20) for f in futs]
    svc.shutdown()
    for i, res in enumerate(results):
        assert res["row"] == i
        assert res["batch_size"] == 4
        assert np.all(res["image"] == i)
        assert res["image"].dtype == np.uint8


def test_http_server_roundtrip_pipelined():
    """The HTTP front-end over a PIPELINED service (scripts/serve.py
    --pipeline 2): lazy predictor results materialize on the completion
    thread and still arrive correctly through the handler."""
    from http.server import ThreadingHTTPServer

    serve_mod = _load_serve_module()

    def lazy_predictor(arr_batch, key):
        b = arr_batch["image"].shape[0]

        class _Lazy:
            shape = (b, 16, 16, 3)

            def __array__(self, dtype=None, copy=None):
                out = np.zeros((b, 16, 16, 3), np.float32)
                for i in range(b):
                    out[i] = i / 255.0
                return out

        return _Lazy()

    svc = InpaintService(lazy_predictor, max_batch=2, max_delay_ms=10.0,
                         size=16, pipeline_depth=2)
    ready = threading.Event()
    ready.set()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_mod.make_handler(svc, ready)
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        payload = json.dumps(
            {
                "image": _b64_png(np.full((8, 8, 3), 128, np.uint8)),
                "mask": _b64_png(np.full((8, 8), 255, np.uint8)),
                "text": "ok",
            }
        ).encode()
        req = urllib.request.Request(
            base + "/v1/inpaint", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        assert body["row"] == 0 and body["batch_size"] == 2
    finally:
        httpd.shutdown()
        svc.shutdown()


def test_pipelined_run_stat_is_finalize_time_not_queueing():
    """Under pipelining the `run` stat must report the finalize-stage wall
    time (the capacity number), not launch->completion which would add the
    in-pipeline queueing of earlier groups (observed 45 s for a 15 s model
    call on-chip before this fix)."""
    def launch(items):
        return list(items)

    def finalize(handle):
        time.sleep(0.05)
        return ["ok" for _ in handle]

    mb = MicroBatcher(launch, max_batch=1, max_delay_ms=0.0,
                      finalize=finalize, pipeline_depth=2)
    futs = [mb.submit(i) for i in range(6)]
    assert all(f.result(timeout=10) == "ok" for f in futs)
    st = mb.stats()
    mb.shutdown()
    assert st["batches"] == 6
    # each group's run ~0.05 s; queue-inclusive timing would read ~0.1-0.3 s
    assert 0.04 <= st["run"]["p50_s"] <= 0.09, st["run"]
    assert st["run"]["p95_s"] <= 0.12, st["run"]
