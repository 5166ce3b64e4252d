"""Production serving: request micro-batching around the one-compile predictor.

The reference's only serving surface is the interactive Gradio demo
(/root/reference/demo.py:119-198) — one request, one GPU call. On TPU the
economics are different: the jitted predict pipeline (predict.JittedPredictor)
compiles once per batch-shape signature and the chip is throughput-oriented,
so a production server must (a) coalesce concurrent requests into one
fixed-size batch per dispatch and (b) never present a new shape to XLA.

This module is deliberately JAX-free: the model side is injected as a
callable, so the scheduling logic is unit-testable on any host and reusable
for any batched backend (the flagship inpainting predictor, PARSeq OCR, ...).

Components
----------
- ``MicroBatcher`` — a deadline-based request coalescer. Requests are queued;
  a single dispatcher thread drains up to ``max_batch`` of them (waiting at
  most ``max_delay_ms`` after the first request arrives) and hands the group
  to ``run_batch``. One dispatcher thread == one device stream: TPU dispatch
  is serialized by design, matching the single-chip execution model.
- ``InpaintService`` — stacks inpainting requests into the engine's batch
  dict (demo.py build_batch semantics), pads the batch to a static batch
  size by replicating the last row (static shapes -> a bounded set of XLA
  compiles), runs the predictor, and slices the real rows back out.

Batch-size buckets: padding every group to one ``max_batch`` signature keeps
compiles to exactly one, but makes a lone interactive request pay the full
max_batch dispatch cost. ``batch_buckets`` (e.g. ``(1, 8)``) compiles one
executable per bucket and pads each group only up to the smallest bucket
that fits it — latency-optimal for sparse traffic, throughput-identical
when saturated. Buckets are a latency/compile-count trade: each bucket is
one more one-time XLA compile at startup (warm them via ``warmup()``).

Multi-chip serving: the predictor callable may wrap a ``JittedPredictor``
built over a ``jax.sharding.Mesh`` with a ``data`` axis — GSPMD shards every
presented batch across the chips and the micro-batcher is unchanged (one
dispatcher thread still owns the whole mesh; a sharded dispatch IS one
program launch). ``dp`` declares that degree so bucket divisibility is
validated at construction (scripts/serve.py --dp).

Determinism: every response carries ``batch_key`` (the integer fold-in used
for the batch's PRNG key), ``row`` (the request's position), and
``batch_size`` (the padded bucket the group ran at). Because the sampler
draws the whole batch's noise from one key, a request's output is a
function of (params, batch contents, batch_key, row, batch_size); replaying
those reproduces the image bit-exactly.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


class MicroBatcher:
    """Coalesce concurrent requests into bounded batches for one dispatcher.

    Parameters
    ----------
    run_batch: called with a list of 1..max_batch queued items from the
        dispatcher thread; must return a list of per-item results (same
        order/length). An exception fails every request in the group but
        leaves the batcher serving.
    max_batch: maximum group size (the backend's static batch dimension).
    max_delay_ms: how long the dispatcher waits for co-batchable requests
        after the FIRST request of a group arrives. 0 = dispatch immediately
        with whatever is queued.
    finalize: optional second stage for PIPELINED dispatch. When given,
        ``run_batch(items)`` is the LAUNCH — it should return quickly with an
        in-flight handle (e.g. a lazily-materialized jax.Array: JAX dispatch
        is asynchronous) — and ``finalize(handle)`` materializes it into the
        per-item results on a dedicated completion thread. With
        ``pipeline_depth`` N the dispatcher may launch up to N groups before
        the oldest completes, overlapping host work (batch assembly, wire
        transfer, row slicing, future resolution) with device compute.
        Results still resolve in dispatch order (the completion queue is
        FIFO) and an exception in either stage fails only its own group.
    pipeline_depth: max in-flight groups when ``finalize`` is given.
    """

    def __init__(
        self,
        run_batch: Callable[[List[Any]], Sequence[Any]],
        max_batch: int = 8,
        max_delay_ms: float = 50.0,
        queue_limit: int = 1024,
        finalize: Optional[Callable[[Any], Sequence[Any]]] = None,
        pipeline_depth: int = 2,
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        if finalize is not None and pipeline_depth < 1:
            raise ValueError(f"pipeline_depth must be >= 1, got {pipeline_depth}")
        self._run_batch = run_batch
        self._finalize = finalize
        self.max_batch = int(max_batch)
        self.max_delay = float(max_delay_ms) / 1000.0
        self._queue: "queue.Queue" = queue.Queue(maxsize=queue_limit)
        self._closed = False
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_batches = 0
        self._n_errors = 0
        self._batch_sizes: List[int] = []
        # rolling observability windows (seconds): how long requests sat in
        # the queue before dispatch, and how long each model call took —
        # the two halves of end-to-end latency a capacity planner needs
        self._queue_waits: List[float] = []
        self._run_times: List[float] = []
        self._completion_q: Optional["queue.Queue"] = None
        self._completion_thread: Optional[threading.Thread] = None
        self._inflight: Optional[threading.Semaphore] = None
        if finalize is not None:
            self._inflight = threading.Semaphore(int(pipeline_depth))
            self._completion_q = queue.Queue()
            self._completion_thread = threading.Thread(
                target=self._completion_loop, name="microbatcher-complete",
                daemon=True,
            )
            self._completion_thread.start()
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="microbatcher", daemon=True
        )
        self._thread.start()

    # -- client side --------------------------------------------------------

    def submit(self, item: Any) -> Future:
        """Enqueue one request; resolve its Future with run_batch's result."""
        if self._closed:
            raise RuntimeError("MicroBatcher is shut down")
        fut: Future = Future()
        self._queue.put((item, fut, time.monotonic()))
        if self._closed and not self._thread.is_alive():
            # raced past the closed check after the dispatcher's final drain:
            # nobody will ever pick this up — fail it here instead of hanging
            self._drain_cancelled()
            return fut
        with self._stats_lock:
            self._n_requests += 1
        return fut

    def shutdown(self, timeout: float = 30.0) -> None:
        """Stop accepting requests, drain the queue, join the dispatcher."""
        if self._closed:
            return
        self._closed = True
        self._queue.put(None)  # wake the dispatcher
        self._thread.join(timeout=timeout)
        if self._completion_thread is not None:
            # the dispatcher has exited, so every launched group is already
            # enqueued; the sentinel lands after them (FIFO) and the
            # completion thread drains in order before exiting
            self._completion_q.put(None)
            self._completion_thread.join(timeout=timeout)
        self._drain_cancelled()  # anything that raced in after the final drain

    @staticmethod
    def _pcts(xs: List[float]) -> Dict[str, float]:
        if not xs:
            return {"p50_s": 0.0, "p95_s": 0.0}
        return {
            "p50_s": round(float(np.percentile(xs, 50)), 4),
            "p95_s": round(float(np.percentile(xs, 95)), 4),
        }

    def stats(self) -> Dict[str, Any]:
        with self._stats_lock:
            sizes = list(self._batch_sizes[-100:])
            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "errors": self._n_errors,
                "queue_depth": self._queue.qsize(),
                "mean_batch_size": float(np.mean(sizes)) if sizes else 0.0,
                "max_batch": self.max_batch,
                # rolling windows: queue_wait = enqueue → dispatch (batching
                # delay + head-of-line blocking), run = one model call
                "queue_wait": self._pcts(self._queue_waits),
                "run": self._pcts(self._run_times),
            }

    # -- dispatcher side ----------------------------------------------------

    def _collect_group(self) -> List:
        """Block for the first request, then gather until full or deadline."""
        first = self._queue.get()
        if first is None:
            return []
        group = [first]
        deadline = time.monotonic() + self.max_delay
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # deadline passed — take whatever is already queued, no wait
                try:
                    nxt = self._queue.get_nowait()
                except queue.Empty:
                    break
            else:
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
            if nxt is None:
                # shutdown marker: finish this group, then exit on next loop
                self._queue.put(None)
                break
            group.append(nxt)
        return group

    def _drain_cancelled(self) -> None:
        """After shutdown: fail anything that raced past the closed check."""
        while True:
            try:
                entry = self._queue.get_nowait()
            except queue.Empty:
                return
            if entry is not None:
                entry[1].set_exception(RuntimeError("MicroBatcher is shut down"))

    def _record_group(self, n_items: int, waits: List[float], run_s: float) -> None:
        with self._stats_lock:
            self._n_batches += 1
            self._batch_sizes.append(n_items)
            self._queue_waits.extend(waits)
            self._run_times.append(run_s)
            for buf in (self._batch_sizes, self._queue_waits, self._run_times):
                if len(buf) > 1000:
                    del buf[:-100]

    def _resolve_group(self, futures: List[Future], results: Sequence[Any],
                       n_items: int, waits: List[float], run_s: float) -> None:
        if len(results) != n_items:
            self._fail_group(
                futures,
                RuntimeError(
                    f"run_batch returned {len(results)} results for "
                    f"{n_items} items"
                ),
            )
            return
        self._record_group(n_items, waits, run_s)
        for fut, res in zip(futures, results):
            fut.set_result(res)

    def _fail_group(self, futures: List[Future], e: Exception) -> None:
        with self._stats_lock:
            self._n_errors += len(futures)
        for fut in futures:
            fut.set_exception(e)

    def _completion_loop(self) -> None:
        """Pipelined second stage: materialize handles in dispatch (FIFO)
        order; each group's semaphore slot is released when it completes.

        The recorded ``run`` time is the FINALIZE-stage wall time only: in
        steady state the completion thread blocks on the device inside
        finalize, so this is the per-group capacity number — timing
        launch→completion instead would add the in-pipeline queueing of up
        to ``pipeline_depth`` earlier groups and read N× the model time."""
        while True:
            entry = self._completion_q.get()
            if entry is None:
                return
            handle, futures, n_items, waits, _t_dispatch = entry
            t0 = time.monotonic()
            try:
                try:
                    results = self._finalize(handle)
                except Exception as e:  # noqa: BLE001 — fail only this group
                    self._fail_group(futures, e)
                    continue
                self._resolve_group(futures, results, n_items, waits,
                                    time.monotonic() - t0)
            finally:
                self._inflight.release()

    def _dispatch_loop(self) -> None:
        while True:
            group = self._collect_group()
            if not group:
                self._drain_cancelled()
                return
            items = [item for item, _, _ in group]
            futures = [fut for _, fut, _ in group]
            t_dispatch = time.monotonic()
            waits = [t_dispatch - t_in for _, _, t_in in group]
            if self._finalize is not None:
                # pipelined: bound in-flight groups, launch, hand off
                self._inflight.acquire()
                try:
                    handle = self._run_batch(items)
                except Exception as e:  # noqa: BLE001
                    self._inflight.release()
                    self._fail_group(futures, e)
                    continue
                self._completion_q.put(
                    (handle, futures, len(items), waits, t_dispatch)
                )
                continue
            try:
                results = self._run_batch(items)
            except Exception as e:  # noqa: BLE001 — fail the group, keep serving
                self._fail_group(futures, e)
                continue
            self._resolve_group(futures, results, len(items), waits,
                                time.monotonic() - t_dispatch)


@dataclasses.dataclass
class InpaintRequest:
    """One scene-text inpainting request (demo.py build_batch semantics)."""

    image: np.ndarray  # (H, W, 3) uint8
    mask: np.ndarray  # (H, W) anything truthy where the text goes
    text: str


class InpaintService:
    """Batch assembly + static-shape padding around a predictor callable.

    ``predictor(arr_batch: dict, key: int) -> np.ndarray (bucket, H, W, 3)``
    is injected; in production it wraps ``JittedPredictor.__call__`` with the
    loaded params and a PRNG key derived from ``key`` (see scripts/serve.py).
    Every presented batch is padded (by replicating the last real row) to the
    smallest ``batch_buckets`` entry that fits the group, so the predictor
    traces once per bucket. Default buckets = ``(max_batch,)`` — the strict
    one-compile configuration.
    """

    def __init__(
        self,
        predictor: Callable[[Dict[str, np.ndarray], int], np.ndarray],
        max_batch: int = 8,
        max_delay_ms: float = 50.0,
        size: int = 512,
        seq_len: int = 12,
        batch_buckets: Optional[Sequence[int]] = None,
        dp: int = 1,
        pipeline_depth: int = 1,
    ):
        self.predictor = predictor
        self.size = int(size)
        self.seq_len = int(seq_len)
        self.max_batch = int(max_batch)
        # dp = the predictor's data-parallel degree (JittedPredictor built
        # over a `data` mesh axis shards the batch dim over dp chips; GSPMD
        # requires every presented batch to divide evenly). The service
        # enforces it at construction so a mis-sized bucket fails at startup,
        # not as an opaque sharding error on the first unlucky group.
        self.dp = int(dp)
        if self.dp < 1:
            raise ValueError(f"dp must be >= 1, got {dp}")
        if batch_buckets is None:
            self.batch_buckets = (self.max_batch,)
        else:
            buckets = tuple(sorted({int(b) for b in batch_buckets}))
            if not buckets or buckets[0] < 1:
                raise ValueError(f"batch_buckets must be positive, got {batch_buckets}")
            if buckets[-1] != self.max_batch:
                raise ValueError(
                    f"largest bucket ({buckets[-1]}) must equal max_batch "
                    f"({self.max_batch}) so a full group always fits"
                )
            self.batch_buckets = buckets
        bad = [b for b in self.batch_buckets if b % self.dp != 0]
        if bad:
            raise ValueError(
                f"every batch bucket must be divisible by the data-parallel "
                f"degree dp={self.dp}, got buckets {self.batch_buckets} "
                f"(offending: {bad})"
            )
        self._key_counter = 0
        self._key_lock = threading.Lock()
        # pipeline_depth > 1 splits the model call into launch (asynchronous
        # JAX dispatch: host assembly + host->device transfer of the NEXT
        # group overlap the chip's compute on the current one) and finalize
        # (device->host materialization + row slicing on a completion
        # thread). The predictor callable must then return the images
        # LAZILY (a jax.Array, not np.asarray'd) for the overlap to exist —
        # a predictor that already materializes still works, it just
        # pipelines nothing.
        self.pipeline_depth = int(pipeline_depth)
        if self.pipeline_depth > 1:
            self.batcher = MicroBatcher(
                self._launch_group, max_batch=max_batch,
                max_delay_ms=max_delay_ms, finalize=self._finalize_group,
                pipeline_depth=self.pipeline_depth,
            )
        else:
            self.batcher = MicroBatcher(
                self._run_group, max_batch=max_batch, max_delay_ms=max_delay_ms
            )

    # -- request -> model-batch row ------------------------------------------

    def _build_row(self, req: InpaintRequest) -> Dict[str, np.ndarray]:
        from PIL import Image

        from .charset import encode_label

        if not req.text or len(req.text) > self.seq_len:
            raise ValueError(
                f"text must be 1..{self.seq_len} characters, got {req.text!r}"
            )
        s = self.size
        # uint8 wire format: normalization, binarization, and `masked`
        # synthesis happen INSIDE the jitted program (JittedPredictor's
        # device-side preprocessing — identical math to the previous host
        # path: u8/127.5-1 and mask>0). Over a tunneled device link this is
        # 7x less host->device traffic per group, the dominant serving cost
        # after batching (measured round 5, scripts/serve_bench.py).
        img = np.asarray(
            Image.fromarray(np.asarray(req.image, np.uint8)).resize((s, s)),
            np.uint8,
        )
        mask = np.asarray(
            Image.fromarray((np.asarray(req.mask) > 0).astype(np.uint8) * 255)
            .resize((s, s), Image.NEAREST),
            np.uint8,
        )[..., None]
        seg_mask = np.zeros((self.seq_len,), np.float32)
        seg_mask[: len(req.text)] = 1.0
        return {
            "image": img,
            "mask": mask,
            "seg_mask": seg_mask,
            "label_ids": np.asarray(encode_label(req.text, self.seq_len)),
        }

    def _launch_group(self, rows: List[Dict[str, np.ndarray]]):
        """Stage 1: pad, stack, and dispatch — returns an in-flight handle."""
        n_real = len(rows)
        # pad to the smallest bucket that fits, replicating the last row — XLA
        # sees one static (bucket, ...) signature per configured bucket
        bucket = next(b for b in self.batch_buckets if b >= n_real)
        rows = list(rows)
        while len(rows) < bucket:
            rows.append(rows[-1])
        arr_batch = {
            k: np.stack([row[k] for row in rows]) for k in rows[0]
        }
        with self._key_lock:
            key = self._key_counter
            self._key_counter += 1
        return self.predictor(arr_batch, key), key, bucket, n_real

    def _finalize_group(self, handle) -> List[Dict[str, Any]]:
        """Stage 2: materialize the images and slice the real rows out."""
        images_lazy, key, bucket, n_real = handle
        images = np.asarray(images_lazy)
        if images.shape[0] != bucket:
            raise RuntimeError(
                f"predictor returned batch {images.shape[0]}, expected {bucket}"
            )
        if images.dtype != np.uint8:  # float [0,1] from a non-uint8 predictor
            images = (np.clip(images, 0.0, 1.0) * 255).astype(np.uint8)
        return [
            {
                # .copy(): a row VIEW would pin the whole (bucket, H, W, 3)
                # batch array for as long as any client retains one image
                "image": images[i].copy(),
                "batch_key": key,
                "row": i,
                "batch_size": bucket,
            }
            for i in range(n_real)
        ]

    def _run_group(self, rows: List[Dict[str, np.ndarray]]) -> List[Dict[str, Any]]:
        return self._finalize_group(self._launch_group(rows))

    def warmup(self) -> None:
        """Compile every bucket's executable before serving traffic.

        Runs one dummy group per configured bucket straight through
        ``_run_group`` (bypassing the batcher, so bucket selection is
        deterministic rather than timing-dependent). Call before flipping
        the health check to ready."""
        dummy = self._build_row(
            InpaintRequest(
                image=np.zeros((self.size, self.size, 3), np.uint8),
                mask=np.ones((self.size, self.size), np.uint8),
                text="w",
            )
        )
        for b in self.batch_buckets:
            self._run_group([dummy] * b)

    # -- public API -----------------------------------------------------------

    def submit(self, req: InpaintRequest) -> Future:
        # build (and validate) the row HERE, on the caller's thread: an
        # invalid request fails synchronously instead of poisoning the whole
        # co-batched group inside the dispatcher
        return self.batcher.submit(self._build_row(req))

    def inpaint(self, req: InpaintRequest, timeout: Optional[float] = None):
        return self.submit(req).result(timeout=timeout)

    def stats(self) -> Dict[str, Any]:
        return self.batcher.stats()

    def shutdown(self) -> None:
        self.batcher.shutdown()
