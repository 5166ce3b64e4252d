"""Tracing / profiling utilities.

Parity: the reference enables Lightning's `profiler: simple`
(configs/train.yaml:24) — a per-hook wall-time table printed at teardown —
and uses torch.utils.benchmark for one-shot latency (src/parseq/bench.py).
TPU-native equivalents:
  - SimpleProfiler: named-section wall-time accumulator with a summary table.
  - trace(): context manager around `jax.profiler` emitting a TensorBoard-
    compatible trace directory.
  - flops_of(): XLA cost analysis of a jitted function (FLOPs/bytes).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Optional

import jax


class SimpleProfiler:
    """Accumulates wall time per named section; prints a summary table."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def profile(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        width = max([len(k) for k, _ in rows] + [8])
        lines = [
            f"{'section'.ljust(width)}  {'total s':>10}  {'count':>8}  {'mean ms':>10}"
        ]
        for name, total in rows:
            n = self.counts[name]
            lines.append(
                f"{name.ljust(width)}  {total:10.3f}  {n:8d}  {total / n * 1e3:10.2f}"
            )
        return "\n".join(lines)

    def print_summary(self):
        print("\n== profiler summary ==")
        print(self.summary())


@contextlib.contextmanager
def trace(logdir: str = "./logs/trace"):
    """jax.profiler trace context (viewable with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def flops_of(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """XLA cost analysis for a jitted callable on example args."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    comp = jitted.lower(*args, **kwargs).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }


def enable_persistent_cache(path: str = "/root/repo/.jax_cache",
                            min_compile_secs: float = 5.0) -> None:
    """Persistent XLA compilation cache (compiles of the 512² pipeline cost
    ~5-25 min through the axon tunnel; cached reloads are seconds). Safe to
    call multiple times; no-op if the config is unavailable."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
