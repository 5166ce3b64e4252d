"""Block-size sweep for the fused GEGLU kernel (ops/geglu.py).

The ds1 FF (B=32 CFG-doubled, N=4096, C=320, I=1280) is 322 GFLOP — a
1.94 ms floor at the 166 TF/s measured matmul ceiling, vs 3.78 ms shipped
(85 TF/s). This sweeps (block_n, chunk) against that shape with the
scan-inside-one-jit methodology from ROOFLINE.md (the axon tunnel adds
~24 ms per dispatch; only slopes are trustworthy).

Usage: python scripts/geglu_sweep.py [K=20]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed_scan(fn, args, k: int) -> float:
    """Seconds per call via K-repetition scan inside one jit."""

    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*c[1:])
            # chain a data dependency through the carry so the scan can't be
            # collapsed; keep the scalar on-device until the final float()
            return (c[0] + jnp.sum(out.astype(jnp.float32)) * 1e-30, *c[1:]), None

        (acc, *_), _ = jax.lax.scan(body, (jnp.zeros(()), *args), None, length=k)
        return acc

    float(run(args))  # compile + warmup
    t0 = time.perf_counter()
    float(run(args))
    return (time.perf_counter() - t0) / k


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from udifftext_tpu.ops import geglu as G

    B, N, C, I = 32, 4096, 320, 1280  # ds1 FF at bench B=16 (CFG-doubled)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    w1 = jax.random.normal(key, (C, 2 * I), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((2 * I,), jnp.bfloat16)
    w2 = jax.random.normal(key, (I, C), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((C,), jnp.bfloat16)

    flops = 2 * B * N * (C * 2 * I + I * C)
    print(f"shape B={B} N={N} C={C} I={I}: {flops/1e9:.0f} GFLOP "
          f"(floor {flops/166e12*1e3:.2f} ms at 166 TF/s)")

    t_ref = timed_scan(lambda *a: G._geglu_ref(*a), (x, w1, b1, w2, b2), k)
    print(f"XLA reference: {t_ref*1e3:7.2f} ms  {flops/t_ref/1e12:6.1f} TF/s")

    results = []
    for block_n in (256, 512, 1024, 2048):
        for chunk in (160, 320, 640, 1280):
            if I % chunk:
                continue
            try:
                # use the raw (un-jitted) impl: the module-level jit caches by
                # (shapes, block_n) and would ignore the patched chunk picker
                raw = getattr(G._geglu_fwd_impl, "__wrapped__", G._geglu_fwd_impl)
                fwd = functools.partial(raw, block_n=block_n)
                # force the chunk by monkey-patching the picker for the sweep
                orig = G._pick_chunk
                G._pick_chunk = lambda *a, _c=chunk: _c
                try:
                    t = timed_scan(lambda *a: fwd(*a), (x, w1, b1, w2, b2), k)
                finally:
                    G._pick_chunk = orig
                results.append((t, block_n, chunk))
                print(f"block_n={block_n:4d} chunk={chunk:4d}: {t*1e3:7.2f} ms "
                      f"{flops/t/1e12:6.1f} TF/s")
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                print(f"block_n={block_n:4d} chunk={chunk:4d}: FAILED {type(e).__name__}: {e}")
    if results:
        t, bn, c = min(results)
        print(f"\nbest: block_n={bn} chunk={c} at {t*1e3:.2f} ms "
              f"({flops/t/1e12:.1f} TF/s) vs shipped default "
              f"(block_n=512, auto chunk)")


if __name__ == "__main__":
    main()
