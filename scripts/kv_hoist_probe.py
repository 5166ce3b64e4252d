"""Measure the cross-attn K/V hoist (models/unet.precompute_context_kv).

Round-3 verdict #2/#3: the sampling scan recomputed every layer's to_k/to_v
projection of the CONSTANT 12-token context 50x per sample. This probe
quantifies the win at two levels:

1. one ds1 CrossAttention residual (LN + attn) with inline vs hoisted K/V —
   the per-layer delta;
2. the full flagship UNet CFG step inside a lax.scan (the real sampling
   body) with ctx_kv=None vs hoisted — the per-step delta that reaches
   bench.py.

Methodology per ROOFLINE.md: K scanned reps in one jit, float(sum) closes
the window, ~24 ms fixed dispatch subtracted.

Usage: python scripts/kv_hoist_probe.py [batch=16] [K=20]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _zeros_params, cast_params_bf16  # noqa: E402

C = 320
HEADS = 5
DIM_HEAD = 64
N = 64 * 64
CTX_DIM = 2048
L = 12


def timed(fn, init, K, label):
    @jax.jit
    def run(c0):
        def body(c, _):
            return fn(c), None

        c, _ = jax.lax.scan(body, c0, None, length=K)
        return jnp.sum(c.astype(jnp.float32))

    float(run(init))
    t0 = time.perf_counter()
    float(run(init))
    dt = (time.perf_counter() - t0 - 0.024) / K
    print(f"{label:52s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    b2 = 2 * b

    from udifftext_tpu.models.attention import CrossAttention, LayerNormF32
    from udifftext_tpu.models.unet import UNetModel, precompute_context_kv

    # -- 1. single ds1 cross-attn residual -----------------------------------
    ca = CrossAttention(HEADS, DIM_HEAD, dtype=jnp.bfloat16)
    ln = LayerNormF32(dtype=jnp.bfloat16)
    x = jnp.zeros((b2, N, C), jnp.bfloat16)
    ctx = jnp.zeros((b2, L, CTX_DIM), jnp.bfloat16)
    cap = cast_params_bf16(_zeros_params(ca, x, ctx))
    lnp = _zeros_params(ln, x)

    kern_k = cap["params"]["to_k"]["Dense_0"]["kernel"]
    kern_v = cap["params"]["to_v"]["Dense_0"]["kernel"]
    k_pre = jnp.matmul(ctx, kern_k).reshape(b2, L, HEADS, DIM_HEAD)
    v_pre = jnp.matmul(ctx, kern_v).reshape(b2, L, HEADS, DIM_HEAD)

    def inline(c):
        out, _ = ca.apply(cap, ln.apply(lnp, c), ctx)
        return c + out

    def hoisted(c):
        out, _ = ca.apply(cap, ln.apply(lnp, c), ctx, kv=(k_pre, v_pre))
        return c + out

    t_in = timed(inline, x, K, f"ds1 cross-attn residual, inline K/V (B={b2})")
    t_ho = timed(hoisted, x, K, f"ds1 cross-attn residual, hoisted K/V (B={b2})")
    print(f"  per-layer delta: {(t_in - t_ho) * 1e3:+.3f} ms x16 layers "
          f"= {(t_in - t_ho) * 16 * 1e3:+.2f} ms/step\n")

    # -- 2. full UNet CFG step in a scan --------------------------------------
    unet = UNetModel(dtype=jnp.bfloat16)
    params = cast_params_bf16(_zeros_params(
        unet, jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)), jnp.zeros((1, L, CTX_DIM))
    ))
    xin = jnp.zeros((b2, 64, 64, 4), jnp.bfloat16)
    concat = jnp.zeros((b2, 64, 64, 5), jnp.bfloat16)
    tctx = jnp.zeros((b2, L, CTX_DIM), jnp.bfloat16)
    ts = jnp.full((b2,), 500.0)
    kv = precompute_context_kv(unet, params, tctx)

    def step_inline(c):
        out, _ = unet.apply(params, jnp.concatenate([c, concat], -1), ts, tctx)
        return c + out.astype(c.dtype)

    def step_hoisted(c):
        out, _ = unet.apply(params, jnp.concatenate([c, concat], -1), ts, tctx,
                            ctx_kv=kv)
        return c + out.astype(c.dtype)

    t0 = timed(step_inline, xin, K, f"UNet CFG step, inline K/V (B={b2})")
    t1 = timed(step_hoisted, xin, K, f"UNet CFG step, hoisted K/V (B={b2})")
    print(f"  per-step delta: {(t0 - t1) * 1e3:+.2f} ms "
          f"({(t0 - t1) / t0 * 100:+.1f}%) -> x50 steps = "
          f"{(t0 - t1) * 50:+.3f} s/batch-{b}")


if __name__ == "__main__":
    main()
