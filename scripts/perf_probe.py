"""Perf probe: per-stage timings + XLA cost analysis of the bench pipeline.

Times each stage as a scan of K repetitions inside ONE jit dispatch (the axon
tunnel costs 150-300 ms per dispatch, so per-op timing outside jit is
meaningless — PROGRESS.md round-1 measurement trap).

Usage: python scripts/perf_probe.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _zeros_params, cast_params_bf16  # noqa: E402


def timed(fn, *args, iters=1, warmup=True, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.models.vae import AutoencoderKL

    unet = UNetModel(dtype=jnp.bfloat16)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    unet_params = cast_params_bf16(
        _zeros_params(unet, jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)), jnp.zeros((1, 12, 2048)))
    )
    vae_params = _zeros_params(vae, jnp.zeros((1, 512, 512, 3)))

    b2 = 2 * b
    x9 = jnp.zeros((b2, 64, 64, 9), jnp.bfloat16)
    tn = jnp.zeros((b2,), jnp.float32)
    ctx = jnp.zeros((b2, 12, 2048), jnp.bfloat16)
    z = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)

    K = 10

    @jax.jit
    def unet_k(x9, tn, ctx):
        def body(c, _):
            out, _ = unet.apply(unet_params, c, tn, ctx)
            out9 = jnp.concatenate([out, out, out[..., :1]], axis=-1)
            return out9.astype(c.dtype), None

        out, _ = jax.lax.scan(body, x9, None, length=K)
        return out

    dt = timed(unet_k, x9, tn, ctx, iters=K, label=f"UNet CFG eval (B={b2})")
    # FLOP estimate via cost analysis
    comp = jax.jit(lambda a, t, c: unet.apply(unet_params, a, t, c)[0]).lower(x9, tn, ctx).compile()
    ca = comp.cost_analysis()
    if ca:
        fl = ca.get("flops", 0)
        byt = ca.get("bytes accessed", 0)
        print(f"  unet eval: {fl/1e12:.2f} TFLOP, {byt/1e9:.1f} GB accessed"
              f" -> {fl/dt/1e12:.1f} TF/s, {byt/dt/1e9:.0f} GB/s")

    @jax.jit
    def vae_k(z):
        def body(c, _):
            img = vae.apply(vae_params, c / 0.18215, method=AutoencoderKL.decode)
            return (c + img[:, :64, :64, :1].astype(c.dtype) * 0).astype(c.dtype), img

        _, imgs = jax.lax.scan(body, z, None, length=3)
        return imgs

    timed(vae_k, z, iters=3, label=f"VAE decode (B={b})")
    compv = jax.jit(
        lambda zz: vae.apply(vae_params, zz / 0.18215, method=AutoencoderKL.decode)
    ).lower(z).compile()
    cav = compv.cost_analysis()
    if cav:
        print(f"  vae decode: {cav.get('flops',0)/1e12:.2f} TFLOP, "
              f"{cav.get('bytes accessed',0)/1e9:.1f} GB accessed")

    # attention layer in isolation: 4096 tokens, 5 heads, d=64 (ds1 layer)
    from udifftext_tpu.ops import sdpa

    for n, h, d in ((4096, 5, 64), (1024, 10, 64), (256, 20, 64)):
        q = jnp.zeros((b2, n, h, d), jnp.bfloat16)

        for impl in ("flash", "xla"):
            @jax.jit
            def att_k(q, _impl=impl):
                def body(c, _):
                    o = sdpa(c, c, c, impl=_impl)
                    return o, None

                o, _ = jax.lax.scan(body, q, None, length=K)
                return o

            timed(att_k, q, iters=K, label=f"self-attn {impl} N={n} H={h}")

    # full bench pipeline cost analysis. NOTE: cost_analysis counts each
    # lax.scan body ONCE (the 50-step loop reports ~64 TFLOP; the executed
    # total is 50×unet + vae ≈ 1242 TFLOP at B=16).
    from bench import build

    sample = build(b)
    ca = sample.lower(jax.random.PRNGKey(0)).compile().cost_analysis()
    if ca:
        print(f"pipeline (scan bodies counted once): {ca.get('flops',0)/1e12:.1f} TFLOP, "
              f"{ca.get('bytes accessed',0)/1e9:.1f} GB accessed")

    # warmup first (a cold call times tracing + compile-cache load, not the
    # chip — measured 14.0 s cold vs 9.2 s warm at B=16), and end the timed
    # region in a float() of an on-device scalar (ROOFLINE.md traps).
    run = jax.jit(lambda r: jnp.sum(sample(r)))
    float(run(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    flops = 50 * 24.05e12 * b / 16 + 40.0e12 * b / 16
    print(f"pipeline run (warm): {dt:.2f} s -> {b/dt:.3f} samples/s | "
          f"~{flops/dt/1e12:.0f} TF/s sustained")


if __name__ == "__main__":
    main()
