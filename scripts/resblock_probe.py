"""ResBlock composition probe: where the 144-vs-177 TF/s gap lives.

conv3x3 alone runs ~177 TF/s (ROOFLINE.md) but the composed ResBlock ~144.
This probe times the shipped op sequence and substitutions at the ds1 shape
(B=32 CFG-doubled, 64x64, 320ch, bf16), K-scans inside one jit.

Usage: python scripts/resblock_probe.py [batch=32] [channels=320]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(body, init_carry, label, K=20):
    @jax.jit
    def run():
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), init_carry, None, length=K)
        return jnp.sum(c.astype(jnp.float32))

    float(run())
    t0 = time.perf_counter()
    float(run())
    dt = (time.perf_counter() - t0) / K
    print(f"{label:52s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    hw = 64
    dt = jnp.bfloat16

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, hw, hw, c) * 0.5, dt)
    w1 = jnp.asarray(rng.randn(3, 3, c, c) * 0.02, dt)
    w2 = jnp.asarray(rng.randn(3, 3, c, c) * 0.02, dt)
    emb = jnp.asarray(rng.randn(b, c) * 0.5, dt)
    gscale = jnp.ones((c,), jnp.float32)
    gbias = jnp.zeros((c,), jnp.float32)

    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def gn_xla(h):
        # the models' fusion-friendly two-pass GroupNorm32 (fp32 stats)
        g = 32
        hg = h.reshape(b, -1, g, c // g).astype(jnp.float32)
        mean = hg.mean(axis=(1, 3), keepdims=True)
        var = (hg * hg).mean(axis=(1, 3), keepdims=True) - mean * mean
        y = (hg - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y.reshape(h.shape) * gscale + gbias
        return y.astype(h.dtype)

    def silu(h):
        return h * jax.nn.sigmoid(h.astype(jnp.float32)).astype(h.dtype)

    # 1. convs only — the floor
    timed_scan(lambda h: conv(conv(h, w1), w2).astype(dt), x, "2x conv3x3 only")

    # 2. shipped sequence: GN+SiLU -> conv -> +emb -> GN+SiLU -> conv -> +x
    def resblock_xla(h):
        y = silu(gn_xla(h))
        y = conv(y, w1)
        y = y + emb[:, None, None, :]
        y = silu(gn_xla(y))
        y = conv(y, w2)
        return (h + y).astype(dt)

    timed_scan(resblock_xla, x, "ResBlock, XLA GN32+SiLU")

    # 3. Pallas fused GN+SiLU substituted
    from udifftext_tpu.ops.groupnorm import fused_groupnorm_silu

    def resblock_pallas(h):
        y = fused_groupnorm_silu(h, gscale, gbias)
        y = conv(y, w1)
        y = y + emb[:, None, None, :]
        y = fused_groupnorm_silu(y, gscale, gbias)
        y = conv(y, w2)
        return (h + y).astype(dt)

    timed_scan(resblock_pallas, x, "ResBlock, Pallas fused GN+SiLU")

    # 4. the glue alone
    timed_scan(lambda h: silu(gn_xla(h)).astype(dt), x, "GN32+SiLU alone, XLA")
    timed_scan(lambda h: fused_groupnorm_silu(h, gscale, gbias).astype(dt), x,
               "GN32+SiLU alone, Pallas")

    # correctness cross-check (loose: bf16)
    a = silu(gn_xla(x))
    p = fused_groupnorm_silu(x, gscale, gbias)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - p.astype(jnp.float32))))
    print(f"max |XLA - Pallas| GN+SiLU: {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
