"""Transformer-glue fusion experiments (round-4 verdict item 1).

The round-4 roofline attributed the +17.7 ms/step transformer-glue residual
to lane-occupancy structure on the C=320/640 GEMMs (three separate 320-wide
q/k/v projections = 2.5 of 128 MXU output lanes each) plus LayerNorm HBM
bytes — but that re-pricing was analytic. This probe measures the standard
remedies directly, at the exact shapes the sampling scan runs:

  A. self-attn q/k/v: 3 separate GEMMs vs one fused (C, 3C) GEMM
     (models/attention.py fuse_qkv flag; the measured outcome shipped the
     SEPARATE GEMMs — see ROOFLINE.md round 5)
  B. the full BasicTransformerBlock with fuse_qkv on/off
  C. LayerNorm alone (the bytes the "LN fusion" idea could save)
  D. bare GEMM shapes: (N,320)x(320,320) x3 vs (N,320)x(320,960)

Methodology per ROOFLINE.md: K scanned reps inside ONE jit, float() closes
the window, 24 ms fixed dispatch subtracted, quiet chip, warm second run.

Usage: python scripts/glue_fusion_probe.py [batch=16] [K=20]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _zeros_params, cast_params_bf16  # noqa: E402

CTX_DIM = 2048
L = 12
DIM_HEAD = 64

SHAPES = [  # (name, side, C) — ds1 and ds2 carry the residual
    ("ds1", 64, 320),
    ("ds2", 32, 640),
]


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
    print(f"{label:58s} {dt * 1e3:8.3f} ms", flush=True)
    return dt * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    b2 = 2 * b

    from udifftext_tpu.models.attention import (
        BasicTransformerBlock, LayerNormF32, SelfAttention,
    )

    tctx = jnp.zeros((b2, L, CTX_DIM), jnp.bfloat16)

    for name, side, c in SHAPES:
        n = side * side
        heads = c // DIM_HEAD
        x = jnp.zeros((b2, n, c), jnp.bfloat16)
        print(f"\n== {name}: (B={b2}, N={n}, C={c}) ==")

        # D. bare GEMMs
        w1 = jnp.zeros((c, c), jnp.bfloat16)
        w3 = jnp.zeros((c, 3 * c), jnp.bfloat16)

        def gemm3(h, _w=w1):
            q = jnp.matmul(h, _w)
            k = jnp.matmul(h, _w)
            v = jnp.matmul(h, _w)
            return q + k + v  # keep all three live

        def gemm_fused(h, _w=w3):
            qkv = jnp.matmul(h, _w)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return q + k + v

        t3 = timed(gemm3, x, K, f"D. 3x separate ({c}->{c}) GEMMs")
        tf = timed(gemm_fused, x, K, f"D. 1x fused ({c}->{3 * c}) GEMM")

        # C. LayerNorm alone
        ln = LayerNormF32(dtype=jnp.bfloat16)
        lp = ln.init(jax.random.PRNGKey(0), x)

        def ln_only(h, _lp=lp, _ln=ln):
            return _ln.apply(_lp, h)

        timed(ln_only, x, K, "C. LayerNormF32 (fp32 stats) alone")

        # F. LN+GEMM: XLA (LN then fused qkv GEMM) vs the Pallas ln_gemm
        # kernel that keeps the normalized block in VMEM
        from udifftext_tpu.ops.ln_gemm import ln_gemm, ln_gemm_supported

        assert ln_gemm_supported(x, w3), (x.shape, w3.shape)

        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)

        def ln_then_gemm(h, _w=w3, _ln=ln, _lp=lp):
            q, k_, v_ = jnp.split(jnp.matmul(_ln.apply(_lp, h), _w), 3, axis=-1)
            return q + k_ + v_  # carry keeps the input shape for the scan

        def ln_gemm_fused(h, _w=w3, _sc=sc, _bi=bi):
            q, k_, v_ = jnp.split(ln_gemm(h, _sc, _bi, _w), 3, axis=-1)
            return q + k_ + v_

        timed(ln_then_gemm, x, K, f"F. XLA LN -> fused ({c}->{3 * c}) GEMM")
        timed(ln_gemm_fused, x, K, f"F. Pallas ln_gemm ({c}->{3 * c})")

        # F'. the 3-compact-output variant actually shipped (ln_gemm3):
        # includes the strided-split avoidance that the single-output
        # fused GEMM lacks
        from udifftext_tpu.ops.ln_gemm import ln_gemm3

        def ln_gemm3_run(h, _w=w1, _sc=sc, _bi=bi):
            q, k_, v_ = ln_gemm3(h, _sc, _bi, _w, _w, _w)
            return q + k_ + v_

        timed(ln_gemm3_run, x, K, f"F. Pallas ln_gemm3 (3x {c}->{c} compact)")

        # A. SelfAttention fused vs unfused
        for fuse in (False, True):
            sa = SelfAttention(heads=heads, dim_head=DIM_HEAD,
                               dtype=jnp.bfloat16, fuse_qkv=fuse)
            sp = cast_params_bf16(_zeros_params(sa, x))

            def attn(h, _sa=sa, _sp=sp):
                return _sa.apply(_sp, h)

            timed(attn, x, K, f"A. SelfAttention fuse_qkv={fuse}")

        # E. cross-attention alone (hoisted K/V): LN + q proj + 12-token
        # sim/softmax + out proj — all HBM-bound glue, a Pallas fusion
        # candidate (everything but x itself fits VMEM)
        from udifftext_tpu.models.attention import CrossAttention

        ca = CrossAttention(heads=heads, dim_head=DIM_HEAD, dtype=jnp.bfloat16)
        cp = cast_params_bf16(_zeros_params(ca, x, tctx))
        ck = cp["params"]["to_k"]["Dense_0"]["kernel"]
        cv = cp["params"]["to_v"]["Dense_0"]["kernel"]
        k_pre = jnp.matmul(tctx, ck).reshape(b2, L, heads, DIM_HEAD)
        v_pre = jnp.matmul(tctx, cv).reshape(b2, L, heads, DIM_HEAD)

        def cross(h, _ca=ca, _cp=cp, _kv=(k_pre, v_pre), _ln=ln, _lp=lp):
            out, _ = _ca.apply(_cp, _ln.apply(_lp, h), tctx, False, kv=_kv)
            return out + h

        timed(cross, x, K, "E. LN + CrossAttention (hoisted KV) + residual")

        # G. the fully fused Pallas t_attn branch: LN + q proj + 12-token
        # attention + out proj + residual in one kernel (ops/cross_attention)
        from udifftext_tpu.ops.cross_attention import fused_cross_attention

        ln_s = jnp.ones((c,), jnp.float32)
        ln_b = jnp.zeros((c,), jnp.float32)
        wq = cp["params"]["to_q"]["Dense_0"]["kernel"]
        wo = cp["params"]["to_out"]["Dense_0"]["kernel"]
        bo = cp["params"]["to_out"]["Dense_0"]["bias"]

        def cross_fused(h, _kv=(k_pre, v_pre)):
            return fused_cross_attention(
                h, ln_s, ln_b, wq, _kv[0], _kv[1], wo, bo, heads
            )

        timed(cross_fused, x, K, "G. Pallas fused t_attn branch (LN+q+attn+out+res)")

        # B. full BasicTransformerBlock (self + cross + GEGLU), hoisted K/V:
        # (qkv-fusion, LN-glue-fusion) = (off, off) -> (on, off) -> (on, on)
        for fuse, glue in ((False, "off"), (True, "off"), (True, "auto")):
            blk = BasicTransformerBlock(heads=heads, dim_head=DIM_HEAD,
                                        t_context_dim=CTX_DIM,
                                        dtype=jnp.bfloat16, fuse_qkv=fuse,
                                        fuse_glue=glue)
            bp = cast_params_bf16(_zeros_params(blk, x, tctx))
            pk = bp["params"]["t_attn"]
            kk = pk["to_k"]["Dense_0"]["kernel"]
            vv = pk["to_v"]["Dense_0"]["kernel"]
            kv = {"t": (jnp.matmul(tctx, kk).reshape(b2, L, heads, DIM_HEAD),
                        jnp.matmul(tctx, vv).reshape(b2, L, heads, DIM_HEAD))}

            def block(h, _blk=blk, _bp=bp, _kv=kv):
                out, _ = _blk.apply(_bp, h, tctx, None, False, _kv)
                return out

            timed(block, x, K,
                  f"B. BasicTransformerBlock qkv={fuse} glue={glue} (hoisted KV)")

        print(f"   fused-qkv GEMM saving at this shape: {t3 - tf:+.3f} ms "
              f"(x{5 if name in ('ds1', 'ds2') else 1} layers/step)")


if __name__ == "__main__":
    main()
