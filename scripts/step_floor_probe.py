"""Measured-vs-floor table for the CURRENT shipped UNet step configuration.

Round-3 verdict item 3: itemize the residual between the measured step time
and the all-at-floor step (~162 ms round-3 estimate). This probe times every
structural bucket of the flagship CFG step at the shipped kernels (flash v4
attention, fused GEGLU, hoisted cross-attn K/V) and prints the table that
ROOFLINE.md's round-4 section records:

  bucket                     measured   floor   basis
  ds1 transformer layer x5   ...        ...     attn core at the 109.7 TF/s
                                                d=64 structural ceiling, GEMMs
                                                at 166, GEGLU at 117 (C=320)
  ds2/ds4/mid layers         ...        ...     analytic FLOPs at per-op ceilings
  ResBlocks + glue           step - sum(attn)   conv floor (round-3 resblock_probe:
                                                composed block == bare-conv time)

Methodology per ROOFLINE.md: K scanned reps inside ONE jit, float(sum) closes
the window, ~24 ms fixed dispatch subtracted, quiet chip.

Usage: python scripts/step_floor_probe.py [batch=16] [K=20]
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

# measured structural ceilings (ROOFLINE.md rounds 2-3), TF/s
CEIL_GEMM = 166e12        # 8K^3 bf16 matmul, slope method
CEIL_ATTN = 109.7e12      # flash v4 at head_dim 64 (50% systolic depth)
CEIL_GEGLU_320 = 117e12   # C=320 = 2.5x128 lanes (geglu_sweep round 3)

# (name, count, side, C) for the flagship plan: model_channels 320,
# channel_mult (1,2,4,4), num_res_blocks 2, attn at ds(1,2,4) + middle
LAYERS = [
    ("ds1", 5, 64, 320),
    ("ds2", 5, 32, 640),
    ("ds4", 5, 16, 1280),
    ("mid", 1, 8, 1280),
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
    print(f"{label:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def layer_floor_ms(b2: int, side: int, c: int) -> float:
    """Analytic floor of one SpatialTransformer layer: attention core at the
    d=64 structural ceiling, everything GEMM-shaped at the measured matmul
    ceiling (GEGLU at its C=320 lane-occupancy ceiling for ds1)."""
    n = side * side
    core = b2 * (4.0 * n * n * c)                     # q.kT + p.v
    cross_core = b2 * (4.0 * n * L * c)
    qkvo = b2 * (8.0 * n * c * c)                     # self qkv + out
    cross_qo = b2 * (4.0 * n * c * c)                 # cross q + out (k/v hoisted)
    proj = b2 * (4.0 * n * c * c)                     # proj_in + proj_out
    geglu = b2 * (24.0 * n * c * c)
    geglu_ceil = CEIL_GEGLU_320 if c == 320 else CEIL_GEMM
    sec = (
        core / CEIL_ATTN
        + (cross_core + qkvo + cross_qo + proj) / CEIL_GEMM
        + geglu / geglu_ceil
    )
    return sec * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    b2 = 2 * b

    from udifftext_tpu.models.attention import SpatialTransformer
    from udifftext_tpu.models.unet import UNetModel, precompute_context_kv

    tctx = jnp.zeros((b2, L, CTX_DIM), jnp.bfloat16)
    total_layers_ms = 0.0
    floor_layers_ms = 0.0
    rows = []
    for name, count, side, c in LAYERS:
        heads = c // DIM_HEAD
        st = SpatialTransformer(
            heads=heads, dim_head=DIM_HEAD, depth=1,
            t_context_dim=CTX_DIM, dtype=jnp.bfloat16,
        )
        x = jnp.zeros((b2, side, side, c), jnp.bfloat16)
        sp = cast_params_bf16(_zeros_params(st, x, tctx))

        # hoisted cross-attn K/V, exactly as the sampling scan sees it
        p = sp["params"]["blocks_0"]["t_attn"]
        kk = p["to_k"]["Dense_0"]["kernel"]
        vv = p["to_v"]["Dense_0"]["kernel"]
        k_pre = jnp.matmul(tctx, kk).reshape(b2, L, heads, DIM_HEAD)
        v_pre = jnp.matmul(tctx, vv).reshape(b2, L, heads, DIM_HEAD)
        kv = [{"t": (k_pre, v_pre)}]

        def layer(h, _st=st, _sp=sp, _kv=kv):
            out, _ = _st.apply(_sp, h, tctx, None, False, _kv)
            return out

        dt = timed(layer, x, K, f"{name} transformer layer (B={b2}, {side}^2x{c})")
        fl = layer_floor_ms(b2, side, c)
        rows.append((name, count, dt * 1e3, fl))
        total_layers_ms += dt * 1e3 * count
        floor_layers_ms += fl * count

    # whole CFG step with hoisted K/V (the sampling-scan body)
    unet = UNetModel(dtype=jnp.bfloat16)
    params = cast_params_bf16(_zeros_params(
        unet, jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)), jnp.zeros((1, L, CTX_DIM))
    ))
    xin = jnp.zeros((b2, 64, 64, 4), jnp.bfloat16)
    concat = jnp.zeros((b2, 64, 64, 5), jnp.bfloat16)
    ts = jnp.full((b2,), 500.0)
    kv_full = precompute_context_kv(unet, params, tctx)

    def step(cur):
        out, _ = unet.apply(params, jnp.concatenate([cur, concat], -1), ts, tctx,
                            ctx_kv=kv_full)
        return cur + out.astype(cur.dtype)

    t_step = timed(step, xin, K, f"full UNet CFG step, hoisted K/V (B={b2})") * 1e3

    # residual bucket = ResBlocks + up/down + io + time-emb + skip concats.
    # Analytic conv FLOPs of the plan at the measured 166 TF/s GEMM ceiling
    # (round-3 resblock_probe: the composed ResBlock runs AT the bare-conv
    # time, so its floor IS its conv cost).
    res_ms = t_step - total_layers_ms
    # conv cost of all 22 ResBlocks + 3 down + 3 up + in/out convs
    def conv_flops(s, cin, cout, k=3):
        return b2 * 2.0 * s * s * k * k * cin * cout

    fl = 0.0
    # input blocks
    fl += 2 * conv_flops(64, 320, 320) * 2            # lvl0: 2 res (2 convs each)
    fl += conv_flops(32, 320, 320)                    # down1
    fl += conv_flops(32, 320, 640) + conv_flops(32, 640, 640)      # lvl1 res1
    fl += 2 * conv_flops(32, 640, 640)                # lvl1 res2
    fl += conv_flops(16, 640, 640)                    # down2
    fl += conv_flops(16, 640, 1280) + conv_flops(16, 1280, 1280)   # lvl2 res1
    fl += 2 * conv_flops(16, 1280, 1280)              # lvl2 res2
    fl += conv_flops(8, 1280, 1280)                   # down3
    fl += 2 * 2 * conv_flops(8, 1280, 1280)           # lvl3: 2 res
    fl += 2 * 2 * conv_flops(8, 1280, 1280)           # middle: 2 res
    # output blocks (skip-concat widens conv1 input)
    for s, cin_base, cout, skips in (
        (8, 1280, 1280, (2560, 2560, 2560)),
        (16, 1280, 1280, (2560, 2560, 1920)),
        (32, 640, 640, (1920, 1280, 960)),
        (64, 320, 320, (960, 640, 640)),
    ):
        for cin in skips:
            fl += conv_flops(s, cin, cout) + conv_flops(s, cout, cout)
    # upsample convs run at the post-upsample resolution (nearest-2x then conv)
    fl += conv_flops(16, 1280, 1280) + conv_flops(32, 1280, 1280) + conv_flops(64, 640, 640)
    fl += conv_flops(64, 9, 320) + conv_flops(64, 320, 4)          # io
    # 1x1 skip projections where channels change
    for s, cin, cout in ((32, 320, 640), (16, 640, 1280)):
        fl += conv_flops(s, cin, cout, k=1)
    for s, cin, cout in ((8, 2560, 1280), (8, 2560, 1280), (8, 2560, 1280),
                         (16, 2560, 1280), (16, 2560, 1280), (16, 1920, 1280),
                         (32, 1920, 640), (32, 1280, 640), (32, 960, 640),
                         (64, 960, 320), (64, 640, 320), (64, 640, 320)):
        fl += conv_flops(s, cin, cout, k=1)
    res_floor = fl / CEIL_GEMM * 1e3

    print()
    print(f"{'bucket':32s} {'count':>5s} {'measured':>9s} {'floor':>8s}")
    for name, count, ms, flo in rows:
        print(f"transformer {name:20s} {count:5d} {ms:8.2f} {flo:8.2f}")
    print(f"{'sum(transformer layers)':32s} {'':5s} {total_layers_ms:8.1f} {floor_layers_ms:7.1f}")
    print(f"{'ResBlocks+glue (step - layers)':32s} {'22+':5s} {res_ms:8.1f} {res_floor:7.1f}")
    print(f"{'FULL STEP':32s} {'':5s} {t_step:8.1f} {floor_layers_ms + res_floor:7.1f}")
    print(f"\n50 steps + 116 ms bf16 VAE decode -> "
          f"{b / (50 * t_step / 1e3 + 0.116):.3f} samples/s measured-step bound; "
          f"floor {b / (50 * (floor_layers_ms + res_floor) / 1e3 + 0.116):.3f}")


if __name__ == "__main__":
    main()
