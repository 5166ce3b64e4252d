"""Per-op breakdown of one ds1 SpatialTransformer layer (ROOFLINE.md's
"transformer non-attn" bucket): GroupNorm+proj_in, self-attn (split into
qkv/sdpa/out), t_attn cross-attention, GEGLU FF, proj_out.

Methodology (ROOFLINE.md): every op timed as a lax.scan of K reps inside ONE
jit; every timed region ends in float(sum) so the relay cannot hide in-flight
work; chip must be quiet.

Usage: python scripts/profile_transformer.py [batch=16] [K=20]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _zeros_params, cast_params_bf16  # noqa: E402

C = 320          # ds1 channels
HEADS = 5
DIM_HEAD = 64
N_SIDE = 64      # 64x64 latent
CTX_DIM = 2048   # LabelEncoder token dim
L = 12


def timed_scan(build_body, init, K, label, flops_per_iter=None):
    """build_body: carry -> carry. Times K scanned reps in one jit."""

    @jax.jit
    def run(c0):
        def body(c, _):
            return build_body(c), None

        c, _ = jax.lax.scan(body, c0, None, length=K)
        return jnp.sum(c.astype(jnp.float32))

    float(run(init))  # compile + warmup
    t0 = time.perf_counter()
    float(run(init))
    dt = (time.perf_counter() - t0 - 0.024) / K  # ~24 ms fixed dispatch
    rate = f"  {flops_per_iter / dt / 1e12:6.1f} TF/s" if flops_per_iter else ""
    print(f"{label:42s} {dt * 1e3:8.2f} ms{rate}")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    b2 = 2 * b  # CFG doubling
    n = N_SIDE * N_SIDE

    from udifftext_tpu.models.attention import (
        CrossAttention,
        GEGLUFeedForward,
        LayerNormF32,
        SelfAttention,
        SpatialTransformer,
    )

    dt = jnp.bfloat16
    st = SpatialTransformer(HEADS, DIM_HEAD, t_context_dim=CTX_DIM, dtype=dt)
    x_sp = jnp.zeros((b2, N_SIDE, N_SIDE, C), dt)
    ctx = jnp.zeros((b2, L, CTX_DIM), dt)
    stp = cast_params_bf16(_zeros_params(st, x_sp[:1], ctx[:1]))

    x = jnp.zeros((b2, n, C), dt)

    print(f"=== ds1 SpatialTransformer per-op (B_cfg={b2}, N={n}, C={C}) ===")

    # whole layer
    timed_scan(
        lambda c: st.apply(stp, c, ctx)[0].astype(dt),
        x_sp, K, "SpatialTransformer (full)",
    )

    # self-attn block (LN + qkv + sdpa + out)
    sa = SelfAttention(HEADS, DIM_HEAD, dtype=dt)
    sap = cast_params_bf16(_zeros_params(sa, x[:1]))
    ln = LayerNormF32(dtype=dt)
    lnp = _zeros_params(ln, x[:1])
    timed_scan(
        lambda c: (sa.apply(sap, ln.apply(lnp, c)) + c).astype(dt),
        x, K, "self-attn residual (LN+qkv+sdpa+out)",
        flops_per_iter=2 * b2 * (3 * n * C * C + 2 * n * n * C + n * C * C),
    )
    # sdpa alone
    from udifftext_tpu.ops import sdpa

    q = jnp.zeros((b2, n, HEADS, DIM_HEAD), dt)
    timed_scan(
        lambda c: sdpa(c, c, c).astype(dt),
        q, K, "  sdpa alone (flash)",
        flops_per_iter=4 * b2 * HEADS * n * n * DIM_HEAD,
    )
    # qkv+out projections alone
    timed_scan(
        lambda c: (
            c
            + jnp.einsum("bnc,cd->bnd", c, stp["params"]["blocks_0"]["attn1"]["to_q"]["Dense_0"]["kernel"].astype(dt)) * 0
        ).astype(dt),
        x, K, "  one (N,C)@(C,C) proj",
        flops_per_iter=2 * b2 * n * C * C,
    )
    # LayerNorm alone
    timed_scan(
        lambda c: ln.apply(lnp, c).astype(dt),
        x, K, "  LayerNormF32 alone",
    )

    # t_attn cross-attention residual
    ca = CrossAttention(HEADS, DIM_HEAD, dtype=dt)
    cap = cast_params_bf16(_zeros_params(ca, x[:1], ctx[:1]))
    timed_scan(
        lambda c: (ca.apply(cap, ln.apply(lnp, c), ctx)[0] + c).astype(dt),
        x, K, "t_attn residual (LN+cross-attn)",
        flops_per_iter=2 * b2 * (n * C * C + 2 * L * CTX_DIM * C
                                 + 2 * n * L * C + n * C * C),
    )

    # GEGLU FF residual
    ff = GEGLUFeedForward(dtype=dt)
    ffp = cast_params_bf16(_zeros_params(ff, x[:1]))
    timed_scan(
        lambda c: (ff.apply(ffp, ln.apply(lnp, c)) + c).astype(dt),
        x, K, "GEGLU FF residual (LN+8x+4x)",
        flops_per_iter=2 * b2 * (n * C * 8 * C + n * 4 * C * C),
    )

    # proj_in/out + GroupNorm + reshapes
    from udifftext_tpu.models.layers import GroupNorm32

    gn = GroupNorm32(eps=1e-6)
    gnp = _zeros_params(gn, x_sp[:1])
    timed_scan(
        lambda c: gn.apply(gnp, c).astype(dt),
        x_sp, K, "GroupNorm32 alone",
    )

    # XLA cost analysis of the full layer
    comp = jax.jit(lambda c: st.apply(stp, c, ctx)[0]).lower(x_sp).compile()
    ca_ = comp.cost_analysis()
    if ca_:
        print(f"full layer cost: {ca_.get('flops', 0) / 1e9:.1f} GFLOP, "
              f"{ca_.get('bytes accessed', 0) / 1e9:.2f} GB accessed")


if __name__ == "__main__":
    main()
