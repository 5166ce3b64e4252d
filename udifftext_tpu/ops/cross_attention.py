"""Fully fused textual cross-attention Pallas kernel (hoisted-K/V path).

The UNet's t_attn is structurally tiny compute over large activations: the
context is 12 LabelEncoder tokens, so q·kᵀ and attn·v are (N×12) GEMMs —
but the XLA composition (LayerNorm → q projection → sim → fp32 softmax →
·v → out projection → residual add) round-trips the (B, N, C) activation
through HBM six-plus times (~0.74 ms measured per ds1 layer vs a ~0.2 ms
bytes floor, scripts/glue_fusion_probe.py). With K/V hoisted
(models/unet.precompute_context_kv) everything except x itself fits VMEM:
both 320²-1280² projection weights, the 12-token K/V, and the per-block
normalized/attended tiles. This kernel reads each x block ONCE and writes
the residual-added output ONCE.

Semantics (reference sgm/modules/attention.py:111-174 + LayerNormF32):
fp32 LN stats, bf16 MXU projections, fp32 softmax over the 12 tokens,
zero-init out-proj bias included, residual add fused.

Used by models/attention.BasicTransformerBlock on TPU when the map is NOT
captured (capture_map=True keeps the XLA path that materializes the map for
the local loss / AAE / viz). Backward: custom VJP through the XLA reference
composition — exact LN/softmax derivatives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_ref, s_ref, b_ref, wq_ref, k_ref, v_ref, wo_ref, bo_ref, o_ref,
            *, heads: int, dim_head: int, eps: float, scale: float, precision):
    x = x_ref[0]  # (bn, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * s_ref[...].astype(jnp.float32)
          + b_ref[...].astype(jnp.float32)).astype(x.dtype)

    q = jax.lax.dot_general(
        xn, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(x.dtype)  # (bn, H*D)

    kk = k_ref[0]  # (L, H*D)
    vv = v_ref[0]
    outs = []
    for h in range(heads):
        qh = q[:, h * dim_head:(h + 1) * dim_head]            # (bn, D)
        kh = kk[:, h * dim_head:(h + 1) * dim_head]           # (L, D)
        vh = vv[:, h * dim_head:(h + 1) * dim_head]           # (L, D)
        sim = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale                                              # (bn, L) fp32
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        p = jnp.exp(sim)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(x.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ))                                                     # (bn, D) fp32
    attn_out = jnp.concatenate(outs, axis=-1).astype(x.dtype)  # (bn, H*D)

    proj = jax.lax.dot_general(
        attn_out, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + bo_ref[...].astype(jnp.float32)
    o_ref[0] = (proj + xf).astype(o_ref.dtype)  # fused residual add


def _pick_block_n(n: int, c: int, inner: int, itemsize: int) -> int:
    budget = 10 * 1024 * 1024
    fixed = (c * inner + inner * c) * itemsize  # wq + wo
    for bn in (1024, 512, 256, 128):
        if n % bn:
            continue
        vmem = fixed + bn * c * itemsize * 3 + bn * inner * (itemsize + 4)
        if vmem <= budget:
            return bn
    return 128 if n % 128 == 0 else n


def cross_attention_supported(x: Array, k: Array, heads: int) -> bool:
    b, n, c = x.shape
    l = k.shape[1]
    inner = k.shape[2] * k.shape[3]
    # C/inner need not be lane-aligned (Mosaic masks partial tiles; the
    # head slices are 64-wide = half-tile aligned on the flagship graph)
    return (
        jax.default_backend() == "tpu"
        and n % 128 == 0
        and c % 8 == 0
        and inner % 8 == 0
        and 1 < l <= 64          # softmax branch; tiny-token context only
        and heads <= 32
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_cross_attention(
    x: Array, ln_scale: Array, ln_bias: Array, wq: Array,
    k: Array, v: Array, wo: Array, bo: Array,
    heads: int, eps: float = 1e-5,
) -> Array:
    """x (B, N, C); k/v (B, L, H, D) pre-projected (hoisted); wq/wo (C, C);
    bo (C,). Returns x + OutProj(Attn(LN(x)Wq, k, v)) — the full t_attn
    residual branch of BasicTransformerBlock."""
    return _fwd_impl(x, ln_scale, ln_bias, wq, k, v, wo, bo, heads, eps)


@functools.partial(jax.jit, static_argnames=("heads", "eps"))
def _fwd_impl(x, ln_scale, ln_bias, wq, k, v, wo, bo, heads, eps):
    b, n, c = x.shape
    l = k.shape[1]
    inner = wq.shape[-1]  # heads * dim_head (== c on the flagship graph)
    dim_head = inner // heads
    dtype = x.dtype
    itemsize = 2 if dtype == jnp.bfloat16 else 4

    s = ln_scale.reshape(1, c)
    bb = ln_bias.reshape(1, c)
    bo_r = bo.reshape(1, c)
    # (B, L, H, D) → (B, L, H·D): 2D tiles inside the kernel, heads sliced
    # by column range (concat of head outputs = column order of the hoist)
    kq = k.astype(dtype).reshape(b, l, inner)
    vq = v.astype(dtype).reshape(b, l, inner)

    block_n = _pick_block_n(n, c, inner, itemsize)
    grid = (b, n // block_n)
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, dim_head=dim_head, eps=eps,
            scale=dim_head ** -0.5, precision=precision,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inner), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, inner), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, inner), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * n * c * (2 * c + 2 * l)),
            bytes_accessed=int(2 * b * n * c * itemsize + 2 * c * c * itemsize),
            transcendentals=int(b * n * heads * l),
        ),
    )(x, s, bb, wq.astype(dtype), kq, vq, wo.astype(dtype), bo_r)


def fused_cross_attention_ref(x, ln_scale, ln_bias, wq, k, v, wo, bo,
                              heads, eps: float = 1e-5):
    """XLA reference composition — identical math (backward + CPU tests)."""
    b, n, c = x.shape
    l = k.shape[1]
    inner = wq.shape[-1]
    dim_head = inner // heads
    dtype = x.dtype
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(dtype)

    q = jnp.matmul(xn, wq.astype(dtype), precision=prec).reshape(b, n, heads, dim_head)
    sim = jnp.einsum("bnhd,blhd->bhnl", q, k.astype(dtype), precision=prec)
    sim = sim.astype(jnp.float32) * (dim_head ** -0.5)
    attn = jax.nn.softmax(sim, axis=-1).astype(dtype)
    out = jnp.einsum("bhnl,blhd->bnhd", attn, v.astype(dtype), precision=prec)
    out = out.reshape(b, n, inner)
    proj = jnp.matmul(out, wo.astype(dtype), precision=prec) + bo.astype(dtype)
    return x + proj


def _fca_fwd(x, ln_scale, ln_bias, wq, k, v, wo, bo, heads, eps):
    return (_fwd_impl(x, ln_scale, ln_bias, wq, k, v, wo, bo, heads, eps),
            (x, ln_scale, ln_bias, wq, k, v, wo, bo))


def _fca_bwd(heads, eps, res, g):
    x, ln_scale, ln_bias, wq, k, v, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: fused_cross_attention_ref(*a, heads, eps),
        x, ln_scale, ln_bias, wq, k, v, wo, bo,
    )
    return vjp(g)


fused_cross_attention.defvjp(_fca_fwd, _fca_bwd)
