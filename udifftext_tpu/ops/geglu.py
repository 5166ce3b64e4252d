"""Fused GEGLU feed-forward Pallas kernel.

The UNet transformer FF (attention.py GEGLUFeedForward; reference
sgm/modules/attention.py:44-69) is `out = (h * gelu(g)) @ W2 + b2` with
`[h, g] = x @ W1 + b1` — XLA materializes the 8×-wide hidden activations to
HBM between the two matmuls (measured 4.35 ms vs a ~2 ms compute floor for
the ds1 layer, scripts/profile_transformer.py). This kernel keeps the hidden
block in VMEM: per (batch, n-block, inner-chunk) grid step it computes the
h/g chunks, gates them, and accumulates the second matmul into an fp32
scratch — the only HBM traffic is x in and out out.

Weight layout: W1 (C, 2I) is pre-split by the wrapper into W1h = W1[:, :I]
and W1g = W1[:, I:] (matching the jnp.split(h, 2, -1) convention); W2 (I, C).
Inner chunking bounds VMEM for wide layers (ds4: C=1280, I=5120).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_exact(x: Array) -> Array:
    return 0.5 * x * (1.0 + jax.lax.erf(x * _INV_SQRT2))


def _erf_poly(x: Array) -> Array:
    """Abramowitz–Stegun 7.1.26 rational erf (max abs error 1.5e-7 — far
    below bf16 resolution). Pallas TPU has no lowering for lax.erf, so the
    kernel uses this; the XLA reference/backward paths keep the exact erf."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel_approx(x: Array) -> Array:
    return 0.5 * x * (1.0 + _erf_poly(x * _INV_SQRT2))


def _geglu_ln_kernel(
    x_ref, s_ref, b_ref, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref, b2_ref,
    o_ref, acc_ref, xn_ref, *, n_chunks: int, precision, eps: float,
):
    """GEGLU with a fused LayerNorm prologue: the fp32-stat LN of the x block
    is computed ONCE (k == 0) into a VMEM scratch — the normalized activation
    never exists in HBM (ln_gemm.py rationale; this is the norm3 → FF edge of
    BasicTransformerBlock)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = (xc * jax.lax.rsqrt(var + eps) * s_ref[...].astype(jnp.float32)
             + b_ref[...].astype(jnp.float32))
        xn_ref[...] = y.astype(xn_ref.dtype)

    x = xn_ref[...]  # (bn, C)

    h = jax.lax.dot_general(
        x, w1h_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + b1h_ref[...].astype(jnp.float32)
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + b1g_ref[...].astype(jnp.float32)
    act = (h * _gelu_kernel_approx(g)).astype(x.dtype)  # (bn, kc)

    part = jax.lax.dot_general(
        act, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k == 0)
    def _():
        acc_ref[...] = part

    @pl.when(k > 0)
    def _():
        acc_ref[...] += part

    @pl.when(k == n_chunks - 1)
    def _():
        o_ref[0] = (acc_ref[...] + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _geglu_kernel(
    x_ref, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref, b2_ref, o_ref, acc_ref,
    *, n_chunks: int, precision,
):
    k = pl.program_id(2)
    x = x_ref[0]  # (bn, C)

    h = jax.lax.dot_general(
        x, w1h_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + b1h_ref[...].astype(jnp.float32)
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + b1g_ref[...].astype(jnp.float32)
    act = (h * _gelu_kernel_approx(g)).astype(x.dtype)  # (bn, kc)

    part = jax.lax.dot_general(
        act, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k == 0)
    def _():
        acc_ref[...] = part

    @pl.when(k > 0)
    def _():
        acc_ref[...] += part

    @pl.when(k == n_chunks - 1)
    def _():
        o_ref[0] = (acc_ref[...] + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_chunk(c: int, inner: int, block_n: int, itemsize: int) -> int:
    """Largest divisor of `inner` keeping the VMEM working set under ~10 MB."""
    budget = 10 * 1024 * 1024
    for chunk in sorted({d for d in (inner, inner // 2, inner // 4, inner // 8, 512, 256) if d and inner % d == 0}, reverse=True):
        vmem = (
            2 * c * chunk * itemsize          # w1h + w1g
            + chunk * c * itemsize            # w2 chunk
            + block_n * c * itemsize          # x block
            + 2 * block_n * chunk * 4         # h, g fp32
            + block_n * chunk * itemsize      # act
            + 2 * block_n * c * 4             # acc + part
        )
        if vmem <= budget:
            return chunk
    return 256 if inner % 256 == 0 else inner


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def geglu_ff(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
             block_n: int = 512) -> Array:
    """x (B, N, C), w1 (C, 2I), b1 (2I,), w2 (I, C), b2 (C,) → (B, N, C)."""
    return _geglu_fwd_impl(x, w1, b1, w2, b2, block_n)


@functools.partial(jax.jit, static_argnames=("block_n",))
def _geglu_fwd_impl(x, w1, b1, w2, b2, block_n=512):
    from .flash_attention import _pick_block

    b, n, c = x.shape
    inner = w2.shape[0]
    # largest multiple-of-128 divisor of n ≤ block_n — N=768/1280 etc. must
    # get a dividing block, not an assert (review round 3)
    block_n = _pick_block(n, block_n)
    assert n % block_n == 0, (n, block_n)
    dtype = x.dtype

    w1h = w1[:, :inner].astype(dtype)
    w1g = w1[:, inner:].astype(dtype)
    b1h = b1[:inner].reshape(1, inner)
    b1g = b1[inner:].reshape(1, inner)
    w2c = w2.astype(dtype)
    b2r = b2.reshape(1, c)

    chunk = _pick_chunk(c, inner, block_n, dtype.itemsize if hasattr(dtype, "itemsize") else 2)
    n_chunks = inner // chunk
    grid = (b, n // block_n, n_chunks)

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    return pl.pallas_call(
        functools.partial(_geglu_kernel, n_chunks=n_chunks, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, c), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, c), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dtype),
        scratch_shapes=[pltpu.VMEM((block_n, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * 2 * inner + inner * c),
            bytes_accessed=2 * x.size * (2 if dtype == jnp.bfloat16 else 4),
            transcendentals=b * n * inner,
        ),
    )(x, w1h, b1h, w1g, b1g, w2c, b2r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def geglu_ff_ln(x: Array, ln_scale: Array, ln_bias: Array,
                w1: Array, b1: Array, w2: Array, b2: Array,
                block_n: int = 512) -> Array:
    """LayerNorm(x) → GEGLU FF, LN fused into the kernel prologue.
    x (B, N, C), ln_scale/ln_bias (C,), w1 (C, 2I), b1 (2I,), w2 (I, C),
    b2 (C,) → (B, N, C)."""
    return _geglu_ln_fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, block_n)


@functools.partial(jax.jit, static_argnames=("block_n",))
def _geglu_ln_fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, block_n=512):
    from .flash_attention import _pick_block

    b, n, c = x.shape
    inner = w2.shape[0]
    block_n = _pick_block(n, block_n)
    assert n % block_n == 0, (n, block_n)
    dtype = x.dtype

    w1h = w1[:, :inner].astype(dtype)
    w1g = w1[:, inner:].astype(dtype)
    b1h = b1[:inner].reshape(1, inner)
    b1g = b1[inner:].reshape(1, inner)
    w2c = w2.astype(dtype)
    b2r = b2.reshape(1, c)
    s = ln_scale.reshape(1, c)
    bb = ln_bias.reshape(1, c)

    itemsize = 2 if dtype == jnp.bfloat16 else 4
    chunk = _pick_chunk(c, inner, block_n, itemsize)
    n_chunks = inner // chunk
    grid = (b, n // block_n, n_chunks)

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    return pl.pallas_call(
        functools.partial(_geglu_ln_kernel, n_chunks=n_chunks,
                          precision=precision, eps=1e-5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, c), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, c), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((block_n, c), jnp.float32),
            pltpu.VMEM((block_n, c), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (c * 2 * inner + inner * c),
            bytes_accessed=2 * x.size * itemsize,
            transcendentals=b * n * inner,
        ),
    )(x, s, bb, w1h, b1h, w1g, b1g, w2c, b2r)


def geglu_ff_ln_ref(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """XLA reference: LN then the exact-gelu GEGLU composition."""
    from .ln_gemm import ln_ref_f32

    return _geglu_ref(ln_ref_f32(x, ln_scale, ln_bias), w1, b1, w2, b2)


def _geglu_ln_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, block_n):
    return (_geglu_ln_fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, block_n),
            (x, ln_scale, ln_bias, w1, b1, w2, b2))


def _geglu_ln_bwd(block_n, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(geglu_ff_ln_ref, x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(g)


geglu_ff_ln.defvjp(_geglu_ln_fwd, _geglu_ln_bwd)


def _geglu_ref(x, w1, b1, w2, b2):
    """XLA reference path (identical math; used for backward recompute)."""
    dtype = x.dtype
    inner = w2.shape[0]
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    hg = jnp.matmul(x, w1.astype(dtype), precision=prec) + b1.astype(dtype)
    h, g = hg[..., :inner], hg[..., inner:]
    act = h * _gelu_exact(g.astype(jnp.float32)).astype(dtype)
    return jnp.matmul(act, w2.astype(dtype), precision=prec) + b2.astype(dtype)


def _geglu_fwd(x, w1, b1, w2, b2, block_n):
    return _geglu_fwd_impl(x, w1, b1, w2, b2, block_n), (x, w1, b1, w2, b2)


def _geglu_bwd(block_n, res, g_out):
    """XLA backward (recompute; the frozen-UNet training path masks most of
    these grads anyway, but all are exact)."""
    x, w1, b1, w2, b2 = res
    dtype = x.dtype
    inner = w2.shape[0]
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    mm = lambda a, b_: jnp.matmul(a, b_, precision=prec)

    hg = mm(x, w1.astype(dtype)) + b1.astype(dtype)
    h = hg[..., :inner].astype(jnp.float32)
    g = hg[..., inner:].astype(jnp.float32)
    gelu_g = _gelu_exact(g)
    act = (h * gelu_g).astype(dtype)

    go = g_out.astype(dtype)
    dact = mm(go, w2.astype(dtype).T).astype(jnp.float32)
    dw2 = mm(act.reshape(-1, inner).T, go.reshape(-1, go.shape[-1]))
    db2 = jnp.sum(go.astype(jnp.float32), axis=(0, 1))

    dh = dact * gelu_g
    dgelu = 0.5 * (1.0 + jax.lax.erf(g * _INV_SQRT2)) + g * jnp.exp(-0.5 * g * g) * _INV_SQRT_2PI
    dg = dact * h * dgelu
    dhg = jnp.concatenate([dh, dg], axis=-1).astype(dtype)

    dx = mm(dhg, w1.astype(dtype).T)
    dw1 = mm(x.reshape(-1, x.shape[-1]).T, dhg.reshape(-1, 2 * inner))
    db1 = jnp.sum(dhg.astype(jnp.float32), axis=(0, 1))
    return (
        dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )


geglu_ff.defvjp(_geglu_fwd, _geglu_bwd)
