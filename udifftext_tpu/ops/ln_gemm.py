"""Fused LayerNorm → GEMM Pallas kernel.

Round-4 verdict item 1(b): the transformer-glue residual charges a "LN
bytes" share — each pre-attention LayerNorm reads and writes the full
(B, N, C) activation to HBM, and the following projection reads it again.
XLA cannot fuse a reduction (LN stats) into a dot operand, so the normalized
activation always round-trips HBM. This kernel computes the fp32 row stats
and the (block_n, C) normalized block in VMEM and feeds the projection GEMM
directly — x is read ONCE from HBM and only the projection output is
written.

Used for the self-attention `norm1 → fused qkv` projection (C → 3C) and the
cross-attention `t_norm → to_q` projection (C → C) in
models/attention.BasicTransformerBlock when running on TPU. Matches
LayerNormF32 (fp32 stats, eps 1e-5, torch-style biased variance) + the
bf16 matmul bit-for-bit in structure (stats fp32, product bf16 MXU).

Backward: custom VJP recomputes through the XLA reference path (exact LN
derivative + standard matmul grads) — the AAE latent-gradient path and the
(frozen-most) training path stay correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ln_gemm_kernel(x_ref, s_ref, b_ref, w_ref, o_ref, xn_ref, *, eps: float,
                    precision):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)  # (bn, C)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        y = xc * inv * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
        xn_ref[...] = y.astype(xn_ref.dtype)

    o_ref[0] = jax.lax.dot_general(
        xn_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(o_ref.dtype)


def _pick_block_n(n: int, f_chunk: int, c: int, itemsize: int) -> int:
    """Largest multiple-of-128 divisor of n whose working set fits ~10 MB."""
    budget = 10 * 1024 * 1024
    fixed = c * f_chunk * itemsize  # weight chunk
    for bn in (1024, 512, 256, 128):
        if n % bn:
            continue
        vmem = (
            fixed
            + bn * c * itemsize * 2       # x block + normalized scratch
            + bn * f_chunk * itemsize     # out block
            + bn * f_chunk * 4            # fp32 dot accumulator
        )
        if vmem <= budget:
            return bn
    return 128 if n % 128 == 0 else n


def _pick_f_chunk(f: int, c: int, itemsize: int) -> int:
    """Largest divisor of f (multiple of 128) with the weight chunk ≤ 4 MB."""
    for fc in sorted({d for d in (f, f // 2, f // 3, f // 4, f // 8, 1920, 1280, 960, 640, 512, 384, 320, 256, 128) if d and f % d == 0 and (d % 128 == 0 or d == f)}, reverse=True):
        if c * fc * itemsize <= 4 * 1024 * 1024:
            return fc
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ln_gemm(x: Array, scale: Array, bias: Array, w: Array,
            eps: float = 1e-5) -> Array:
    """LayerNorm(x) @ w with fp32 LN stats. x (B, N, C), scale/bias (C,),
    w (C, F) → (B, N, F) in x.dtype."""
    return _ln_gemm_fwd_impl(x, scale, bias, w, eps)


def ln_gemm_supported(x: Array, w: Array) -> bool:
    b, n, c = x.shape
    # C need not be lane-aligned: Mosaic masks partial 128-lane tiles in
    # both loads and reductions (ops/groupnorm.py runs C=320 the same way)
    return (
        jax.default_backend() == "tpu"
        and n % 128 == 0
        and c % 8 == 0
        and w.shape[-1] % 8 == 0
    )


@functools.partial(jax.jit, static_argnames=("eps",))
def _ln_gemm_fwd_impl(x, scale, bias, w, eps):
    b, n, c = x.shape
    f = w.shape[-1]
    dtype = x.dtype
    itemsize = 2 if dtype == jnp.bfloat16 else 4

    wc = w.astype(dtype)
    s = scale.reshape(1, c)
    bb = bias.reshape(1, c)

    f_chunk = _pick_f_chunk(f, c, itemsize)
    block_n = _pick_block_n(n, f_chunk, c, itemsize)
    grid = (b, n // block_n, f // f_chunk)

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    return pl.pallas_call(
        functools.partial(_ln_gemm_kernel, eps=eps, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f_chunk), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, f_chunk), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, f), dtype),
        scratch_shapes=[pltpu.VMEM((block_n, c), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * n * c * f),
            bytes_accessed=int((b * n * c + b * n * f + c * f) * itemsize),
            transcendentals=0,
        ),
    )(x, s, bb, wc)


# -- 3-output variant: LN → q/k/v projections with COMPACT outputs ----------
#
# Round-5 finding: concatenating the q/k/v kernels into one XLA GEMM
# REGRESSED the step (bench 1.7157 → 1.5711 samples/s): `jnp.split` of the
# (B, N, 3C) product yields strided views that XLA must copy into compact
# buffers before the Pallas flash kernel can consume them (~240 MB extra
# HBM traffic per ds1 layer). This kernel keeps the wide-GEMM MXU benefit
# AND writes q/k/v as three separate compact arrays: grid dim 2 walks the
# three column blocks of the concatenated weight; each step writes its own
# output, the normalized x block is computed once and reused from scratch.


def _ln_gemm3_kernel(x_ref, s_ref, b_ref, w1_ref, w2_ref, w3_ref,
                     o1_ref, o2_ref, o3_ref, *, eps: float, precision):
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * s_ref[...].astype(jnp.float32)
          + b_ref[...].astype(jnp.float32)).astype(x_ref.dtype)

    for w_ref, o_ref in ((w1_ref, o1_ref), (w2_ref, o2_ref), (w3_ref, o3_ref)):
        o_ref[0] = jax.lax.dot_general(
            xn, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(o_ref.dtype)


def _ln_gemm3_block_n(n: int, c: int, f: int, itemsize: int):
    """Largest multiple-of-128 divisor of n with all three weights + the
    working tiles inside a ~12 MB VMEM budget; None if nothing fits (the
    caller falls back to separate XLA GEMMs — Pallas forbids blocking the
    weight columns at non-128-multiples, so the weights must be resident)."""
    budget = 12 * 1024 * 1024
    fixed = 3 * c * f * itemsize
    for bn in (1024, 512, 256, 128):
        if n % bn:
            continue
        vmem = (
            fixed
            + 2 * bn * c * itemsize       # x block (double-buffered)
            + bn * c * 4                  # fp32 normalized tile
            + 3 * bn * f * itemsize       # out blocks
            + bn * f * 4                  # fp32 dot accumulator
        )
        if vmem <= budget:
            return bn
    return None


def ln_gemm3_supported(x: Array, f: int) -> bool:
    b, n, c = x.shape
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    return (
        jax.default_backend() == "tpu"
        and n % 128 == 0
        and c % 8 == 0
        and f % 8 == 0
        and _ln_gemm3_block_n(n, c, f, itemsize) is not None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ln_gemm3(x: Array, scale: Array, bias: Array,
             wq: Array, wk: Array, wv: Array, eps: float = 1e-5):
    """LayerNorm(x) then three projections sharing the normalized input:
    returns (LN(x)@wq, LN(x)@wk, LN(x)@wv) as compact (B, N, F) arrays.
    One HBM read of x; the normalized activation never leaves VMEM."""
    return _ln_gemm3_fwd_impl(x, scale, bias, wq, wk, wv, eps)


@functools.partial(jax.jit, static_argnames=("eps",))
def _ln_gemm3_fwd_impl(x, scale, bias, wq, wk, wv, eps):
    b, n, c = x.shape
    f = wq.shape[-1]
    dtype = x.dtype
    itemsize = 2 if dtype == jnp.bfloat16 else 4

    s = scale.reshape(1, c)
    bb = bias.reshape(1, c)

    block_n = _ln_gemm3_block_n(n, c, f, itemsize)
    assert block_n is not None, (n, c, f)  # callers gate on ln_gemm3_supported
    grid = (b, n // block_n)

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    out_sds = jax.ShapeDtypeStruct((b, n, f), dtype)
    w_spec = pl.BlockSpec((c, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, block_n, f), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_gemm3_kernel, eps=eps, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            w_spec, w_spec, w_spec,
        ],
        out_specs=[o_spec, o_spec, o_spec],
        out_shape=[out_sds, out_sds, out_sds],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * n * c * 3 * f),
            bytes_accessed=int((b * n * c + 3 * b * n * f + 3 * c * f) * itemsize),
            transcendentals=0,
        ),
    )(x, s, bb, wq.astype(dtype), wk.astype(dtype), wv.astype(dtype))


def ln_gemm3_ref(x, scale, bias, wq, wk, wv, eps: float = 1e-5):
    dtype = x.dtype
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    xn = ln_ref_f32(x, scale, bias, eps)
    return (jnp.matmul(xn, wq.astype(dtype), precision=prec),
            jnp.matmul(xn, wk.astype(dtype), precision=prec),
            jnp.matmul(xn, wv.astype(dtype), precision=prec))


def _ln_gemm3_fwd(x, scale, bias, wq, wk, wv, eps):
    return _ln_gemm3_fwd_impl(x, scale, bias, wq, wk, wv, eps), (x, scale, bias, wq, wk, wv)


def _ln_gemm3_bwd(eps, res, g):
    x, scale, bias, wq, wk, wv = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb, q, k, v: ln_gemm3_ref(xx, ss, bb, q, k, v, eps),
        x, scale, bias, wq, wk, wv,
    )
    return vjp(g)


ln_gemm3.defvjp(_ln_gemm3_fwd, _ln_gemm3_bwd)


def ln_ref_f32(x, scale, bias, eps: float = 1e-5):
    """Canonical fp32-centered-stats LayerNorm reference — the math every
    fused kernel's prologue and XLA fallback in this package must match
    (models/attention.py, ops/geglu.py import THIS; do not re-implement)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def ln_gemm_ref(x, scale, bias, w, eps: float = 1e-5):
    """XLA reference path — identical math, used on CPU and for backward."""
    dtype = x.dtype
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    return jnp.matmul(ln_ref_f32(x, scale, bias, eps), w.astype(dtype), precision=prec)


def _ln_gemm_fwd(x, scale, bias, w, eps):
    return _ln_gemm_fwd_impl(x, scale, bias, w, eps), (x, scale, bias, w)


def _ln_gemm_bwd(eps, res, g):
    x, scale, bias, w = res
    _, vjp = jax.vjp(lambda xx, ss, bb, ww: ln_gemm_ref(xx, ss, bb, ww, eps),
                     x, scale, bias, w)
    return vjp(g)


ln_gemm.defvjp(_ln_gemm_fwd, _ln_gemm_bwd)
