"""Pallas TPU fused GroupNorm(+SiLU) kernel.

The resblock prologue the BASELINE north star names: GroupNorm32 statistics
in fp32 + normalize + affine + SiLU in a single VMEM pass (one HBM read of x,
one write of y), instead of XLA's two passes around the reduction.

MXU trick: per-group sums are computed as (N, C) @ (C, G) matmuls against a
one-hot group-membership matrix — no awkward (N, G, C/G) retiling on the VPU.

Layout: x (B, N, C) with N = H*W; scale/bias (C,). Grid over B; each program
holds one sample's (N, C) block (≤ ~2.6 MB bf16 at UNet sizes).

MEASURED (v5e, 16×64²×320 bf16): 0.77 ms/op vs 0.60 ms for the XLA two-pass
GroupNorm32 — XLA's reduce+elementwise fusion already saturates this op, so
the models keep the XLA path (models/layers.py GroupNorm32) by default and
this kernel stays available for shapes/toolchains where it wins.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


_CHUNK = 512


def _gn_kernel(x_ref, scale_ref, bias_ref, m_ref, o_ref, *, eps: float, n: int,
               cg: int, with_silu: bool, precision):
    m = m_ref[:]  # (C, G) same dtype as x
    g = m.shape[1]
    chunk = min(_CHUNK, n)
    num_chunks = n // chunk

    # pass 1: chunked fp32 group sums via MXU matmuls against the membership
    # matrix — bounds the fp32 temporaries to one chunk at a time
    def stat_body(i, carry):
        s1, s2 = carry
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        s1 = s1 + jnp.sum(
            jax.lax.dot_general(
                xb, m.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ),
            axis=0, keepdims=True,
        )
        s2 = s2 + jnp.sum(
            jax.lax.dot_general(
                xb * xb, m.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ),
            axis=0, keepdims=True,
        )
        return s1, s2

    s1, s2 = jax.lax.fori_loop(
        0, num_chunks, stat_body,
        (jnp.zeros((1, g), jnp.float32), jnp.zeros((1, g), jnp.float32)),
    )
    cnt = float(n * cg)
    mean_g = s1 / cnt
    # one-pass streaming variance: cancellation-prone when |mean| >> spread
    # (GroupNorm32 uses the centered two-pass form); acceptable here because
    # this kernel is opt-in and UNet activations are near zero-mean
    var_g = s2 / cnt - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    # broadcast group stats back to channels: (1, G) @ (G, C)
    mt = m.astype(jnp.float32)
    mean_c = jax.lax.dot_general(
        mean_g, mt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (1, C)
    inv_c = jax.lax.dot_general(
        inv_g, mt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    scale = scale_ref[:].astype(jnp.float32)[None, :] * inv_c
    bias = bias_ref[:].astype(jnp.float32)[None, :] - mean_c * scale

    # pass 2: chunked normalize + affine + SiLU
    def norm_body(i, _):
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xb * scale + bias
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_chunks, norm_body, 0)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "with_silu"))
def fused_groupnorm_silu(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = True,
) -> Array:
    """x (B, H, W, C) or (B, N, C) → same shape; fp32 stats, SiLU fused."""
    orig_shape = x.shape
    if x.ndim == 4:
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
    b, n, c = x.shape
    g = num_groups
    cg = c // g

    member = np.zeros((c, g), np.float32)
    member[np.arange(c), np.arange(c) // cg] = 1.0
    m = jnp.asarray(member, x.dtype)

    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, n=n, cg=cg, with_silu=with_silu,
                          precision=precision),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * g + 8 * b * n * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * n * c if with_silu else 0,
        ),
    )(x, scale.astype(x.dtype), bias.astype(x.dtype), m)
    return out.reshape(orig_shape)


def groupnorm_silu_ok(x: Array, num_groups: int = 32) -> bool:
    """Shape/backend gate for the fused kernel."""
    if jax.default_backend() != "tpu":
        return False
    c = x.shape[-1]
    if c % num_groups:
        return False
    n = 1
    for d in x.shape[1:-1]:
        n *= d
    # VMEM budget: in + out + fp32 temps must fit comfortably
    return n * c * x.dtype.itemsize <= 4 * 1024 * 1024
