"""Shared NN primitives for the TPU build.

Parity notes (reference cites):
  - timestep_embedding: sgm/modules/diffusionmodules/util.py:206-230 — the
    OpenAI variant with **cos first**, fp32 math.
  - GroupNorm32: util.py:273-275 — GroupNorm always evaluated in fp32 then
    cast back to the compute dtype (we mirror that for bf16 stability).
  - zero_module: util.py:233-238 — zero-init for output projections.

Layout: NHWC everywhere (TPU-native); channel-last convs map directly onto
XLA's preferred conv layout.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
Dtype = Any

zeros_init = nn.initializers.zeros


def matmul_precision(dtype) -> Optional[jax.lax.Precision]:
    """fp32 compute must not silently run bf16 matmul passes (XLA's default
    precision); bf16 compute keeps the fast native MXU path.

    HIGHEST (6-pass bf16 ≈ true fp32) matches torch's fp32 MATMUL default
    (`torch.backends.cuda.matmul.allow_tf32` is False since torch 1.12), so
    fp32 attention/dense paths stay at reference precision."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def conv_precision(dtype) -> Optional[jax.lax.Precision]:
    """Precision for CONVOLUTIONS in fp32 compute: Precision.HIGH (3-pass
    bf16, ~21 effective mantissa bits).

    The reference's "fp32" convs do NOT run at fp32 on the hardware its
    published results come from: torch enables TF32 for cuDNN convolutions by
    default (`torch.backends.cudnn.allow_tf32 = True`), which carries a
    10-bit mantissa. 3-pass bf16 strictly exceeds that, at half the MXU cost
    of the 6-pass HIGHEST (measured on the fp32 VAE decode:
    scripts/test_parity_probe.py / ROOFLINE.md round-4 addendum). Matmuls
    keep HIGHEST via matmul_precision — torch's matmul TF32 default is off,
    so that's where true-fp32 parity actually lives."""
    return jax.lax.Precision.HIGH if dtype == jnp.float32 else None


def timestep_embedding(timesteps: Array, dim: int, max_period: int = 10000) -> Array:
    """Sinusoidal timestep embedding, cos-first (reference util.py:206-230)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _GNParams(nn.Module):
    """Scale/bias holder named to keep the flax param path identical to the
    previous nn.GroupNorm nesting (GroupNorm_0/{scale,bias})."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics, output in the input dtype.

    Mirrors GroupNorm32 (util.py:273-275) numerically, but written in the
    fusion-friendly two-pass form: one fp32 reduction pass over the (bf16)
    input for mean/E[x²], then a single normalize+affine pass that reads the
    input once and writes the output once — instead of materializing fp32
    copies around ``nn.GroupNorm`` (≈3× the HBM traffic at UNet sizes).

    ``eps`` is 1e-5 for UNet blocks (torch default) and 1e-6 for
    SpatialTransformer/VAE ``Normalize`` (attention.py:79-83, model.py:49-52).
    """

    num_groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        g = self.num_groups
        scale, bias = _GNParams(c, name="GroupNorm_0")()

        orig_shape = x.shape
        xg = x.reshape(*x.shape[:1], -1, g, c // g)  # (B, N, G, C/G)
        xf = xg.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        # centered (two-pass) variance: E[(x-mean)^2], not E[x^2]-mean^2 —
        # the one-pass form catastrophically cancels in fp32 when a group's
        # mean magnitude dwarfs its spread (torch computes centered stats)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
        inv = jax.lax.rsqrt(var + self.eps)

        y = (xf - mean) * inv
        y = y.reshape(orig_shape)
        y = y * scale + bias
        return y.astype(x.dtype)


def silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


class Conv3x3(nn.Module):
    features: int
    stride: int = 1
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = zeros_init if self.zero_init else nn.initializers.lecun_normal()
        return nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
        )(x)


class Conv1x1(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.features,
            (1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = zeros_init if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=matmul_precision(self.dtype),
        )(x)


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbor 2x upsample in NHWC (F.interpolate mode='nearest')."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: Array) -> Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))
