"""KL autoencoder (SD first stage), TPU-native.

Parity: sgm/modules/diffusionmodules/model.py:482-743 (Encoder/Decoder),
sgm/models/autoencoder.py:282-321 (AutoencoderKL[InferenceWrapper]),
sgm/modules/distributions/distributions.py:24-72 (DiagonalGaussian).

Shipped ddconfig (configs/train/textdesign_sd_2.yaml:89-108): ch 128, mult
[1,2,4,4], 2 resblocks, no down/up attention, z_channels 4, double_z; the only
attention is the single-head mid-block attention.

Notes:
  - The reference runs the VAE outside autocast (fp32); we default dtype fp32.
  - `AutoencoderKLInferenceWrapper.encode` *samples* the posterior
    (autoencoder.py:319-321); `encode` here returns the distribution params so
    callers choose sample(rng) or mode() explicitly.
  - VAE Downsample uses asymmetric (0,1) padding (model.py:71-88).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import sdpa
from .layers import (
    Conv1x1,
    Conv3x3,
    GroupNorm32,
    conv_precision,
    silu,
    upsample_nearest_2x,
)

Array = jax.Array
Dtype = Any


class DiagonalGaussian:
    """Posterior q(z|x) with (mean, logvar) channel-chunked parameters."""

    def __init__(self, parameters: Array):
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> Array:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> Array:
        return self.mean

    def kl(self) -> Array:
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar, axis=(1, 2, 3)
        )

    def nll(self, sample: Array) -> Array:
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=(1, 2, 3),
        )


class VAEResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.out_channels or x.shape[-1]
        h = GroupNorm32(eps=1e-6, name="norm1")(x)
        h = silu(h)
        h = Conv3x3(out_ch, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h)
        h = silu(h)
        h = Conv3x3(out_ch, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = Conv1x1(out_ch, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head self-attention over pixels (model.py:158-304)."""

    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, hh, ww, c = x.shape
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        q = Conv1x1(c, dtype=self.dtype, name="q")(h).reshape(b, hh * ww, 1, c)
        k = Conv1x1(c, dtype=self.dtype, name="k")(h).reshape(b, hh * ww, 1, c)
        v = Conv1x1(c, dtype=self.dtype, name="v")(h).reshape(b, hh * ww, 1, c)
        out = sdpa(q, k, v, impl=self.attn_impl).reshape(b, hh, ww, c)
        out = Conv1x1(c, dtype=self.dtype, name="proj_out")(out)
        return x + out


class VAEDownsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # torch pads (left=0, right=1, top=0, bottom=1) then conv stride 2
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1],
            (3, 3),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
            name="conv",
        )(x)


class VAEUpsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample_nearest_2x(x)
        return Conv3x3(x.shape[-1], dtype=self.dtype, name="conv")(x)


@dataclasses.dataclass(frozen=True)
class DDConfig:
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True


class Encoder(nn.Module):
    cfg: DDConfig = DDConfig()
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        x = x.astype(self.dtype)
        h = Conv3x3(cfg.ch, dtype=self.dtype, name="conv_in")(x)
        curr_res = cfg.resolution
        num_res = len(cfg.ch_mult)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = VAEResnetBlock(cfg.ch * mult, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dtype=self.dtype, attn_impl=self.attn_impl, name=f"down_{i}_attn_{j}")(h)
            if i != num_res - 1:
                h = VAEDownsample(dtype=self.dtype, name=f"down_{i}_downsample")(h)
                curr_res //= 2
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, attn_impl=self.attn_impl, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = silu(h)
        z_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return Conv3x3(z_ch, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: DDConfig = DDConfig()
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.cfg
        z = z.astype(self.dtype)
        num_res = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (num_res - 1)
        h = Conv3x3(block_in, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, attn_impl=self.attn_impl, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        for i in reversed(range(num_res)):
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(cfg.ch * cfg.ch_mult[i], dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dtype=self.dtype, attn_impl=self.attn_impl, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = VAEUpsample(dtype=self.dtype, name=f"up_{i}_upsample")(h)
                curr_res *= 2
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = silu(h)
        return Conv3x3(cfg.out_ch, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode → DiagonalGaussian params; decode; quant convs included."""

    cfg: DDConfig = DDConfig()
    embed_dim: int = 4
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype, attn_impl=self.attn_impl, name="encoder")
        self.decoder = Decoder(self.cfg, dtype=self.dtype, attn_impl=self.attn_impl, name="decoder")
        self.quant_conv = Conv1x1(2 * self.embed_dim, dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = Conv1x1(self.cfg.z_channels, dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x: Array) -> Array:
        return self.quant_conv(self.encoder(x))

    def decode(self, z: Array) -> Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: Array, rng: Optional[jax.Array] = None) -> Tuple[Array, Array]:
        """Roundtrip: returns (reconstruction, z)."""
        moments = self.encode_moments(x)
        post = DiagonalGaussian(moments)
        z = post.sample(rng) if rng is not None else post.mode()
        return self.decode(z), z
