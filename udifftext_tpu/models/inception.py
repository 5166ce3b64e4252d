"""FID InceptionV3 feature extractor (pool3, 2048-d), flax/NHWC.

Parity target: the `pytorch_fid` InceptionV3 the reference shells out to
(/root/reference/metrics.py:5-9). Architecture is torchvision InceptionV3
with pytorch_fid's FID patches:
  - InceptionA/C and Mixed_7b's InceptionE use avg-pooling with
    count_include_pad=False in their pool branch,
  - Mixed_7c's InceptionE uses MAX pooling in its pool branch.
Input handling matches pytorch_fid's wrapper: bilinear resize to 299² and
[0,1] → [-1,1] normalization; output is the 2048-d post-avgpool feature.

Module/parameter names mirror the torch state-dict keys
(Conv2d_1a_3x3.conv/bn, Mixed_5b.branch1x1, …) so the weight converter
(utils/ckpt_torch.convert_fid_inception) is a mechanical rename.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _avg_pool_nocount(x: Array, window: int = 3) -> Array:
    """3×3 stride-1 SAME avg-pool with count_include_pad=False (the FID
    patch): divide by the number of *valid* taps, not the window size."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    return summed / counts


def _max_pool(x: Array, window: int = 3, stride: int = 1, padding="SAME") -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), padding,
    )


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps 1e-3, inference stats as params) + relu."""

    out_ch: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.out_ch, self.kernel, strides=self.stride, padding=self.padding,
            use_bias=False, name="conv", param_dtype=jnp.float32,
        )(x)
        # frozen inference BN — stats live as params for converter simplicity
        shape = (self.out_ch,)
        gamma = self.param("bn_weight", nn.initializers.ones, shape)
        beta = self.param("bn_bias", nn.initializers.zeros, shape)
        mean = self.param("bn_mean", nn.initializers.zeros, shape)
        var = self.param("bn_var", nn.initializers.ones, shape)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
        return nn.relu(x)


def _pad(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p = k // 2
    return ((p, p), (p, p))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv2d(64, name="branch1x1")(x)
        b5 = BasicConv2d(48, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(5), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, name="branch_pool")(_avg_pool_nocount(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2, "VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, name="branch1x1")(x)
        b7 = BasicConv2d(c7, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, name="branch_pool")(_avg_pool_nocount(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv2d(192, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2, "VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # "avg" (Mixed_7b) or "max" (Mixed_7c, FID patch)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, name="branch1x1")(x)
        b3 = BasicConv2d(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=p13, name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=p31, name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(3), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        pooled = _avg_pool_nocount(x) if self.pool_mode == "avg" else _max_pool(x)
        bp = BasicConv2d(192, name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Pool3 feature extractor. Input: (B, H, W, 3) in [0, 1]."""

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.resize_input:
            b = x.shape[0]
            # antialias=False matches pytorch_fid's F.interpolate(bilinear,
            # align_corners=False)
            x = jax.image.resize(x, (b, 299, 299, 3), "bilinear", antialias=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(3), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2, "VALID")
        x = BasicConv2d(80, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2, "VALID")
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg-pool → (B, 2048)
