"""LPIPS (AlexNet backbone) perceptual distance, flax/NHWC.

Parity target: `lpips.LPIPS(net='alex')` used by the reference
(/root/reference/metrics.py:12-30): a frozen torchvision AlexNet feature
trunk, unit-normalized activations at the five relu taps, squared
differences re-weighted by learned 1×1 "lin" convs, spatial-mean, summed
over layers. Inputs are RGB in [-1, 1] (lpips.im2tensor convention).

Parameter names mirror the torch state-dict structure (net conv indices
0/3/6/8/10, lin0..lin4) so utils/ckpt_torch.convert_lpips_alex is a
mechanical rename.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# lpips.ScalingLayer constants (RGB)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.asarray([0.458, 0.448, 0.450], jnp.float32)

# torchvision AlexNet features: (name, out_ch, kernel, stride, pad) at
# indices 0, 3, 6, 8, 10; relu taps follow each conv; 3×3/2 max-pools after
# taps 1 and 2
_ALEX_CONVS = (
    ("conv0", 64, 11, 4, 2),
    ("conv3", 192, 5, 1, 2),
    ("conv6", 384, 3, 1, 1),
    ("conv8", 256, 3, 1, 1),
    ("conv10", 256, 3, 1, 1),
)


def _max_pool(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


class AlexFeatures(nn.Module):
    """The five relu-tap activations of torchvision AlexNet features."""

    @nn.compact
    def __call__(self, img: Array) -> List[Array]:
        h = (img - _SHIFT) / _SCALE  # lpips ScalingLayer
        taps = []
        for i, (name, ch, k, s, p) in enumerate(_ALEX_CONVS):
            h = nn.Conv(
                ch, (k, k), strides=s, padding=((p, p), (p, p)),
                name=name, param_dtype=jnp.float32,
            )(h)
            h = nn.relu(h)
            taps.append(h)
            if i in (0, 1):
                h = _max_pool(h)
        return taps


class LPIPSAlex(nn.Module):
    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: (B, H, W, 3) in [-1, 1] → (B,) perceptual distances."""
        net = AlexFeatures(name="net")  # one trunk, shared between x and y
        fx, fy = net(x), net(y)
        total = 0.0
        for i, (tx, ty) in enumerate(zip(fx, fy)):
            nx = tx * jax.lax.rsqrt(jnp.sum(tx**2, axis=-1, keepdims=True) + 1e-10)
            ny = ty * jax.lax.rsqrt(jnp.sum(ty**2, axis=-1, keepdims=True) + 1e-10)
            diff = (nx - ny) ** 2
            w = self.param(
                f"lin{i}", nn.initializers.ones, (diff.shape[-1],), jnp.float32
            )
            total = total + jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
        return total
