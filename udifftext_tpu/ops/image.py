"""Image sampling ops: bilinear grid sample (torch F.grid_sample semantics).

Needed by the TPS spatial transformer (TRBA) — align_corners=True, border
padding, normalized [-1, 1] grid coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_sample_bilinear(img: Array, grid: Array) -> Array:
    """img (B, H, W, C); grid (B, Hg, Wg, 2) with (x, y) in [-1, 1]
    (align_corners=True, padding_mode='border') → (B, Hg, Wg, C)."""
    b, h, w, c = img.shape

    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    wx = x - x0
    wy = y - y0

    def clip_xy(xi, yi):
        return (
            jnp.clip(xi, 0, w - 1).astype(jnp.int32),
            jnp.clip(yi, 0, h - 1).astype(jnp.int32),
        )

    def gather(xi, yi):
        xi, yi = clip_xy(xi, yi)
        flat = img.reshape(b, h * w, c)
        idx = yi * w + xi  # (B, Hg, Wg)
        return jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(b, *idx.shape[1:], c)

    v00 = gather(x0, y0)
    v01 = gather(x1, y0)
    v10 = gather(x0, y1)
    v11 = gather(x1, y1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
