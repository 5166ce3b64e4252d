"""Visual observability: attention heatmaps, segment maps, intermediate GIFs.

Parity: sgm/modules/diffusionmodules/openaimodel.py:559-591 (save_attn_map —
per-token seaborn heatmap grid), sampling.py:254-262 (save_segment_map .npy)
and :410-418 (intermediate-decode GIFs). Consumed by test.py/demo.py when
`detailed` is enabled.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def average_attn_maps(
    attn_maps: Dict[str, np.ndarray],
    layers: Optional[Sequence[str]] = None,
    attn_type: str = "t_attn",
) -> np.ndarray:
    """Average (B, heads, N, L) maps over selected layers and heads →
    (B, L, size, size) spatial maps (openaimodel.py:566-583)."""
    picked = []
    for name, m in sorted(attn_maps.items()):
        if not name.endswith(attn_type):
            continue
        if layers and not any(name.startswith(l) for l in layers):
            continue
        picked.append(np.asarray(m, np.float32))
    if not picked:
        raise ValueError("no attention maps matched")
    if len({p.shape for p in picked}) > 1:
        # mixed resolutions can't be stacked (the reference restricts to the
        # configured save_attn_layers, all one size — openaimodel.py:563-566);
        # without a layer filter, keep the finest-resolution group
        best = max(p.shape[2] for p in picked)
        picked = [p for p in picked if p.shape[2] == best]
    stack = np.stack(picked, axis=0)  # (n_layers, B, H, N, L)
    avg = stack.mean(axis=(0, 2))  # (B, N, L)
    b, n, l = avg.shape
    # square for the reference's 512² runs; nearest-divisor split keeps
    # rectangular-latent runs from crashing the visualization
    h = int(np.sqrt(n))
    while n % h:
        h -= 1
    return avg.transpose(0, 2, 1).reshape(b, l, h, n // h)


def save_attn_map_grid(
    maps_blhw: np.ndarray,
    tokens: str = "",
    save_path: str = "temp/attn_map/attn_map.png",
    max_tokens: int = 12,
):
    """Render the last sample's per-token heatmaps in a 3×4 grid
    (openaimodel.py:584-591)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    attn = maps_blhw[-1]  # last sample
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig = plt.figure(figsize=(12, 8), dpi=150)
    for j in range(min(max_tokens, attn.shape[0])):
        ax = fig.add_subplot(3, 4, j + 1)
        sns.heatmap(attn[j], square=True, xticklabels=False, yticklabels=False, ax=ax)
        if j < len(tokens):
            ax.set_title(tokens[j])
    fig.savefig(save_path)
    plt.close(fig)
    return save_path


def save_segment_map(
    maps_blhw: np.ndarray, tokens: str, save_path: str = "temp/seg_map/seg.npy"
):
    """Per-token attention sections as .npy (sampling.py:254-262)."""
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    section = np.stack([maps_blhw[-1][i] for i in range(len(tokens))]) if tokens else maps_blhw[-1]
    np.save(save_path, section)
    return save_path


def save_intermediates_gif(
    frames: List[np.ndarray], save_path: str = "temp/inters/sample.gif", duration: float = 0.02
):
    """Decoded-intermediate GIF (sampling.py:410-418). frames: list of
    (H, W, 3) float [0,1] or uint8."""
    import imageio

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    frames8 = [
        f if f.dtype == np.uint8 else (np.clip(f, 0, 1) * 255).astype(np.uint8)
        for f in frames
    ]
    imageio.mimsave(save_path, frames8, "GIF", duration=duration)
    return save_path
