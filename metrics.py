"""Quantitative metrics: FID and LPIPS over saved real/fake directories.

Parity: /root/reference/metrics.py:5-30 — calc_fid / calc_lpips with the same
call surface. The reference shells out to `pytorch_fid` and uses the `lpips`
package; neither is installable here, so:
  - FID: the Frechet statistics/distance math is implemented natively
    (testable in isolation); the InceptionV3 feature extractor is pluggable —
    pass `feature_fn`, or rely on pytorch_fid when importable. Without either,
    the function reports why it cannot run rather than fabricating a score.
  - LPIPS: gated the same way.
"""

from __future__ import annotations

import glob
import os
from os.path import join as ospj
from typing import Callable, Optional

import numpy as np
from PIL import Image


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (Heusel et al. 2017)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def activation_statistics(features: np.ndarray):
    """(N, D) features → (mu, sigma)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def _load_images(d: str) -> list:
    return sorted(glob.glob(ospj(d, "*")))


def calc_fid(
    fake_dir: str,
    real_dir: str,
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    batch_size: int = 8,
) -> Optional[float]:
    """FID between two image directories (reference metrics.py:5-9)."""
    print(f"evaluating FID score between '{fake_dir}' and '{real_dir}'")

    if feature_fn is None:
        try:
            import subprocess
            import sys

            subprocess.run(
                [sys.executable, "-m", "pytorch_fid", fake_dir, real_dir,
                 "--batch-size", str(batch_size)],
                check=True,
            )
            return None
        except Exception:
            print(
                "FID skipped: no feature extractor available "
                "(pytorch_fid not installed and no feature_fn provided)"
            )
            return None

    def features_of(d):
        feats = []
        paths = _load_images(d)
        for i in range(0, len(paths), batch_size):
            imgs = np.stack(
                [
                    np.asarray(
                        Image.open(p).convert("RGB").resize((299, 299), Image.BILINEAR),
                        np.float32,
                    ) / 255.0
                    for p in paths[i : i + batch_size]
                ]
            )
            feats.append(np.asarray(feature_fn(imgs)))
        return np.concatenate(feats, axis=0)

    mu1, s1 = activation_statistics(features_of(fake_dir))
    mu2, s2 = activation_statistics(features_of(real_dir))
    fid = frechet_distance(mu1, s1, mu2, s2)
    print(f"FID: {fid:.3f}")
    return fid


def calc_lpips(
    fake_dir: str,
    real_dir: str,
    distance_fn: Optional[Callable[[np.ndarray, np.ndarray], float]] = None,
) -> Optional[float]:
    """Pairwise perceptual distance (reference metrics.py:12-30)."""
    print(f"evaluating LPIPS score between '{fake_dir}' and '{real_dir}'")
    if distance_fn is None:
        try:
            import lpips  # noqa: F401
        except ImportError:
            print("LPIPS skipped: lpips package not installed and no distance_fn provided")
            return None

        import lpips
        import torch

        loss_fn = lpips.LPIPS(net="alex")
        distance_fn = lambda a, b: float(
            loss_fn.forward(
                torch.from_numpy(a.transpose(2, 0, 1))[None] * 2 - 1,
                torch.from_numpy(b.transpose(2, 0, 1))[None] * 2 - 1,
            )
        )

    fake_paths = _load_images(fake_dir)
    real_paths = _load_images(real_dir)
    dists = []
    for fp, rp in zip(fake_paths, real_paths):
        a = np.asarray(Image.open(fp).convert("RGB"), np.float32) / 255.0
        b = np.asarray(Image.open(rp).convert("RGB"), np.float32) / 255.0
        dists.append(distance_fn(a, b))
    score = float(np.mean(dists)) if dists else float("nan")
    print(f"lpips score: {score}")
    return score
