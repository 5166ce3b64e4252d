"""Quantitative metrics: FID and LPIPS over saved real/fake directories.

Parity: /root/reference/metrics.py:5-30 — calc_fid / calc_lpips with the same
call surface. The reference shells out to `pytorch_fid` and uses the `lpips`
package; here both run natively on TPU:
  - FID: flax FIDInceptionV3 (models/inception.py, the pytorch_fid pool3
    variant) + native Frechet statistics/distance math. The extractor loads
    pytorch_fid's `pt_inception-2015-12-05` torch weights via
    utils/ckpt_torch.convert_fid_inception when present at
    $UDIFFTEXT_FID_WEIGHTS or ./checkpoints/metrics/pt_inception-2015-12-05.pth.
  - LPIPS: flax LPIPSAlex (models/lpips.py) loading an `lpips.LPIPS(net=
    'alex')` state-dict dump from $UDIFFTEXT_LPIPS_WEIGHTS or
    ./checkpoints/metrics/lpips_alex.pth.
Without weights the functions report why they cannot run rather than
fabricating a score from random-init features; a `feature_fn`/`distance_fn`
override is always honored first (used by tests).
"""

from __future__ import annotations

import glob
import os
from os.path import join as ospj
from typing import Callable, Optional

import numpy as np
from PIL import Image

FID_WEIGHTS = os.environ.get(
    "UDIFFTEXT_FID_WEIGHTS", "./checkpoints/metrics/pt_inception-2015-12-05.pth"
)
LPIPS_WEIGHTS = os.environ.get(
    "UDIFFTEXT_LPIPS_WEIGHTS", "./checkpoints/metrics/lpips_alex.pth"
)
ALEXNET_WEIGHTS = os.environ.get(
    "UDIFFTEXT_ALEXNET_WEIGHTS", "./checkpoints/metrics/alexnet.pth"
)


def load_inception_feature_fn(weights_path: str = None):
    """Jitted (N, H, W, 3) [0,1] → (N, 2048) pool3 features, or None if the
    torch weights are absent."""
    import jax
    import jax.numpy as jnp

    from udifftext_tpu.models.inception import FIDInceptionV3
    from udifftext_tpu.utils import ckpt_torch as CT

    path = weights_path or FID_WEIGHTS
    if not os.path.exists(path):
        return None
    model = FIDInceptionV3()
    conv = CT.convert_fid_inception(CT.load_torch_state_dict(path))
    params = {"params": jax.tree.map(jnp.asarray, conv["params"])}
    fn = jax.jit(lambda x: model.apply(params, x))
    return lambda x: np.asarray(fn(jnp.asarray(x, jnp.float32)))


def load_lpips_distance_fn(weights_path: str = None, alexnet_path: str = None):
    """Jitted pairwise LPIPS on (H, W, 3) [0,1] images, or None if weights
    are absent."""
    import jax
    import jax.numpy as jnp

    from udifftext_tpu.models.lpips import LPIPSAlex
    from udifftext_tpu.utils import ckpt_torch as CT

    path = weights_path or LPIPS_WEIGHTS
    if not os.path.exists(path):
        return None
    sd = CT.load_torch_state_dict(path)
    alex_sd = None
    if not any(k.startswith("net.") for k in sd):
        apath = alexnet_path or ALEXNET_WEIGHTS
        if not os.path.exists(apath):
            print(f"LPIPS: {path} has only lin weights and {apath} is absent")
            return None
        alex_sd = CT.load_torch_state_dict(apath)
    model = LPIPSAlex()
    conv = CT.convert_lpips_alex(sd, alex_sd)
    params = {"params": jax.tree.map(jnp.asarray, conv["params"])}
    fn = jax.jit(lambda a, b: model.apply(params, a, b))

    def distance(a: np.ndarray, b: np.ndarray) -> float:
        aa = jnp.asarray(a, jnp.float32)[None] * 2.0 - 1.0
        bb = jnp.asarray(b, jnp.float32)[None] * 2.0 - 1.0
        return float(fn(aa, bb)[0])

    return distance


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
        feature_fn = load_inception_feature_fn()
    if feature_fn is None:
        print(
            "FID skipped: no feature extractor available — place pytorch_fid's "
            f"pt_inception-2015-12-05.pth at {FID_WEIGHTS} (or set "
            "UDIFFTEXT_FID_WEIGHTS), or pass feature_fn"
        )
        return None

    def features_of(d):
        # feed NATIVE-resolution images — the extractor resizes internally
        # with pytorch_fid's exact semantics (bilinear, no antialias); a host
        # PIL pre-resize would silently change the resampling and break FID
        # comparability. Images are bucketed by shape up front so mixed-size
        # dirs still batch fully (and the jitted extractor compiles once per
        # distinct shape, not once per interleaving).
        # Streaming: each bucket is flushed through the extractor as soon as
        # it fills a batch, so at most batch_size pending fp32 images per
        # distinct shape live in RAM (a 10k-image 512² dir would otherwise
        # hold ~30 GB before the first extraction — review round 3).
        buckets = {}
        feats = []
        for p in _load_images(d):
            arr = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
            pend = buckets.setdefault(arr.shape, [])
            pend.append(arr)
            if len(pend) == batch_size:
                feats.append(np.asarray(feature_fn(np.stack(pend))))
                pend.clear()
        for pend in buckets.values():
            if pend:
                feats.append(np.asarray(feature_fn(np.stack(pend))))
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
        distance_fn = load_lpips_distance_fn()
    if distance_fn is None:
        print(
            "LPIPS skipped: no distance function available — place an "
            f"lpips.LPIPS(net='alex') state-dict dump at {LPIPS_WEIGHTS} (or "
            "set UDIFFTEXT_LPIPS_WEIGHTS), or pass distance_fn"
        )
        return None

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
