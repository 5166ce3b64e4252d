"""Training losses: standard diffusion loss + UDiffText FullLoss.

Parity: sgm/modules/diffusionmodules/loss.py —
  - StandardDiffusionLoss (:11-68): sigma-sampled noising, w(sigma)-weighted
    L2/L1 on the denoised output vs the clean latent.
  - FullLoss (:71-286): adds the **local attention loss** — per-character
    cross-attention maps (layers with spatial size ≥ min_attn_size),
    gaussian-blurred, scored against character segmentation maps
    (get_local_loss :237-286); the **min-local** variant used by the
    init-noise search and attend-and-excite (:192-235); and an optional OCR
    loss through a frozen PARSeq (:178-190).

Layouts (NHWC): seg (B, H, W, L); seg_mask (B, L); mask (B, H, W, 1);
attention maps {name: (B, heads, N, L')} with N = size².
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import append_dims

Array = jax.Array


def get_gaussian_kernel(kernel_size: int = 3, sigma: float = 1.0) -> np.ndarray:
    """2-D gaussian, normalized to sum 1 (reference loss.py:103-129)."""
    coords = np.arange(kernel_size, dtype=np.float64)
    grid = np.stack(np.meshgrid(coords, coords, indexing="xy"), axis=-1)
    mean = (kernel_size - 1) / 2.0
    variance = sigma**2
    kernel = (1.0 / (2.0 * np.pi * variance)) * np.exp(
        -np.sum((grid - mean) ** 2, axis=-1) / (2 * variance)
    )
    return (kernel / kernel.sum()).astype(np.float32)


def gaussian_blur_depthwise(x: Array, kernel: Array) -> Array:
    """Depthwise 2-D blur: x (B, S, S, C), same kernel per channel."""
    k = kernel.shape[0]
    c = x.shape[-1]
    kern = jnp.broadcast_to(kernel[:, :, None, None], (k, k, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(1, 1),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def interpolate_nearest_torch(x: Array, size: Tuple[int, int]) -> Array:
    """torch F.interpolate(mode='nearest') semantics: out[i] = in[floor(i*s)].

    x: (B, H, W, C) → (B, size[0], size[1], C).
    """
    b, h, w, c = x.shape
    rows = (np.arange(size[0]) * (h / size[0])).astype(np.int32)
    cols = (np.arange(size[1]) * (w / size[1])).astype(np.int32)
    return x[:, rows][:, :, cols]


def _attn_hw(n: int, img_h: int, img_w: int) -> Tuple[int, int]:
    """Spatial shape of an N-token attention map given the conditioning
    image's aspect ratio (square inputs → (isqrt(n), isqrt(n)); rectangular
    latents — engine.sample(latent_hw=...) — scale both axes)."""
    h = max(int(round(math.sqrt(n * img_h / img_w))), 1)
    while n % h:
        h -= 1
    return h, n // h


def _layer_attn_to_blurred(
    attn_map: Array, seg_l: int, kernel: Array, hw: Tuple[int, int]
) -> Array:
    """(B, heads, N, L) → blurred (B, h, w, seg_l)."""
    b, heads, n, l = attn_map.shape
    m = attn_map[..., :seg_l].mean(axis=1)  # (B, N, seg_l) after head mean
    m = m.reshape(b, hw[0], hw[1], seg_l)
    return gaussian_blur_depthwise(m, kernel)


def local_loss(
    attn_maps: Dict[str, Array],
    seg: Array,
    seg_mask: Array,
    kernel: Array,
    min_attn_size: int = 16,
) -> Array:
    """Reference get_local_loss (loss.py:237-286): maximize in-seg peak,
    minimize out-of-seg peak of each character's attention, averaged over
    valid characters and qualifying layers. Returns (B,)."""
    seg_l = seg_mask.shape[1]
    total = 0.0
    count = 0
    for name in sorted(attn_maps):
        if not name.endswith("t_attn"):
            continue
        amap = attn_maps[name].astype(jnp.float32)
        hw = _attn_hw(amap.shape[2], seg.shape[1], seg.shape[2])
        if min(hw) < min_attn_size:
            continue
        blurred = _layer_attn_to_blurred(amap, seg_l, kernel, hw)
        seg_map = interpolate_nearest_torch(seg, hw).astype(jnp.float32)
        b = blurred.reshape(blurred.shape[0], -1, seg_l)  # (B, N, L)
        s = seg_map.reshape(seg_map.shape[0], -1, seg_l)
        p_loss = jnp.max(s * b, axis=1)  # (B, L)
        n_loss = jnp.max((1.0 - s) * b, axis=1)
        denom = jnp.sum(seg_mask, axis=-1)
        p = jnp.sum(p_loss * seg_mask, axis=-1) / denom
        n = jnp.sum(n_loss * seg_mask, axis=-1) / denom
        total = total + (n - p)
        count += 1
    if count == 0:
        return jnp.zeros(seg.shape[0], jnp.float32)
    return total / count


def min_local_loss(
    attn_maps: Dict[str, Array],
    mask: Array,
    seg_mask: Array,
    kernel: Array,
    min_attn_size: int = 16,
) -> Array:
    """Reference get_min_local_loss (loss.py:192-235): the *weakest* character
    activation inside the inpainting mask, negated. Returns (B,)."""
    seg_l = seg_mask.shape[1]
    total = 0.0
    count = 0
    for name in sorted(attn_maps):
        if not name.endswith("t_attn"):
            continue
        amap = attn_maps[name].astype(jnp.float32)
        hw = _attn_hw(amap.shape[2], mask.shape[1], mask.shape[2])
        if min(hw) < min_attn_size:
            continue
        blurred = _layer_attn_to_blurred(amap, seg_l, kernel, hw)
        mask_map = interpolate_nearest_torch(mask, hw).astype(jnp.float32)
        b = blurred.reshape(blurred.shape[0], -1, seg_l)
        m = mask_map.reshape(mask_map.shape[0], -1, 1)
        p = jnp.max(m * b, axis=1)  # (B, L)
        p = p + (1.0 - seg_mask)
        p = jnp.min(p, axis=-1)  # (B,)
        total = total + (-p)
        count += 1
    if count == 0:
        return jnp.zeros(mask.shape[0], jnp.float32)
    return total / count


def diff_loss(model_output: Array, target: Array, w: Array, loss_type: str = "l2") -> Array:
    """Per-sample weighted reconstruction loss (loss.py:60-67). Returns (B,)."""
    if loss_type == "l2":
        per = w * (model_output - target) ** 2
    elif loss_type == "l1":
        per = w * jnp.abs(model_output - target)
    else:
        raise ValueError(loss_type)
    return jnp.mean(per.reshape(target.shape[0], -1), axis=1)


@dataclasses.dataclass(frozen=True)
class FullLossConfig:
    seq_len: int = 12
    kernel_size: int = 3
    gaussian_sigma: float = 1.0
    min_attn_size: int = 16
    lambda_local_loss: float = 0.01
    lambda_ocr_loss: float = 0.001
    ocr_enabled: bool = False
    loss_type: str = "l2"

    @property
    def kernel(self) -> np.ndarray:
        return get_gaussian_kernel(self.kernel_size, self.gaussian_sigma)


def full_loss(
    cfg: FullLossConfig,
    denoiser,
    network,
    sigma_sampler,
    cond: Dict[str, Any],
    x: Array,
    batch: Dict[str, Array],
    rng: jax.Array,
    ocr_loss_fn: Optional[Callable[[Array, Dict[str, Array]], Array]] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """FullLoss.__call__ (loss.py:131-176) as a pure function.

    x is the clean latent (already VAE-encoded + scaled); cond is the
    conditioner output; the network must be capture-attn enabled.
    """
    rng_sigma, rng_noise = jax.random.split(rng)
    sigmas = sigma_sampler(rng_sigma, x.shape[0])
    noise = jax.random.normal(rng_noise, x.shape, x.dtype)
    noised = x + noise * append_dims(sigmas, x.ndim)

    model_output, aux = denoiser(network, noised, sigmas, cond)
    w = append_dims(denoiser.w(sigmas), x.ndim)

    d_loss = diff_loss(model_output, x, w, cfg.loss_type).mean()
    kernel = jnp.asarray(cfg.kernel)
    l_loss = local_loss(
        aux, batch["seg"], batch["seg_mask"], kernel, cfg.min_attn_size
    ).mean()

    loss = d_loss + cfg.lambda_local_loss * l_loss
    loss_dict = {
        "loss/diff_loss": d_loss,
        "loss/local_loss": l_loss,
    }
    if cfg.ocr_enabled and ocr_loss_fn is not None:
        o_loss = ocr_loss_fn(model_output, batch).mean()
        loss = loss + cfg.lambda_ocr_loss * o_loss
        loss_dict["loss/ocr_loss"] = o_loss
    loss_dict["loss/full_loss"] = loss
    return loss, loss_dict


def clip_contrastive_loss(
    text_out: Array,
    visual_out: Array,
    logit_scale: Array,
    cls_out: Array,
    pos_out: Array,
    cls_target: Array,
    lambda_cls: float = 0.1,
    lambda_pos: float = 0.1,
) -> Tuple[Array, Dict[str, Array]]:
    """LabelEncoder pretraining loss (encoders/modules.py:1175-1237):
    symmetric CLIP contrastive + char-identity CE + position CE."""
    b, l = cls_target.shape
    t = text_out / jnp.linalg.norm(text_out, axis=1, keepdims=True)
    v = visual_out / jnp.linalg.norm(visual_out, axis=1, keepdims=True)
    logits_per_image = jnp.exp(logit_scale) * (v @ t.T)
    logits_per_text = logits_per_image.T
    clip_target = jnp.arange(b)

    def ce(logits, target):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))

    clip_loss = 0.5 * (ce(logits_per_image, clip_target) + ce(logits_per_text, clip_target))
    cls_loss = ce(cls_out, cls_target)
    pos_target = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    pos_loss = ce(pos_out, pos_target)
    loss = clip_loss + lambda_cls * cls_loss + lambda_pos * pos_loss

    clip_acc = jnp.mean((jnp.argmax(logits_per_text, -1) == clip_target).astype(jnp.float32))
    cls_acc = jnp.mean((jnp.argmax(cls_out, -1) == cls_target).astype(jnp.float32))
    pos_acc = jnp.mean((jnp.argmax(pos_out, -1) == pos_target).astype(jnp.float32))
    return loss, {
        "loss/clip_loss": clip_loss,
        "loss/cls_loss": cls_loss,
        "loss/pos_loss": pos_loss,
        "loss/full_loss": loss,
        "acc/clip_acc": clip_acc,
        "acc/cls_acc": cls_acc,
        "acc/pos_acc": pos_acc,
    }
