"""Conditioning: the GeneralConditioner equivalent, functional.

Parity: sgm/modules/encoders/modules.py —
  - GeneralConditioner (:105-217): runs embedders, routes outputs into
    {t_crossattn, concat}, applies per-embedder UCG Bernoulli dropout, zeroes
    forced-unconditional keys, and builds (c, uc) pairs.
  - SpatialRescaler (:800-860): bilinear ×0.125 downsample of the 1-ch mask.
  - LatentEncoder (:999-1014): frozen VAE encode of the masked image scaled by
    0.18215. NOTE the wrapped `AutoencoderKLInferenceWrapper.encode` *samples*
    the posterior (autoencoder.py:319-321); pass `rng` for that behavior or
    None for the deterministic mode (documented tolerance vs torch).

Shipped config (configs/train/textdesign_sd_2.yaml:40-83): LabelEncoder
(ucg 0.1, emb_key t_crossattn) + SpatialRescaler(mask) + LatentEncoder(masked)
→ concat [mask↓8 (1ch), z_masked (4ch)]; the sampler-side channel-concat with
x (4ch) yields the UNet's 9 input channels (wrappers.py:23-35).

Batch convention (NHWC): image (B,512,512,3) in [-1,1]; mask (B,512,512,1);
masked (B,512,512,3); label_ids (B,12) int32 (host-tokenized via charset).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.label_encoder import LabelEncoder
from .models.vae import AutoencoderKL, DiagonalGaussian

Array = jax.Array


def spatial_rescale(x: Array, multiplier: float = 0.125, method: str = "bilinear") -> Array:
    """Bilinear resize (align_corners=False semantics, like F.interpolate)."""
    b, h, w, c = x.shape
    out_shape = (b, int(h * multiplier), int(w * multiplier), c)
    return jax.image.resize(x, out_shape, method=method)


@dataclasses.dataclass(frozen=True)
class Conditioner:
    """Builds the cond dict from a batch; pure functions of (params, batch)."""

    label_encoder: LabelEncoder
    vae: AutoencoderKL
    scale_factor: float = 0.18215
    ucg_rate_label: float = 0.1
    mask_multiplier: float = 0.125

    def encode_masked(
        self, vae_params, masked: Array, rng: Optional[jax.Array]
    ) -> Array:
        moments = self.vae.apply(vae_params, masked, method=AutoencoderKL.encode_moments)
        post = DiagonalGaussian(moments)
        z = post.sample(rng) if rng is not None else post.mode()
        return self.scale_factor * z

    def __call__(
        self,
        label_params,
        vae_params,
        batch: Dict[str, Array],
        rng: Optional[jax.Array] = None,
        train: bool = False,
        force_zero_label: bool = False,
    ) -> Dict[str, Array]:
        ids = batch["label_ids"]
        t_emb = self.label_encoder.apply(label_params, ids)

        rng_ucg = rng_vae = None
        if rng is not None:
            rng_ucg, rng_vae = jax.random.split(rng)

        if train and self.ucg_rate_label > 0.0 and rng_ucg is not None:
            keep = jax.random.bernoulli(
                rng_ucg, 1.0 - self.ucg_rate_label, (t_emb.shape[0],)
            ).astype(t_emb.dtype)
            t_emb = t_emb * keep[:, None, None]
        if force_zero_label:
            t_emb = jnp.zeros_like(t_emb)

        mask_small = spatial_rescale(batch["mask"], self.mask_multiplier)
        z_masked = self.encode_masked(vae_params, batch["masked"], rng_vae)

        concat = jnp.concatenate([mask_small, z_masked], axis=-1)
        return {"t_crossattn": t_emb, "concat": concat}

    def get_unconditional_conditioning(
        self,
        label_params,
        vae_params,
        batch: Dict[str, Array],
        batch_uc: Optional[Dict[str, Array]] = None,
        rng: Optional[jax.Array] = None,
        force_uc_zero_label: bool = True,
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """(c, uc) with UCG rates suppressed (reference :203-217).

        The torch reference prepares batch_uc with label="" (util.py:62-78);
        with force_uc_zero_label the label embedding is zeroed outright, which
        subsumes that. The same VAE-sample rng is reused for c and uc so the
        concat halves match (they do in torch, which encodes the same batch
        tensor twice only when batch_uc is provided — we share it).
        """
        c = self(label_params, vae_params, batch, rng=rng, train=False)
        src = batch if batch_uc is None else batch_uc
        uc = self(
            label_params, vae_params, src, rng=rng, train=False,
            force_zero_label=force_uc_zero_label,
        )
        return c, uc
