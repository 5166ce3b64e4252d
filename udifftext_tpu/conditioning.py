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
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.label_encoder import LabelEncoder
from .models.vae import AutoencoderKL, DiagonalGaussian

Array = jax.Array

# dim → conditioning key routing (reference modules.py:107 maps 3 →
# "crossattn", but this fork's UNet/guider consume the renamed
# t_crossattn/v_crossattn keys only — a plain "crossattn" entry would be
# silently ignored downstream, so the dim-3 default routes to t_crossattn;
# v_crossattn graphs set emb_key explicitly, like the reference YAMLs do)
OUTPUT_DIM2KEYS = {2: "vector", 3: "t_crossattn", 4: "concat", 5: "concat"}


def spatial_rescale(x: Array, multiplier: float = 0.125, method: str = "bilinear") -> Array:
    """Bilinear resize (align_corners=False, antialias OFF — exactly
    F.interpolate's semantics; jax.image.resize antialiases downsamples by
    default, which diverges from the reference SpatialRescaler)."""
    b, h, w, c = x.shape
    out_shape = (b, int(h * multiplier), int(w * multiplier), c)
    return jax.image.resize(x, out_shape, method=method, antialias=False)


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
        if batch_uc is None and force_uc_zero_label:
            # uc differs from c only in the zeroed label embedding — reuse the
            # (expensive, 512² fp32) VAE encode and mask rescale outright
            # instead of re-tracing them and trusting XLA CSE to dedupe
            uc = {
                "t_crossattn": jnp.zeros_like(c["t_crossattn"]),
                "concat": c["concat"],
            }
            return c, uc
        src = batch if batch_uc is None else batch_uc
        uc = self(
            label_params, vae_params, src, rng=rng, train=False,
            force_zero_label=force_uc_zero_label,
        )
        return c, uc


# ---------------------------------------------------------------------------
# Generic embedder-list conditioner (reference GeneralConditioner,
# modules.py:105-217): arbitrary embedder graphs from YAML with dim→key
# routing, per-embedder UCG, and forced-unconditional zeroing. The shipped
# 3-embedder graph uses the specialized `Conditioner` above (fused fast path);
# builders fall back to this one whenever the config adds/changes embedders.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EmbedderSpec:
    """One entry of the conditioner's embedder list.

    apply_fn(params, batch, rng) -> Array | tuple[Array, ...]; `params` is the
    full engine params dict — parameterized embedders pull their collection
    (e.g. params["embedders"][name]), parameterless ones ignore it.
    """

    name: str
    apply_fn: Callable[[Dict[str, Any], Dict[str, Array], Optional[jax.Array]], Any]
    input_key: str
    ucg_rate: float = 0.0
    emb_key: Optional[str] = None
    is_trainable: bool = False
    init_fn: Optional[Callable[[jax.Array], Any]] = None


@dataclasses.dataclass(frozen=True)
class GeneralConditioner:
    embedders: Tuple[EmbedderSpec, ...]

    def __call__(
        self,
        params: Dict[str, Any],
        batch: Dict[str, Array],
        rng: Optional[jax.Array] = None,
        train: bool = False,
        force_zero_keys: Tuple[str, ...] = (),
    ) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        keys = (
            jax.random.split(rng, 2 * len(self.embedders))
            if rng is not None
            else [None] * (2 * len(self.embedders))
        )
        for i, e in enumerate(self.embedders):
            rng_apply, rng_ucg = keys[2 * i], keys[2 * i + 1]
            emb_out = e.apply_fn(params, batch, rng_apply)
            if not isinstance(emb_out, (tuple, list)):
                emb_out = (emb_out,)
            for j, emb in enumerate(emb_out):
                out_key = e.emb_key or OUTPUT_DIM2KEYS[emb.ndim]
                if train and e.ucg_rate > 0.0 and rng_ucg is not None:
                    # independent Bernoulli per OUTPUT of a multi-output
                    # embedder (the reference draws a fresh mask per output,
                    # modules.py:176-190)
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(rng_ucg, j), 1.0 - e.ucg_rate,
                        (emb.shape[0],),
                    ).astype(emb.dtype)
                    emb = emb * keep.reshape((-1,) + (1,) * (emb.ndim - 1))
                if e.input_key in force_zero_keys:
                    emb = jnp.zeros_like(emb)
                # KEY2CATDIM (modules.py:108): vector dim1 / crossattn dim2 /
                # concat dim1(NCHW) — all the feature axis, i.e. -1 in NHWC
                out[out_key] = (
                    emb if out_key not in out
                    else jnp.concatenate([out[out_key], emb], axis=-1)
                )
        return out

    def get_unconditional_conditioning(
        self,
        params: Dict[str, Any],
        batch: Dict[str, Array],
        batch_uc: Optional[Dict[str, Array]] = None,
        rng: Optional[jax.Array] = None,
        force_uc_zero_keys: Tuple[str, ...] = ("label_ids",),
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """(c, uc) with UCG suppressed (train=False), reference :203-217."""
        c = self(params, batch, rng=rng, train=False)
        uc = self(
            params, batch if batch_uc is None else batch_uc,
            rng=rng, train=False, force_zero_keys=force_uc_zero_keys,
        )
        return c, uc

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Init the parameterized extra embedders → params["embedders"]."""
        out = {}
        for e in self.embedders:
            if e.init_fn is not None:
                rng, sub = jax.random.split(rng)
                out[e.name] = e.init_fn(sub)
        return out

    @property
    def trainable_embedders(self) -> Tuple[str, ...]:
        return tuple(e.name for e in self.embedders if e.is_trainable)
