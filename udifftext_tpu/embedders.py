"""Additional conditioning embedders (capability surface).

Parity targets in sgm/modules/encoders/modules.py that are present in the
reference but unused by the shipped configs (SURVEY.md §2 #13):
  - ClassEmbedder (:255-285)
  - ConcatTimestepEmbedderND (:958-977)
  - GaussianEncoder (:980-996)
  - SpatialRescaler with channel remap (:800-860; the no-remap variant lives
    in conditioning.py)
  - LowScaleEncoder (:863-955) — noise-augmented low-res conditioning
  - FrozenCLIPEmbedder / FrozenT5Embedder (:371-433, :289-328) — gated on HF
    transformers' Flax models with local weights (zero-egress environment).
  - IdentityFirstStage (sgm/models/autoencoder.py:324-335)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .models.layers import Dense, timestep_embedding
from .models.vae import DiagonalGaussian
from .diffusion.schedules import ddpm_alphas_cumprod

Array = jax.Array


class ClassEmbedder(nn.Module):
    """Class-id embedding with optional UCG replacement by the extra
    'unconditional' class (reference :255-285)."""

    embed_dim: int
    n_classes: int = 1000
    add_sequence_dim: bool = False
    ucg_rate: float = 0.1

    @nn.compact
    def __call__(self, c: Array, rng: Optional[jax.Array] = None) -> Array:
        if rng is not None and self.ucg_rate > 0.0:
            keep = jax.random.bernoulli(rng, 1.0 - self.ucg_rate, c.shape)
            # the reference reserves the LAST configured class as the ucg id
            # (uc_class = n_classes - 1, modules.py:269-272) — the table has
            # exactly n_classes rows so torch weights load 1:1
            c = jnp.where(keep, c, self.n_classes - 1)
        emb = nn.Embed(self.n_classes, self.embed_dim, param_dtype=jnp.float32)(c)
        if self.add_sequence_dim:
            emb = emb[:, None, :]
        return emb


def concat_timestep_embedder_nd(x: Array, outdim: int) -> Array:
    """Embed each scalar dimension independently and concatenate
    (reference :958-977). x: (B,) or (B, D) → (B, D*outdim)."""
    if x.ndim == 1:
        x = x[:, None]
    b, d = x.shape
    emb = timestep_embedding(x.reshape(-1), outdim)
    return emb.reshape(b, d * outdim)


def gaussian_encode(moments: Array, rng: Optional[jax.Array] = None, flatten: bool = True):
    """GaussianEncoder head (reference :980-996): sample the diagonal
    posterior of encoder moments, return (z, kl)."""
    post = DiagonalGaussian(moments)
    z = post.sample(rng) if rng is not None else post.mode()
    kl = post.kl()
    if flatten:
        z = z.reshape(z.shape[0], -1, z.shape[-1])
    return z, kl


class SpatialRescalerRemap(nn.Module):
    """SpatialRescaler with out-channel remap conv (reference :800-860)."""

    multiplier: float = 0.5
    out_channels: Optional[int] = None
    method: str = "bilinear"
    n_stages: int = 1
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, int(h * self.multiplier), int(w * self.multiplier), c),
                self.method, antialias=False,
            )
        if self.out_channels is not None:
            pad = self.kernel_size // 2
            x = nn.Conv(
                self.out_channels, (self.kernel_size, self.kernel_size),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                param_dtype=jnp.float32,
            )(x)
        return x


@dataclasses.dataclass(frozen=True)
class LowScaleEncoder:
    """Noise-augmented low-resolution conditioning (reference :863-955):
    encode with a frozen first stage, q-sample to a random noise level,
    resize; returns (z_noised, noise_level)."""

    scale_factor: float = 1.0
    max_noise_level: int = 250
    timesteps: int = 1000
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    out_size: Optional[int] = 64

    def q_sample(self, rng: jax.Array, z: Array, t: Array) -> Array:
        acp = jnp.asarray(
            ddpm_alphas_cumprod(self.timesteps, self.linear_start, self.linear_end),
            jnp.float32,
        )
        sa = jnp.sqrt(acp)[t].reshape(-1, *([1] * (z.ndim - 1)))
        soma = jnp.sqrt(1.0 - acp)[t].reshape(-1, *([1] * (z.ndim - 1)))
        noise = jax.random.normal(rng, z.shape, z.dtype)
        return sa * z + soma * noise

    def __call__(self, rng: jax.Array, z: Array) -> Tuple[Array, Array]:
        rng_t, rng_n = jax.random.split(rng)
        z = z * self.scale_factor
        t = jax.random.randint(rng_t, (z.shape[0],), 0, self.max_noise_level)
        z = self.q_sample(rng_n, z, t)
        if self.out_size is not None:
            b, h, w, c = z.shape
            z = jax.image.resize(z, (b, self.out_size, self.out_size, c), "nearest")
        return z, t


class IdentityFirstStage:
    """Pass-through first stage (reference autoencoder.py:324-335)."""

    def encode(self, x: Array) -> Array:
        return x

    def decode(self, x: Array) -> Array:
        return x


class IdentityEncoder:
    """Pass-through embedder (reference modules.py:246-252)."""

    def encode(self, x: Array) -> Array:
        return x

    def __call__(self, x: Array) -> Array:
        return x


class InceptionV3Embedder:
    """InceptionV3 feature embedder (reference modules.py:220-243 wraps the
    pytorch_fid port): our native FIDInceptionV3 with the same squeeze-at-end
    call surface. Input convention matches the wrapper's default
    normalize_input=False: the caller supplies [-1, 1]-ish images and the
    resize to 299² happens inside."""

    def __init__(self, normalize_input: bool = False, weights_path: Optional[str] = None):
        import jax as _jax

        from .models.inception import FIDInceptionV3
        from .utils import ckpt_torch as CT

        self.model = FIDInceptionV3(resize_input=True, normalize_input=normalize_input)
        self.params = None
        if weights_path:
            conv = CT.convert_fid_inception(CT.load_torch_state_dict(weights_path))
            self.params = {"params": _jax.tree.map(jnp.asarray, conv["params"])}

    def init(self, rng, x: Array):
        self.params = self.model.init(rng, x)
        return self.params

    def __call__(self, x: Array) -> Array:
        assert self.params is not None, "load weights or call init() first"
        out = self.model.apply(self.params, x)
        return jnp.squeeze(out)


def load_frozen_clip_text_embedder(
    version: str = "openai/clip-vit-large-patch14",
    max_length: int = 77,
    layer: str = "last",
):
    """FrozenCLIPEmbedder (reference :371-433) on HF Flax CLIP. Requires the
    weights to be present locally (zero-egress environment); raises a clear
    error otherwise."""
    try:
        from transformers import CLIPTokenizer, FlaxCLIPTextModel
    except ImportError as e:
        raise RuntimeError("transformers with Flax support is required") from e
    tokenizer = CLIPTokenizer.from_pretrained(version, local_files_only=True)
    model = FlaxCLIPTextModel.from_pretrained(version, local_files_only=True)

    def embed(texts):
        tokens = tokenizer(
            texts, truncation=True, max_length=max_length, padding="max_length",
            return_tensors="np",
        )
        out = model(input_ids=tokens["input_ids"], output_hidden_states=layer != "last")
        if layer == "last":
            return out.last_hidden_state
        if layer == "pooled":
            return out.pooler_output[:, None]
        return out.hidden_states[-2]

    return embed


def load_frozen_byt5_embedder(version: str = "google/byt5-base", max_length: int = 77):
    """FrozenByT5Embedder (reference :330-368). The ByT5 tokenizer is pure
    byte-level (no vocab download needed); the encoder weights must be
    present locally (zero-egress environment)."""
    try:
        from transformers import ByT5Tokenizer, FlaxT5EncoderModel
    except ImportError as e:
        raise RuntimeError("transformers with Flax support is required") from e
    tokenizer = ByT5Tokenizer()
    model = FlaxT5EncoderModel.from_pretrained(version, local_files_only=True)

    def embed(texts):
        tokens = tokenizer(
            texts, truncation=True, max_length=max_length, padding="max_length",
            return_tensors="np",
        )
        return model(input_ids=tokens["input_ids"]).last_hidden_state

    return embed


def load_frozen_t5_embedder(version: str = "google/t5-v1_1-xxl", max_length: int = 77):
    """FrozenT5Embedder (reference :289-328) on HF Flax T5, local weights."""
    try:
        from transformers import FlaxT5EncoderModel, T5Tokenizer
    except ImportError as e:
        raise RuntimeError("transformers with Flax support is required") from e
    tokenizer = T5Tokenizer.from_pretrained(version, local_files_only=True)
    model = FlaxT5EncoderModel.from_pretrained(version, local_files_only=True)

    def embed(texts):
        tokens = tokenizer(
            texts, truncation=True, max_length=max_length, padding="max_length",
            return_tensors="np",
        )
        return model(input_ids=tokens["input_ids"]).last_hidden_state

    return embed


OPEN_CLIP_WEIGHTS = os.environ.get(
    "UDIFFTEXT_OPEN_CLIP_WEIGHTS", "./checkpoints/clip/open_clip_pytorch_model.bin"
)


def _open_clip_params(weights_path: Optional[str], tower: str):
    import jax as _jax

    from .utils import ckpt_torch as CT

    path = weights_path or OPEN_CLIP_WEIGHTS
    if not os.path.exists(path):
        raise RuntimeError(
            f"open_clip weights not found at {path} — place an open_clip "
            "state dict (e.g. ViT-H-14 laion2b_s32b_b79k) there or set "
            "UDIFFTEXT_OPEN_CLIP_WEIGHTS"
        )
    conv = CT.convert_open_clip(CT.load_torch_state_dict(path))
    params = conv["params"][tower]
    if not params:
        raise RuntimeError(f"{path} carries no {tower} tower")
    return {"params": _jax.tree.map(jnp.asarray, params)}


def load_frozen_open_clip_text_embedder(
    max_length: int = 77,
    layer: str = "last",
    legacy: bool = True,
    always_return_pooled: bool = False,
    weights_path: Optional[str] = None,
    bpe_path: Optional[str] = None,
    **tower_kwargs,
):
    """FrozenOpenCLIPEmbedder / FrozenOpenCLIPEmbedder2 (reference
    modules.py:436-609) on the native flax tower (models/open_clip.py),
    weight-gated like the CLIP/T5 loaders above."""
    from .models.open_clip import (
        FrozenOpenCLIPTextEmbedder,
        OpenClipTextTransformer,
        SimpleTokenizer,
    )

    tokenizer = None
    try:
        tokenizer = SimpleTokenizer(bpe_path, context_length=max_length)
    except FileNotFoundError:
        pass  # ids-only operation stays available
    return FrozenOpenCLIPTextEmbedder(
        model=OpenClipTextTransformer(**tower_kwargs),
        max_length=max_length,
        layer=layer,
        legacy=legacy,
        always_return_pooled=always_return_pooled,
        params=_open_clip_params(weights_path, "text"),
        tokenizer=tokenizer,
    )


def load_frozen_open_clip_image_embedder(
    antialias: bool = True,
    max_length: int = 77,
    unsqueeze_dim: bool = False,
    repeat_to_max_len: bool = False,
    output_tokens: bool = False,
    weights_path: Optional[str] = None,
    **tower_kwargs,
):
    """FrozenOpenCLIPImageEmbedder (reference modules.py:612-769) on the
    native flax vision tower, weight-gated."""
    from .models.open_clip import (
        FrozenOpenCLIPImageEmbedder,
        OpenClipVisionTransformer,
    )

    return FrozenOpenCLIPImageEmbedder(
        model=OpenClipVisionTransformer(**tower_kwargs),
        antialias=antialias,
        max_length=max_length,
        unsqueeze_dim=unsqueeze_dim,
        repeat_to_max_len=repeat_to_max_len,
        output_tokens=output_tokens,
        params=_open_clip_params(weights_path, "visual"),
    )
