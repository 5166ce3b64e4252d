"""Vision Transformer blocks shared by the PARSeq encoder and ViTSTR.

Parity targets:
  - PARSeq Encoder (src/parseq/strhub/models/parseq/modules.py:104-115): timm
    VisionTransformer, no class token, returns all tokens after the final
    norm; img 32×128, patch 4×8, dim 384, depth 12, heads 6.
  - ViTSTREncoder (sgm/modules/encoders/modules.py:1017-1066): timm ViT with
    class token, grayscale 224², patch 16, dim 768, depth 12, heads 12.

The block is the standard pre-LN timm block: x += attn(norm1(x));
x += mlp(norm2(x)), qkv packed with bias, exact GELU.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Dense, matmul_precision

Array = jax.Array
Dtype = Any


class ViTSelfAttention(nn.Module):
    """timm Attention: packed qkv (with bias), scale 1/sqrt(dh)."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, dh)
        k = k.reshape(b, n, h, dh)
        v = v.reshape(b, n, h, dh)
        prec = matmul_precision(self.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=prec) / math.sqrt(dh)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v, precision=prec).reshape(b, n, d)
        return Dense(d, dtype=self.dtype, name="proj")(out)


class ViTMlp(nn.Module):
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        x = Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return Dense(d, dtype=self.dtype, name="fc2")(x)


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        x = x + ViTSelfAttention(self.num_heads, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        x = x + ViTMlp(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        return x


class PatchEmbed(nn.Module):
    """Conv patchify: (B, H, W, C) → (B, N, D)."""

    embed_dim: int
    patch_size: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ph, pw = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (ph, pw),
            strides=(ph, pw),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=matmul_precision(self.dtype),
            name="proj",
        )(x)
        b, gh, gw, d = x.shape
        return x.reshape(b, gh * gw, d)


class ViTEncoder(nn.Module):
    """timm VisionTransformer forward_features (all tokens, post-norm)."""

    img_size: Tuple[int, int] = (32, 128)
    patch_size: Tuple[int, int] = (4, 8)
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    class_token: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype, name="patch_embed")(x)
        b, n, d = x.shape
        if self.class_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
            x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)).astype(x.dtype), x], axis=1)
            n += 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02), (1, n, d)
        )
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = ViTBlock(self.num_heads, self.mlp_ratio, dtype=self.dtype, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        return x


class ViTSTREncoder(nn.Module):
    """ViTSTR-base feature extractor (encoders/modules.py:1017-1066): ViT with
    class token over grayscale 224², returns all 197 tokens; the classifier
    head exists in the checkpoint but only features are consumed."""

    size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    in_chans: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return ViTEncoder(
            img_size=(self.size, self.size),
            patch_size=(self.patch_size, self.patch_size),
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            class_token=True,
            dtype=self.dtype,
            name="vit",
        )(x)
