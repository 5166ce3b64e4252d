"""Character-level LabelEncoder (the textual conditioner of UDiffText).

Parity: sgm/modules/encoders/modules.py:1069-1244 —
  - char-id embedding (95 classes, dim 2048) + fixed sinusoidal positional
    encoding (sin at even dims, cos at odd; :1069-1085)
  - 12-layer / 8-head torch ``nn.TransformerEncoder`` with **post-LN** layers,
    ReLU feed-forward of width 2048 (torch defaults), batch-first
  - output (B, 12, 2048) consumed as `t_crossattn`
  - pretraining heads (:1109-1143): InstanceNorm'd cls/pos heads and
    CLIP-projection text/visual heads with a learnable logit scale.

The transformer layer reproduces torch semantics exactly (packed qkv
projection, residual-then-norm) so the published checkpoint loads losslessly.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..charset import NUM_CLASSES
from .layers import Dense, matmul_precision

Array = jax.Array
Dtype = Any


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """pe[:, 0::2]=sin, pe[:, 1::2]=cos (reference :1075-1080)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TorchMultiheadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention with packed in-proj, self-attn only."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, l, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = Dense(3 * d, dtype=self.dtype, name="in_proj")(x)  # packed like torch
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, h, dh)
        k = k.reshape(b, l, h, dh)
        v = v.reshape(b, l, h, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=matmul_precision(self.dtype)) / math.sqrt(dh)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v, precision=matmul_precision(self.dtype)).reshape(b, l, d)
        return Dense(d, dtype=self.dtype, name="out_proj")(out)


class TorchTransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch norm_first=False, activation=relu)."""

    num_heads: int
    dim_feedforward: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        attn = TorchMultiheadSelfAttention(self.num_heads, dtype=self.dtype, name="self_attn")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm1")(
            (x + attn).astype(jnp.float32)
        ).astype(x.dtype)
        ff = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        ff = jax.nn.relu(ff)
        ff = Dense(x.shape[-1], dtype=self.dtype, name="linear2")(ff)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm2")(
            (x + ff).astype(jnp.float32)
        ).astype(x.dtype)
        return x


class LabelEncoder(nn.Module):
    max_len: int = 12
    emb_dim: int = 2048
    n_heads: int = 8
    n_trans_layers: int = 12
    dim_feedforward: int = 2048  # torch TransformerEncoderLayer default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        """ids (B, max_len) int32 → embeddings (B, max_len, emb_dim)."""
        emb = nn.Embed(
            NUM_CLASSES, self.emb_dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="label_embedding",
        )(ids)
        pe = jnp.asarray(sinusoidal_positional_encoding(self.max_len, self.emb_dim))
        x = emb + pe[None, ...].astype(emb.dtype)
        for i in range(self.n_trans_layers):
            x = TorchTransformerEncoderLayer(
                self.n_heads, self.dim_feedforward, dtype=self.dtype, name=f"layers_{i}"
            )(x)
        return x


class InstanceNorm(nn.Module):
    """torch InstanceNorm1d on (B, C, L): normalize over L, no affine.

    The reference applies it to (B, max_len, emb_dim), i.e. per-token feature
    normalization without scale/shift.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class LabelEncoderPretrain(nn.Module):
    """LabelEncoder + pretraining heads (reference :1109-1143).

    __call__(ids, visual_emb) → dict of head outputs + logit scale; the loss
    lives in diffusion/loss.py (clip_contrastive_loss).
    """

    max_len: int = 12
    emb_dim: int = 2048
    n_heads: int = 8
    n_trans_layers: int = 12
    clip_dim: int = 1024
    visual_len: int = 197
    visual_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: Array, visual_emb: Optional[Array] = None):
        text_emb = LabelEncoder(
            self.max_len, self.emb_dim, self.n_heads, self.n_trans_layers,
            dtype=self.dtype, name="encoder",
        )(ids)

        logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

        h = InstanceNorm(name="cls_norm")(text_emb)
        h = Dense(self.emb_dim, dtype=self.dtype, name="cls_fc1")(h)
        h = nn.gelu(h, approximate=False)
        cls_out = Dense(NUM_CLASSES, dtype=self.dtype, name="cls_fc2")(h)

        p = InstanceNorm(name="pos_norm")(text_emb)
        pos_out = Dense(self.max_len, use_bias=False, dtype=self.dtype, name="pos_fc")(p)

        t = InstanceNorm(name="text_norm")(text_emb)
        t = Dense(self.clip_dim, use_bias=False, dtype=self.dtype, name="text_fc")(t)
        # Conv1d(max_len → 1, k=1) ≡ learned weighted sum over tokens + bias
        tw = self.param("text_mix_kernel", nn.initializers.lecun_normal(), (self.max_len, 1))
        tb = self.param("text_mix_bias", nn.initializers.zeros, (1,))
        text_out = jnp.einsum("bld,lo->bod", t, tw, precision=matmul_precision(self.dtype))[:, 0, :] + tb

        out = {
            "text_emb": text_emb,
            "cls_out": cls_out,
            "pos_out": pos_out,
            "text_out": text_out,
            "logit_scale": logit_scale,
        }

        if visual_emb is not None:
            v = InstanceNorm(name="visual_norm")(visual_emb)
            v = Dense(self.clip_dim, use_bias=False, dtype=self.dtype, name="visual_fc")(v)
            vw = self.param("visual_mix_kernel", nn.initializers.lecun_normal(), (self.visual_len, 1))
            vb = self.param("visual_mix_bias", nn.initializers.zeros, (1,))
            out["visual_out"] = jnp.einsum("bld,lo->bod", v, vw, precision=matmul_precision(self.dtype))[:, 0, :] + vb

        return out
