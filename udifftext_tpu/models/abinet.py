"""ABINet: vision model + bidirectional cloze language model + fusion.

Parity: src/parseq/strhub/models/abinet/ —
  - ResNet45 backbone + 2-layer transformer (backbone.py, resnet.py:71-72)
  - PositionAttention character-position queries with a U-Net key encoder
    (attention.py:49-100)
  - BCN language model: 4 cross-attention-only decoder layers over detached
    token distributions, location-masked (model_language.py)
  - gated alignment fusion (model_alignment.py) iterated `iter_size` times
    (model_abinet_iter.py:24-40)

The class layout mirrors the reference so the published `abinet-1d1e373e.pt`
checkpoint can be key-mapped; BatchNorms run in inference mode (frozen
evaluator role).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .label_encoder import sinusoidal_positional_encoding
from .layers import Dense
from .parseq import NEG_INF, TorchMHA

Array = jax.Array


def _conv(ch, k=3, s=1, p=1, name=None, use_bias=True):
    if isinstance(s, int):
        s = (s, s)
    return nn.Conv(ch, (k, k), strides=s, padding=((p, p), (p, p)), use_bias=use_bias,
                   param_dtype=jnp.float32, name=name)


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        param_dtype=jnp.float32, name=name)


class ABIBasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        # abinet BasicBlock uses conv1x1 then conv3x3 (resnet.py:8-16)
        h = nn.relu(_bn("bn1")(_conv(self.planes, k=1, p=0, name="conv1", use_bias=False)(x)))
        h = _bn("bn2")(_conv(self.planes, k=3, s=self.stride, name="conv2", use_bias=False)(h))
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = _bn("down_bn")(
                _conv(self.planes, k=1, s=self.stride, p=0, name="down_conv", use_bias=False)(x)
            )
        return nn.relu(h + identity)


class ResNet45(nn.Module):
    """resnet45(): layers [3,4,6,6,3], widths [32,64,128,256,512] (i.e.
    d_model/16 … d_model at the reference d_model=512), strides [2,1,2,1,1]
    after a 3×3 stem."""

    d_model: int = 512

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        widths = [max(d // 16, 8), max(d // 8, 8), max(d // 4, 8), max(d // 2, 8), d]
        x = nn.relu(_bn("bn0")(_conv(widths[0], name="conv0", use_bias=False)(x)))
        spec = list(zip(widths, (3, 4, 6, 6, 3), (2, 1, 2, 1, 1)))
        for li, (w, n, s) in enumerate(spec):
            for bi in range(n):
                x = ABIBasicBlock(w, s if bi == 0 else 1, name=f"layer{li+1}_{bi}")(x)
        return x  # (B, 8, 32, d_model) for 32×128 input


class PostLNEncoderLayer(nn.Module):
    """torch TransformerEncoderLayer (post-LN, relu)."""

    num_heads: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x):
        a = TorchMHA(self.num_heads, name="self_attn")(x, x, x)
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm1")(x + a)
        f = Dense(self.dim_feedforward, name="linear1")(x)
        f = Dense(x.shape[-1], name="linear2")(nn.relu(f))
        return nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm2")(x + f)


class ResTransformer(nn.Module):
    """backbone.py: ResNet45 + sinusoidal PE + 2 post-LN encoder layers."""

    d_model: int = 512
    nhead: int = 8
    d_inner: int = 2048
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        feat = ResNet45(self.d_model, name="resnet")(x)  # (B, H, W, E)
        b, h, w, e = feat.shape
        seq = feat.reshape(b, h * w, e)
        pe = jnp.asarray(sinusoidal_positional_encoding(h * w, e))
        seq = seq + pe[None]
        for i in range(self.num_layers):
            seq = PostLNEncoderLayer(self.nhead, self.d_inner, name=f"enc_{i}")(seq)
        return seq.reshape(b, h, w, e)


class PositionAttention(nn.Module):
    """attention.py:49-100: U-Net key encoder over features + positional
    queries → per-character attention vectors."""

    max_length: int = 26  # dataset_max_length + 1
    in_channels: int = 512
    num_channels: int = 64

    @nn.compact
    def __call__(self, x):  # x (B, H, W, E)
        b, h, w, e = x.shape
        k = x
        feats = []
        strides = [(1, 2), (2, 2), (2, 2), (2, 2)]
        for i, s in enumerate(strides):
            k = nn.relu(_bn(f"ke_bn{i}")(_conv(self.num_channels, s=s, name=f"ke_conv{i}")(k)))
            feats.append(k)
        for i in range(3):
            kh, kw = feats[2 - i].shape[1], feats[2 - i].shape[2]
            k = jax.image.resize(k, (b, kh, kw, k.shape[-1]), "nearest")
            k = nn.relu(_bn(f"kd_bn{i}")(_conv(self.num_channels, name=f"kd_conv{i}")(k)))
            k = k + feats[2 - i]
        # final decode back to the input feature resolution (reference ties
        # this to (8, 32) for 32×128 inputs; generalized to x's H×W)
        k = jax.image.resize(k, (b, h, w, k.shape[-1]), "nearest")
        k = nn.relu(_bn("kd_bn3")(_conv(self.in_channels, name="kd_conv3")(k)))

        pe = jnp.asarray(sinusoidal_positional_encoding(self.max_length, e))
        q = jnp.broadcast_to(pe[None], (b, self.max_length, e))
        q = Dense(e, name="project")(q)

        kf = k.reshape(b, -1, e)
        scores = jnp.einsum("bte,bne->btn", q, kf) / math.sqrt(e)
        scores = jax.nn.softmax(scores, axis=-1)
        v = x.reshape(b, -1, e)
        vecs = jnp.einsum("btn,bne->bte", scores, v)
        return vecs, scores.reshape(b, self.max_length, h, w)


class BaseVision(nn.Module):
    """model_vision.py."""

    max_length: int = 26
    num_classes: int = 37
    d_model: int = 512
    nhead: int = 8
    d_inner: int = 2048
    num_layers: int = 2  # v_num_layers / backbone_ln

    @nn.compact
    def __call__(self, images):
        feat = ResTransformer(self.d_model, self.nhead, self.d_inner,
                              self.num_layers, name="backbone")(images)
        vecs, scores = PositionAttention(self.max_length, self.d_model, name="attention")(feat)
        logits = Dense(self.num_classes, name="cls")(vecs)
        return {"feature": vecs, "logits": logits, "attn_scores": scores}


class BCNDecoderLayer(nn.Module):
    """transformer.py TransformerDecoderLayer with self_attn=False: cross-attn
    (location-masked) + FF, post-LN."""

    num_heads: int
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, q, memory, memory_mask=None, memory_key_padding_mask=None):
        a = TorchMHA(self.num_heads, name="multihead_attn")(
            q, memory, memory, attn_mask=memory_mask,
            key_padding_mask=memory_key_padding_mask,
        )
        q = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm2")(q + a)
        f = Dense(self.dim_feedforward, name="linear1")(q)
        f = Dense(q.shape[-1], name="linear2")(nn.relu(f))
        return nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="norm3")(q + f)


class BCNLanguage(nn.Module):
    """model_language.py: cloze LM over detached token distributions."""

    max_length: int = 26
    num_classes: int = 37
    d_model: int = 512
    nhead: int = 8
    d_inner: int = 2048
    num_layers: int = 4

    @nn.compact
    def __call__(self, tokens, lengths):
        tokens = jax.lax.stop_gradient(tokens)  # detach=True
        embed = Dense(self.d_model, use_bias=False, name="proj")(tokens)
        pe = jnp.asarray(sinusoidal_positional_encoding(self.max_length, self.d_model))
        embed = embed + pe[None]
        query = jnp.broadcast_to(pe[None], embed.shape)

        # location mask: each position cannot attend to itself
        loc = jnp.where(jnp.eye(self.max_length, dtype=bool), NEG_INF, 0.0)
        pad = (
            jnp.arange(self.max_length)[None] >= lengths[:, None]
        )  # (B, T) True beyond length
        h = query
        for i in range(self.num_layers):
            h = BCNDecoderLayer(self.nhead, self.d_inner, name=f"layer_{i}")(
                h, embed, memory_mask=loc, memory_key_padding_mask=pad
            )
        logits = Dense(self.num_classes, name="cls")(h)
        return {"feature": h, "logits": logits}


class BaseAlignment(nn.Module):
    """model_alignment.py: gated fusion of language and vision features."""

    num_classes: int = 37

    @nn.compact
    def __call__(self, l_feature, v_feature):
        f = jnp.concatenate([l_feature, v_feature], axis=-1)
        gate = jax.nn.sigmoid(Dense(v_feature.shape[-1], name="w_att")(f))
        out = gate * v_feature + (1 - gate) * l_feature
        return {"logits": Dense(self.num_classes, name="cls")(out), "feature": out}


def _pt_lengths(logits: Array, null_label: int = 0) -> Array:
    """First occurrence of the null/EOS label + 1 (model.py:12-20)."""
    is_null = jnp.argmax(logits, -1) == null_label
    any_null = jnp.any(is_null, axis=-1)
    first = jnp.argmax(is_null.astype(jnp.int32), axis=-1) + 1
    return jnp.where(any_null, first, logits.shape[1])


class ABINet(nn.Module):
    """ABINetIterModel (model_abinet_iter.py): vision → (language → align) ×
    iter_size. Returns the final aligned logits (B, max_length, C)."""

    max_length: int = 26
    num_classes: int = 37
    iter_size: int = 3
    d_model: int = 512
    nhead: int = 8
    d_inner: int = 2048
    v_num_layers: int = 2
    l_num_layers: int = 4

    @nn.compact
    def __call__(self, images):
        vision = BaseVision(self.max_length, self.num_classes, self.d_model,
                            self.nhead, self.d_inner, self.v_num_layers, name="vision")
        language = BCNLanguage(self.max_length, self.num_classes, self.d_model,
                               self.nhead, self.d_inner, self.l_num_layers, name="language")
        align = BaseAlignment(self.num_classes, name="alignment")

        v_res = vision(images)
        a_logits, a_feature = v_res["logits"], v_res["feature"]
        for _ in range(self.iter_size):
            tokens = jax.nn.softmax(a_logits, axis=-1)
            lengths = jnp.clip(_pt_lengths(a_logits), 2, self.max_length)
            l_res = language(tokens, lengths)
            a_res = align(l_res["feature"], v_res["feature"])
            a_logits = a_res["logits"]
        return a_logits
