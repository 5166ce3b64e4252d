"""Additional scene-text-recognition models from the vendored parseq hub.

Parity targets (src/parseq/strhub/models/):
  - ViTSTR (vitstr/model.py:14-28, vitstr/system.py:27-58): a ViT whose first
    (max_len + 2) output tokens go through a per-token classifier head; the
    class-token position is dropped.
  - CRNN (crnn/model.py): conv feature extractor + 2-layer BiLSTM + CTC.

PARSeq (the load-bearing evaluator) lives in parseq.py; TRBA and ABINet in
trba.py / abinet.py. All five hub models have checkpoint converters verified
by torch forward parity (tests/test_trba_abinet.py, test_parseq_parity.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Dense, matmul_precision
from .vit import ViTEncoder

Array = jax.Array
Dtype = Any


class ViTSTRSystem(nn.Module):
    """ViTSTR: per-token classification over the first seqlen ViT tokens.

    Output (B, max_label_length + 1, num_classes) — the leading class token
    is dropped (vitstr/system.py:52-55).
    """

    max_label_length: int = 25
    img_size: Tuple[int, int] = (32, 128)
    patch_size: Tuple[int, int] = (4, 8)
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_classes: int = 95  # len(tokenizer) - 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        feats = ViTEncoder(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.depth, num_heads=self.num_heads,
            class_token=True, dtype=self.dtype, name="vit",
        )(x)
        seqlen = self.max_label_length + 2  # [GO] + chars + [s]
        feats = feats[:, :seqlen]
        logits = Dense(self.num_classes, dtype=self.dtype, name="head")(feats)
        return logits[:, 1:].astype(jnp.float32)  # drop the class-token slot


class BiLSTM(nn.Module):
    """Bidirectional LSTM layer with output projection (TRBA/CRNN style)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="bwd")(x)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        return Dense(self.out, dtype=self.dtype, name="proj")(h)


class CRNN(nn.Module):
    """CRNN (crnn/model.py:6-60, clovaai layout): 7-conv stack with BN on
    convs 2/4/6, asymmetric pools, 2×BiLSTM → per-frame CTC logits.
    Input (B, 32, W, C) → (B, W/4 + 1, num_classes)."""

    num_classes: int = 95
    in_channels: int = 3
    hidden: int = 256
    leaky_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = (lambda v: nn.leaky_relu(v, 0.2)) if self.leaky_relu else nn.relu

        def conv(v, i, ch, k=3, p=1, use_bias=True):
            return nn.Conv(ch, (k, k), padding=((p, p), (p, p)), use_bias=use_bias,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           precision=matmul_precision(self.dtype), name=f"conv{i}")(v)

        def bn(v, i):
            return nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                                param_dtype=jnp.float32, name=f"bn{i}")(v)

        h = act(conv(x, 0, 64))
        h = nn.max_pool(h, (2, 2), (2, 2))
        h = act(conv(h, 1, 128))
        h = nn.max_pool(h, (2, 2), (2, 2))
        h = act(bn(conv(h, 2, 256, use_bias=False), 2))
        h = act(conv(h, 3, 256))
        h = nn.max_pool(h, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1)))
        h = act(bn(conv(h, 4, 512, use_bias=False), 4))
        h = act(conv(h, 5, 512))
        h = nn.max_pool(h, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1)))
        h = act(bn(conv(h, 6, 512, k=2, p=0, use_bias=False), 6))
        # collapse height (1 after the stack for 32-px input)
        h = jnp.squeeze(h, axis=1) if h.shape[1] == 1 else h.mean(axis=1)
        h = BiLSTM(self.hidden, self.hidden, dtype=self.dtype, name="rnn0")(h)
        h = BiLSTM(self.hidden, self.num_classes, dtype=self.dtype, name="rnn1")(h)
        return h.astype(jnp.float32)


def ctc_greedy_decode(logits: Array):
    """Best-path per-frame argmax; blank/repeat handling happens in
    ctc_collapse (strhub CTCTokenizer._filter semantics, host-side)."""
    return jnp.argmax(logits, axis=-1)


def ctc_collapse(ids, blank_id: int = 0):
    """Host-side repeat-collapse + blank removal."""
    import numpy as np

    out = []
    for row in np.asarray(ids):
        prev = -1
        seq = []
        for i in row:
            if i != prev and i != blank_id:
                seq.append(int(i))
            prev = i
        out.append(seq)
    return out
