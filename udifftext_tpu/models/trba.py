"""TRBA: TPS-transformation + ResNet + BiLSTM + Attention decoder.

Parity: src/parseq/strhub/models/trba/ —
  - TPS_SpatialTransformerNetwork (transformation.py): localization conv
    stack predicting F=20 fiducial points, closed-form thin-plate-spline
    grid (precomputed inv_delta_C / P_hat), bilinear border sampling.
  - ResNet_FeatureExtractor (feature_extraction.py): FAN ResNet with block
    counts [1, 2, 5, 3] and asymmetric stride tail.
  - BidirectionalLSTM ×2 (strhub/models/modules.py).
  - Attention decoder (prediction.py): additive-attention LSTM cell over the
    sequence features, greedy at inference.

TPU notes: inference decode is a fixed-length `lax.scan` over the LSTM cell;
BatchNorms run in inference mode (frozen evaluator role).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import grid_sample_bilinear
from .layers import Dense, matmul_precision

Array = jax.Array
Dtype = Any


def _conv(ch, k=3, s=1, p=None, name=None, use_bias=False):
    pad = k // 2 if p is None else p
    if isinstance(s, int):
        s = (s, s)
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    return nn.Conv(ch, (k, k), strides=s, padding=pad, use_bias=use_bias,
                   param_dtype=jnp.float32, name=name)


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        param_dtype=jnp.float32, name=name)


# ---------------------------------------------------------------------------
# TPS spatial transformer
# ---------------------------------------------------------------------------


def build_tps_constants(F: int, out_h: int, out_w: int) -> Tuple[np.ndarray, np.ndarray]:
    """(inv_delta_C (F+3, F+3), P_hat (n, F+3)) — transformation.py:106-160."""
    ctrl_x = np.linspace(-1.0, 1.0, F // 2)
    C = np.concatenate(
        [np.stack([ctrl_x, -np.ones(F // 2)], 1), np.stack([ctrl_x, np.ones(F // 2)], 1)],
        axis=0,
    )  # (F, 2)

    hat_C = np.zeros((F, F))
    for i in range(F):
        for j in range(F):
            r = np.linalg.norm(C[i] - C[j]) + np.eye(F)[i, j]
            hat_C[i, j] = r**2 * np.log(r)
    delta_C = np.concatenate(
        [
            np.concatenate([np.ones((F, 1)), C, hat_C], axis=1),
            np.concatenate([np.zeros((2, 3)), C.T], axis=1),
            np.concatenate([np.zeros((1, 3)), np.ones((1, F))], axis=1),
        ],
        axis=0,
    )
    inv_delta_C = np.linalg.inv(delta_C)

    gx = (np.arange(-out_w, out_w, 2) + 1.0) / out_w
    gy = (np.arange(-out_h, out_h, 2) + 1.0) / out_h
    P = np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)  # (n, 2)
    n = P.shape[0]
    diff = P[:, None] - C[None]  # (n, F, 2)
    rbf_norm = np.linalg.norm(diff, axis=2, keepdims=True)
    # r²·log(r+eps) — transformation.py:156 (NOT 2·r²·log r; the factor-2
    # variant was only invisible because zero-init fc2 makes the fiducials
    # affine, zeroing every rbf coefficient)
    rbf = np.square(rbf_norm) * np.log(rbf_norm + 1e-6)
    P_hat = np.concatenate([np.ones((n, 1)), P, rbf[..., 0]], axis=1)
    return inv_delta_C.astype(np.float32), P_hat.astype(np.float32)


class LocalizationNetwork(nn.Module):
    """Predicts the F fiducial points (transformation.py:42-83)."""

    F: int = 20

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b = x.shape[0]
        for i, ch in enumerate((64, 128, 256, 512)):
            x = _conv(ch, name=f"conv{i}")(x)
            x = _bn(f"bn{i}")(x)
            x = nn.relu(x)
            if i < 3:
                x = nn.max_pool(x, (2, 2), (2, 2))
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool → (B, 512)
        x = nn.relu(Dense(256, name="fc1")(x))
        # fc2 init: zero weights, fiducial-grid bias (RARE Fig. 6a)
        ctrl_x = np.linspace(-1.0, 1.0, self.F // 2)
        top = np.stack([ctrl_x, np.linspace(0.0, -1.0, self.F // 2)], 1)
        bot = np.stack([ctrl_x, np.linspace(1.0, 0.0, self.F // 2)], 1)
        bias0 = np.concatenate([top, bot], 0).reshape(-1).astype(np.float32)
        w = self.param("fc2_kernel", nn.initializers.zeros, (256, self.F * 2))
        bb = self.param("fc2_bias", lambda k: jnp.asarray(bias0))
        out = x @ w + bb
        return out.reshape(b, self.F, 2)


class TPSSpatialTransformer(nn.Module):
    F: int = 20
    out_size: Tuple[int, int] = (32, 100)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.out_size
        c_prime = LocalizationNetwork(self.F, name="loc")(x)  # (B, F, 2)
        inv_delta_C, P_hat = build_tps_constants(self.F, h, w)
        b = x.shape[0]
        zeros = jnp.zeros((b, 3, 2), c_prime.dtype)
        cp = jnp.concatenate([c_prime, zeros], axis=1)  # (B, F+3, 2)
        T = jnp.einsum("ij,bjk->bik", jnp.asarray(inv_delta_C), cp)
        grid = jnp.einsum("nj,bjk->bnk", jnp.asarray(P_hat), T)  # (B, n, 2)
        grid = grid.reshape(b, h, w, 2)
        return grid_sample_bilinear(x, grid)


# ---------------------------------------------------------------------------
# FAN ResNet feature extractor
# ---------------------------------------------------------------------------


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        h = _conv(self.planes, s=self.stride, name="conv1")(x)
        h = _bn("bn1")(h)
        h = nn.relu(h)
        h = _conv(self.planes, name="conv2")(h)
        h = _bn("bn2")(h)
        if self.downsample or x.shape[-1] != self.planes or self.stride != 1:
            # the identity conv must stride with conv1 or the residual add
            # shape-mismatches for stride>1 blocks
            identity = _conv(self.planes, k=1, p=0, s=self.stride, name="down_conv")(x)
            identity = _bn("down_bn")(identity)
        return nn.relu(h + identity)


class FANResNet(nn.Module):
    """feature_extraction.py ResNet, layers [1, 2, 5, 3]."""

    output_channel: int = 512

    @nn.compact
    def __call__(self, x: Array) -> Array:
        oc = self.output_channel
        blocks = [oc // 4, oc // 2, oc, oc]
        x = nn.relu(_bn("bn0_1")(_conv(oc // 16, name="conv0_1")(x)))
        x = nn.relu(_bn("bn0_2")(_conv(oc // 8, name="conv0_2")(x)))

        x = nn.max_pool(x, (2, 2), (2, 2))
        for i in range(1):
            x = BasicBlock(blocks[0], name=f"layer1_{i}")(x)
        x = nn.relu(_bn("bn1")(_conv(blocks[0], name="conv1")(x)))

        x = nn.max_pool(x, (2, 2), (2, 2))
        for i in range(2):
            x = BasicBlock(blocks[1], name=f"layer2_{i}")(x)
        x = nn.relu(_bn("bn2")(_conv(blocks[1], name="conv2")(x)))

        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = nn.max_pool(x, (2, 2), (2, 1))
        for i in range(5):
            x = BasicBlock(blocks[2], name=f"layer3_{i}")(x)
        x = nn.relu(_bn("bn3")(_conv(blocks[2], name="conv3")(x)))

        for i in range(3):
            x = BasicBlock(blocks[3], name=f"layer4_{i}")(x)
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = nn.relu(_bn("bn4_1")(nn.Conv(blocks[3], (2, 2), strides=(2, 1),
                                          padding="VALID", use_bias=False,
                                          param_dtype=jnp.float32, name="conv4_1")(x)))
        x = nn.relu(_bn("bn4_2")(nn.Conv(blocks[3], (2, 2), strides=(1, 1),
                                          padding="VALID", use_bias=False,
                                          param_dtype=jnp.float32, name="conv4_2")(x)))
        return x  # (B, 1, W', C)


# ---------------------------------------------------------------------------
# Attention decoder
# ---------------------------------------------------------------------------


class AttentionCell(nn.Module):
    """prediction.py:54-76 — additive attention + LSTM cell."""

    hidden: int = 256

    @nn.compact
    def __call__(self, carry, batch_H, char_emb):
        h_prev, c_prev = carry
        proj_H = Dense(self.hidden, use_bias=False, name="i2h")(batch_H)
        proj_h = Dense(self.hidden, name="h2h")(h_prev)[:, None]
        e = Dense(1, use_bias=False, name="score")(jnp.tanh(proj_H + proj_h))
        alpha = jax.nn.softmax(e, axis=1)  # (B, T, 1)
        context = jnp.sum(alpha * batch_H, axis=1)  # (B, C)
        inp = jnp.concatenate([context, char_emb], axis=-1)
        (c_new, h_new), _ = nn.OptimizedLSTMCell(self.hidden, name="rnn")(
            (c_prev, h_prev), inp
        )
        return (h_new, c_new), alpha


class AttentionDecoder(nn.Module):
    """prediction.py:6-51: teacher-forced when `text` given, greedy else."""

    num_class: int
    hidden: int = 256
    num_char_embeddings: int = 256

    @nn.compact
    def __call__(self, batch_H, text: Optional[Array], max_label_length: int = 25):
        b = batch_H.shape[0]
        num_steps = max_label_length + 1
        cell = AttentionCell(self.hidden, name="cell")
        embed = nn.Embed(self.num_class, self.num_char_embeddings,
                         param_dtype=jnp.float32, name="char_embeddings")
        gen = Dense(self.num_class, name="generator")

        carry = (jnp.zeros((b, self.hidden)), jnp.zeros((b, self.hidden)))
        probs = []
        if text is not None:  # teacher forcing
            for i in range(num_steps):
                carry, _ = cell(carry, batch_H, embed(text[:, i]))
                probs.append(gen(carry[0]))
        else:  # greedy
            targets = jnp.zeros((b,), jnp.int32)  # [SOS]/[GO] id 0
            for i in range(num_steps):
                carry, _ = cell(carry, batch_H, embed(targets))
                p = gen(carry[0])
                probs.append(p)
                targets = jnp.argmax(p, axis=-1).astype(jnp.int32)
        return jnp.stack(probs, axis=1)


class TRBA(nn.Module):
    """model.py:9-55 — full pipeline on (B, 32, 128, 3) inputs."""

    num_class: int = 96  # charset + [GO]/[s] specials
    max_label_length: int = 25
    num_fiducial: int = 20
    output_channel: int = 512
    hidden: int = 256
    img_size: Tuple[int, int] = (32, 128)
    use_ctc: bool = False

    @nn.compact
    def __call__(self, x: Array, text: Optional[Array] = None) -> Array:
        from .str_models import BiLSTM

        x = TPSSpatialTransformer(self.num_fiducial, self.img_size, name="tps")(x)
        feat = FANResNet(self.output_channel, name="resnet")(x)  # (B, 1, W', C)
        feat = jnp.mean(feat, axis=1)  # adaptive pool over height → (B, W', C)
        feat = BiLSTM(self.hidden, self.hidden, name="rnn0")(feat)
        feat = BiLSTM(self.hidden, self.hidden, name="rnn1")(feat)
        if self.use_ctc:
            return Dense(self.num_class, name="ctc_head")(feat)
        return AttentionDecoder(self.num_class, self.hidden, name="attn")(
            feat, text, self.max_label_length
        )
