"""PARSeq scene-text recognizer (frozen OCR evaluator / loss), TPU-native.

Parity: src/parseq/strhub/models/parseq/{modules,system}.py and
strhub/data/utils.py (Tokenizer). PARSeq-base: ViT encoder over 32×128
(patch 4×8, dim 384, depth 12, heads 6) + a single two-stream pre-LN decoder
layer (heads 12), AR greedy decoding with one cloze refinement iteration
(hubconf.py:18-26 defaults).

TPU redesign of the decode loop (system.py:109-151): the torch loop grows the
context and early-exits on EOS; here the context is a fixed (max_len+1) buffer
updated by `lax.dynamic_update_slice` inside a `lax.scan`, with additive key
masks reproducing the causal structure — constant shapes, one compiled step.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Dense, matmul_precision
from .vit import ViTEncoder

Array = jax.Array
Dtype = Any

# PARSeq training charset (src/parseq/configs/charset/94_full.yaml) — its own
# ordering, distinct from udifftext_tpu.charset.CHARSET.
PARSEQ_CHARSET = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
)

NEG_INF = -1e9


class ParseqTokenizer:
    """strhub/data/utils.py:100-128: EOS first (id 0), charset, BOS, PAD."""

    def __init__(self, charset: str = PARSEQ_CHARSET):
        self.itos = ("[E]",) + tuple(charset) + ("[B]", "[P]")
        self.stoi = {s: i for i, s in enumerate(self.itos)}
        self.eos_id = 0
        self.bos_id = self.stoi["[B]"]
        self.pad_id = self.stoi["[P]"]

    def __len__(self):
        return len(self.itos)

    def encode(self, labels: Sequence[str], max_length: int = 25) -> np.ndarray:
        """(B, max_length + 2) int32: [BOS, chars, EOS, PAD...]."""
        out = np.full((len(labels), max_length + 2), self.pad_id, np.int32)
        for i, y in enumerate(labels):
            chars = [self.stoi[c] for c in y if c in self.stoi]
            # fixed-width encode: truncate over-long labels instead of
            # overflowing the row (the reference pads to the batch max and
            # never over-runs; labels are normally pre-filtered to max_length)
            ids = [self.bos_id] + chars[:max_length] + [self.eos_id]
            out[i, : len(ids)] = ids
        return out

    def decode_ids(self, ids: np.ndarray) -> List[str]:
        """Greedy ids (B, L) → strings truncated at the first EOS."""
        labels = []
        for row in np.asarray(ids):
            chars = []
            for i in row:
                if i == self.eos_id:
                    break
                if 0 < i < self.bos_id:
                    chars.append(self.itos[i])
            labels.append("".join(chars))
        return labels


class TorchMHA(nn.Module):
    """torch nn.MultiheadAttention with packed in_proj, additive attn_mask and
    boolean key_padding_mask semantics."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        attn_mask: Optional[Array] = None,
        key_padding_mask: Optional[Array] = None,
    ) -> Array:
        d = query.shape[-1]
        h = self.num_heads
        dh = d // h
        w = self.param("in_proj_kernel", nn.initializers.lecun_normal(), (d, 3 * d))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        prec = matmul_precision(self.dtype)
        q = query @ w[:, :d].astype(query.dtype) + b[:d].astype(query.dtype)
        k = key @ w[:, d : 2 * d].astype(query.dtype) + b[d : 2 * d].astype(query.dtype)
        v = value @ w[:, 2 * d :].astype(query.dtype) + b[2 * d :].astype(query.dtype)

        bsz, lq = q.shape[:2]
        lk = k.shape[1]
        q = q.reshape(bsz, lq, h, dh)
        k = k.reshape(bsz, lk, h, dh)
        v = v.reshape(bsz, lk, h, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=prec) / math.sqrt(dh)
        logits = logits.astype(jnp.float32)
        if attn_mask is not None:
            logits = logits + attn_mask[None, None].astype(jnp.float32)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], NEG_INF, logits
            )
        wts = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", wts, v, precision=prec).reshape(bsz, lq, d)
        return Dense(d, dtype=self.dtype, name="out_proj")(out)


def _ln(name: str):
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class ParseqDecoderLayer(nn.Module):
    """Two-stream pre-LN decoder layer (modules.py:27-82)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = TorchMHA(self.num_heads, dtype=self.dtype, name="self_attn")
        self.cross_attn = TorchMHA(self.num_heads, dtype=self.dtype, name="cross_attn")
        self.linear1 = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")
        self.linear2 = Dense(self.d_model, dtype=self.dtype, name="linear2")
        self.norm1 = _ln("norm1")
        self.norm2 = _ln("norm2")
        self.norm_q = _ln("norm_q")
        self.norm_c = _ln("norm_c")

    def _fln(self, norm, x):
        return norm(x.astype(jnp.float32)).astype(x.dtype)

    def forward_stream(self, tgt, tgt_norm, tgt_kv, memory, tgt_mask, kp_mask):
        t2 = self.self_attn(tgt_norm, tgt_kv, tgt_kv, attn_mask=tgt_mask, key_padding_mask=kp_mask)
        tgt = tgt + t2
        t2 = self.cross_attn(self._fln(self.norm1, tgt), memory, memory)
        tgt = tgt + t2
        h = self.linear1(self._fln(self.norm2, tgt))
        h = nn.gelu(h, approximate=False)
        return tgt + self.linear2(h)

    def __call__(
        self, query, content, memory,
        query_mask=None, content_mask=None, content_key_padding_mask=None,
        update_content: bool = True,
    ):
        query_norm = self._fln(self.norm_q, query)
        content_norm = self._fln(self.norm_c, content)
        query = self.forward_stream(
            query, query_norm, content_norm, memory, query_mask, content_key_padding_mask
        )
        if update_content:
            content = self.forward_stream(
                content, content_norm, content_norm, memory, content_mask,
                content_key_padding_mask,
            )
        return query, content


class PARSeq(nn.Module):
    """PARSeq-base inference model."""

    max_label_length: int = 25
    img_size: Tuple[int, int] = (32, 128)
    patch_size: Tuple[int, int] = (4, 8)
    embed_dim: int = 384
    enc_depth: int = 12
    enc_num_heads: int = 6
    enc_mlp_ratio: float = 4.0
    dec_depth: int = 1
    dec_num_heads: int = 12
    dec_mlp_ratio: float = 4.0
    num_tokens: int = len(PARSEQ_CHARSET) + 3  # 97
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = ViTEncoder(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.enc_depth,
            num_heads=self.enc_num_heads,
            mlp_ratio=self.enc_mlp_ratio,
            class_token=False,
            dtype=self.dtype,
            name="encoder",
        )
        self.layers = [
            ParseqDecoderLayer(
                self.embed_dim,
                self.dec_num_heads,
                int(self.embed_dim * self.dec_mlp_ratio),
                dtype=self.dtype,
                name=f"decoder_layers_{i}",
            )
            for i in range(self.dec_depth)
        ]
        self.decoder_norm = _ln("decoder_norm")
        self.head = Dense(self.num_tokens - 2, dtype=self.dtype, name="head")
        self.text_embed = nn.Embed(
            self.num_tokens, self.embed_dim, param_dtype=jnp.float32, name="text_embed"
        )
        self.pos_queries = self.param(
            "pos_queries",
            nn.initializers.truncated_normal(0.02),
            (1, self.max_label_length + 1, self.embed_dim),
        )

    @property
    def bos_id(self):
        return self.num_tokens - 2

    @property
    def eos_id(self):
        return 0

    @property
    def pad_id(self):
        return self.num_tokens - 1

    def encode(self, images: Array) -> Array:
        """images (B, 32, 128, 3), normalized (x*2-1 range)."""
        return self.encoder(images)

    def _embed_context(self, tgt: Array) -> Array:
        """system.py:87-93: null (BOS) context + positional char embeddings."""
        l = tgt.shape[1]
        scale = math.sqrt(self.embed_dim)
        null_ctx = scale * self.text_embed(tgt[:, :1]).astype(self.dtype)
        if l > 1:
            emb = scale * self.text_embed(tgt[:, 1:]).astype(self.dtype)
            emb = self.pos_queries[:, : l - 1].astype(self.dtype) + emb
            return jnp.concatenate([null_ctx, emb], axis=1)
        return null_ctx

    def decode(
        self,
        tgt: Array,
        memory: Array,
        tgt_mask: Optional[Array] = None,
        tgt_padding_mask: Optional[Array] = None,
        tgt_query: Optional[Array] = None,
        tgt_query_mask: Optional[Array] = None,
    ) -> Array:
        bsz, l = tgt.shape
        content = self._embed_context(tgt)
        if tgt_query is None:
            tgt_query = jnp.broadcast_to(
                self.pos_queries[:, :l].astype(self.dtype), (bsz, l, self.embed_dim)
            )
        query = tgt_query
        for i, layer in enumerate(self.layers):
            last = i == len(self.layers) - 1
            query, content = layer(
                query, content, memory,
                query_mask=tgt_query_mask, content_mask=tgt_mask,
                content_key_padding_mask=tgt_padding_mask,
                update_content=not last,
            )
        return self.decoder_norm(query.astype(jnp.float32)).astype(self.dtype)

    def __call__(self, images: Array, refine_iters: int = 1) -> Array:
        """Full read: AR greedy decode + cloze refinement → logits
        (B, max_label_length + 1, num_tokens - 2)."""
        bsz = images.shape[0]
        num_steps = self.max_label_length + 1
        memory = self.encode(images)
        pos_q = jnp.broadcast_to(
            self.pos_queries[:, :num_steps].astype(self.dtype),
            (bsz, num_steps, self.embed_dim),
        )

        # fixed-shape AR decode: step i queries position i over context 0..i
        causal = jnp.triu(jnp.full((num_steps, num_steps), NEG_INF, jnp.float32), 1)

        tgt_in = jnp.full((bsz, num_steps), self.pad_id, jnp.int32)
        tgt_in = tgt_in.at[:, 0].set(self.bos_id)
        logits = jnp.zeros((bsz, num_steps, self.num_tokens - 2), jnp.float32)

        # unrolled fixed-shape AR decode: step i queries position i with keys
        # masked to 0..i; each step is one tiny 1-layer decoder evaluation
        for i in range(num_steps):
            out = self.decode(
                tgt_in, memory, tgt_mask=causal,
                tgt_query=pos_q[:, i : i + 1],
                tgt_query_mask=causal[i : i + 1],
            )
            p_i = self.head(out).astype(jnp.float32)  # (B, 1, C)
            logits = logits.at[:, i].set(p_i[:, 0])
            if i + 1 < num_steps:
                nxt = jnp.argmax(p_i[:, 0], axis=-1).astype(jnp.int32)
                tgt_in = tgt_in.at[:, i + 1].set(nxt)

        # cloze refinement (system.py:139-151)
        if refine_iters:
            qm = causal.copy()
            triu2 = jnp.triu(jnp.ones((num_steps, num_steps), bool), 2)
            query_mask = jnp.where(triu2, 0.0, qm)
            bos = jnp.full((bsz, 1), self.bos_id, jnp.int32)
            for _ in range(refine_iters):
                prev = jnp.argmax(logits[:, :-1], axis=-1).astype(jnp.int32)
                tgt_in = jnp.concatenate([bos, prev], axis=1)
                pad_mask = jnp.cumsum((tgt_in == self.eos_id).astype(jnp.int32), axis=-1) > 0
                out = self.decode(
                    tgt_in, memory, tgt_mask=causal, tgt_padding_mask=pad_mask,
                    tgt_query=pos_q, tgt_query_mask=query_mask,
                )
                logits = self.head(out).astype(jnp.float32)
        return logits

    def forward_logits(self, images: Array, tgt_in: Array) -> Array:
        """Teacher-forced logits for the OCR loss (predictors/model.py:40-57):
        canonical causal decode over the provided context."""
        num = tgt_in.shape[1]
        memory = self.encode(images)
        causal = jnp.triu(jnp.full((num, num), NEG_INF, jnp.float32), 1)
        out = self.decode(tgt_in, memory, tgt_mask=causal, tgt_query_mask=causal)
        return self.head(out).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Permutation-language-modeling training (system.py:154-259)
# ---------------------------------------------------------------------------


def gen_tgt_perms(
    rng: np.random.Generator,
    max_num_chars: int,
    perm_num: int = 6,
    perm_forward: bool = True,
    perm_mirrored: bool = True,
) -> np.ndarray:
    """Shared batch permutations incl. BOS/EOS positions (system.py:154-226).

    Host-side (numpy) — permutations are data fed into the jitted loss.
    Returns (n_perms, max_num_chars + 2) int32.
    """
    import itertools
    import math as _math

    if max_num_chars == 1:
        return np.arange(3, dtype=np.int32)[None]

    perms = [np.arange(max_num_chars)] if perm_forward else []
    max_gen_perms = perm_num // 2 if perm_mirrored else perm_num
    max_perms = _math.factorial(max_num_chars)
    if perm_mirrored:
        max_perms //= 2
    num_gen_perms = min(max_gen_perms, max_perms)

    if max_num_chars < 5:
        if max_num_chars == 4 and perm_mirrored:
            selector = [0, 3, 4, 6, 9, 10, 12, 16, 17, 18, 19, 21]
        else:
            selector = list(range(max_perms))
        pool = np.asarray(list(itertools.permutations(range(max_num_chars))))[selector]
        if perm_forward:
            pool = pool[1:]
        perms = np.stack(perms)
        if len(pool):
            i = rng.choice(len(pool), size=num_gen_perms - len(perms), replace=False)
            perms = np.concatenate([perms, pool[i]])
    else:
        perms.extend(
            rng.permutation(max_num_chars) for _ in range(num_gen_perms - len(perms))
        )
        perms = np.stack(perms)

    if perm_mirrored:
        comp = perms[:, ::-1]
        perms = np.stack([perms, comp], axis=1).reshape(-1, max_num_chars)

    bos_idx = np.zeros((len(perms), 1), perms.dtype)
    eos_idx = np.full((len(perms), 1), max_num_chars + 1, perms.dtype)
    perms = np.concatenate([bos_idx, perms + 1, eos_idx], axis=1)
    if len(perms) > 1:
        # reverse-direction special handling (system.py:219-221)
        perms[1, 1:] = max_num_chars + 1 - np.arange(max_num_chars + 1)
    return perms.astype(np.int32)


def attn_masks_from_perm(perm: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(content_mask, query_mask) additive -inf masks (system.py:228-242)."""
    sz = perm.shape[0]
    mask = np.zeros((sz, sz), np.float32)
    for i in range(sz):
        mask[perm[i], perm[i + 1 :]] = NEG_INF
    content_mask = mask[:-1, :-1].copy()
    mask[np.eye(sz, dtype=bool)] = NEG_INF
    query_mask = mask[1:, :-1]
    return content_mask, query_mask


def perm_attn_masks(perms: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Stacked (content_masks, query_masks) for a batch of permutations —
    host-side, so a jitted train step can take the masks as plain array
    arguments (perms themselves must be concrete for mask construction)."""
    cms, qms = zip(*(attn_masks_from_perm(np.asarray(p)) for p in perms))
    return np.stack(cms), np.stack(qms)


def parseq_training_loss(
    model: "PARSeq",
    params,
    images: Array,
    label_ids: Array,
    perms: Optional[np.ndarray] = None,
    content_masks: Optional[Array] = None,
    query_masks: Optional[Array] = None,
) -> Array:
    """Permuted-AR CE loss (system.py:244-259): average the teacher-forced CE
    over the sampled permutations; EOS targets only count for the first
    (forward) and second (reverse) orderings.

    Pass either concrete `perms` (eager use) or precomputed
    `content_masks`/`query_masks` from perm_attn_masks (jit-friendly: the
    masks are traced array args, only their static count shapes the loop)."""
    if content_masks is None or query_masks is None:
        content_masks, query_masks = perm_attn_masks(np.asarray(perms))
    tok_pad = model.num_tokens - 1
    tok_eos = 0
    tgt_in = label_ids[:, :-1]
    tgt_out0 = label_ids[:, 1:]
    tgt_padding_mask = jnp.logical_or(tgt_in == tok_pad, tgt_in == tok_eos)
    memory = model.apply(params, images, method=PARSeq.encode)

    loss = 0.0
    loss_numel = 0.0
    tgt_out = tgt_out0
    n = jnp.sum(tgt_out != tok_pad)
    for i in range(content_masks.shape[0]):
        content_mask, query_mask = content_masks[i], query_masks[i]
        out = model.apply(
            params, tgt_in, memory,
            jnp.asarray(content_mask), tgt_padding_mask, None, jnp.asarray(query_mask),
            method=PARSeq.decode,
        )
        logits = model.apply(params, out, method=lambda m, o: m.head(o)).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt_idx = jnp.clip(tgt_out, 0, logits.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, tgt_idx[..., None], -1)[..., 0]
        valid = tgt_out != tok_pad
        loss = loss + n * jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
        loss_numel = loss_numel + n
        if i == 1:
            tgt_out = jnp.where(tgt_out == tok_eos, tok_pad, tgt_out)
            n = jnp.sum(tgt_out != tok_pad)
    return loss / loss_numel
