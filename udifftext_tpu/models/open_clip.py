"""Native OpenCLIP towers (text transformer + vision transformer).

Parity targets: the reference's FrozenOpenCLIPEmbedder /
FrozenOpenCLIPEmbedder2 (sgm/modules/encoders/modules.py:436-609) and
FrozenOpenCLIPImageEmbedder (:612-769), which wrap
`open_clip.create_model_and_transforms("ViT-H-14")`. The open_clip package
and its pretrained weights are not in this image, so the towers are
re-stated natively in flax (the same recipe as models/inception.py /
models/lpips.py) and load an open_clip torch state dict through
`utils/ckpt_torch.convert_open_clip` when one is present.

Architecture (open_clip model/transformer.py, ViT-H-14 defaults):
  text:   token_embedding(49408, 1024) + positional_embedding(77) →
          24 pre-LN ResidualAttentionBlocks (heads 16, MLP 4x, exact GELU,
          causal mask) → ln_final → eot-pooled @ text_projection
  visual: conv1 patchify (14x14/14, no bias) + class token +
          positional_embedding(257) → ln_pre → 32 blocks (width 1280,
          heads 16) → ln_post on the class token → @ proj (1024)

torch nn.MultiheadAttention packed-projection semantics come from
models/parseq.TorchMHA; LayerNorms run in fp32 like the rest of the repo.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Dense, matmul_precision
from .parseq import TorchMHA, _ln

Array = jax.Array
Dtype = Any

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class ResidualAttentionBlock(nn.Module):
    """open_clip transformer.ResidualAttentionBlock: pre-LN MHA + MLP with
    exact (erf) GELU."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln_1 = _ln("ln_1")
        self.attn = TorchMHA(self.heads, dtype=self.dtype, name="attn")
        self.ln_2 = _ln("ln_2")
        self.c_fc = Dense(int(self.width * self.mlp_ratio), dtype=self.dtype, name="c_fc")
        self.c_proj = Dense(self.width, dtype=self.dtype, name="c_proj")

    def _fln(self, norm, x):
        return norm(x.astype(jnp.float32)).astype(x.dtype)

    def __call__(self, x: Array, attn_mask: Optional[Array] = None) -> Array:
        h = self._fln(self.ln_1, x)
        x = x + self.attn(h, h, h, attn_mask=attn_mask)
        h = self.c_fc(self._fln(self.ln_2, x))
        h = nn.gelu(h, approximate=False)
        return x + self.c_proj(h)


class OpenClipTextTransformer(nn.Module):
    """The text tower. `encode` returns both the last and penultimate hidden
    states (NLD) so one forward serves FrozenOpenCLIPEmbedder's stop-early
    `penultimate` and FrozenOpenCLIPEmbedder2's capture-before-last — the two
    are numerically identical."""

    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    embed_dim: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        self.token_embedding = nn.Embed(
            self.vocab_size, self.width, param_dtype=jnp.float32,
            name="token_embedding",
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        self.resblocks = [
            ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype, name=f"resblocks_{i}"
            )
            for i in range(self.layers)
        ]
        self.ln_final = _ln("ln_final")
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )

    def causal_mask(self, n: int) -> Array:
        # open_clip build_attention_mask: -inf above the diagonal
        return jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), 1)

    def encode(self, ids: Array) -> Dict[str, Array]:
        """ids (B, L<=context_length) int32 → {"last", "penultimate"} hidden
        states (B, L, width), neither ln_final'd (modules.py:521-531)."""
        x = self.token_embedding(ids).astype(self.dtype)
        x = x + self.positional_embedding[: x.shape[1]].astype(x.dtype)
        mask = self.causal_mask(x.shape[1])
        penultimate = x
        for i, block in enumerate(self.resblocks):
            if i == len(self.resblocks) - 1:
                penultimate = x
            x = block(x, attn_mask=mask)
        return {"last": x, "penultimate": penultimate}

    def final_ln(self, x: Array) -> Array:
        return self.ln_final(x.astype(jnp.float32)).astype(x.dtype)

    def pool(self, x_ln: Array, ids: Array) -> Array:
        """EOT pooling (modules.py:510-516): feature at argmax(ids) through
        the text projection."""
        eot = jnp.argmax(ids, axis=-1)
        feats = jnp.take_along_axis(x_ln, eot[:, None, None], axis=1)[:, 0]
        return jnp.matmul(
            feats, self.text_projection.astype(feats.dtype),
            precision=matmul_precision(feats.dtype),
        )

    def __call__(
        self, ids: Array, layer: str = "last", legacy: bool = True,
        return_pooled: bool = False,
    ):
        """FrozenOpenCLIPEmbedder semantics when legacy=True (ln_final applied
        to the chosen layer, modules.py:589-601); FrozenOpenCLIPEmbedder2
        semantics when legacy=False (only `last` is ln_final'd; optional EOT
        pooled output, modules.py:495-516)."""
        states = self.encode(ids)
        if legacy:
            return self.final_ln(states[layer])
        last_ln = self.final_ln(states["last"])
        out = last_ln if layer == "last" else states[layer]
        if return_pooled:
            return out, self.pool(last_ln, ids)
        return out


class OpenClipVisionTransformer(nn.Module):
    """The vision tower (open_clip VisionTransformer). Returns the projected
    class-token embedding; with output_tokens also the patch tokens
    (pre-ln_post/proj, open_clip's output_tokens contract)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    heads: int = 16
    layers: int = 32
    output_dim: int = 1024
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv1 = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            precision=matmul_precision(self.dtype), name="conv1",
        )
        grid = self.image_size // self.patch_size
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(self.width ** -0.5),
            (self.width,),
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(self.width ** -0.5),
            (grid * grid + 1, self.width),
        )
        self.ln_pre = _ln("ln_pre")
        self.resblocks = [
            ResidualAttentionBlock(
                self.width, self.heads, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, name=f"resblocks_{i}",
            )
            for i in range(self.layers)
        ]
        self.ln_post = _ln("ln_post")
        self.proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.output_dim),
        )

    def __call__(self, x: Array, output_tokens: bool = False):
        """x (B, H, W, 3) already clip-preprocessed."""
        h = self.conv1(x.astype(self.dtype))
        b = h.shape[0]
        h = h.reshape(b, -1, self.width)
        cls = jnp.broadcast_to(
            self.class_embedding.astype(h.dtype), (b, 1, self.width)
        )
        h = jnp.concatenate([cls, h], axis=1)
        h = h + self.positional_embedding.astype(h.dtype)
        h = self.ln_pre(h.astype(jnp.float32)).astype(h.dtype)
        for block in self.resblocks:
            h = block(h)
        pooled = self.ln_post(h[:, 0].astype(jnp.float32)).astype(h.dtype)
        pooled = jnp.matmul(
            pooled, self.proj.astype(pooled.dtype),
            precision=matmul_precision(pooled.dtype),
        )
        if output_tokens:
            return pooled, h[:, 1:]
        return pooled


def clip_preprocess(x: Array, antialias: bool = True, size: int = 224) -> Array:
    """FrozenOpenCLIPImageEmbedder.preprocess (modules.py:660-672): bicubic
    resize to 224², [-1, 1] → [0, 1], CLIP mean/std normalization.

    The reference resizes with kornia align_corners=True; jax.image.resize
    uses the half-pixel convention — a sub-pixel sampling difference
    documented as tolerance (images at 224² already bypass the resize).
    """
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(
            x, (x.shape[0], size, size, x.shape[3]), method="cubic",
            antialias=antialias,
        )
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# sgm embedder wrappers (weight-gated like CLIP/T5 — embedders.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FrozenOpenCLIPTextEmbedder:
    """FrozenOpenCLIPEmbedder / FrozenOpenCLIPEmbedder2 (modules.py:436-609)
    over the native tower. `params` must be loaded (convert_open_clip) or
    init'd; `tokenize` needs the CLIP BPE vocab (see SimpleTokenizer)."""

    model: OpenClipTextTransformer = dataclasses.field(
        default_factory=OpenClipTextTransformer
    )
    max_length: int = 77
    layer: str = "last"
    legacy: bool = True
    always_return_pooled: bool = False
    params: Optional[Dict] = None
    tokenizer: Optional["SimpleTokenizer"] = None

    def init(self, rng):
        self.params = self.model.init(
            rng, jnp.zeros((1, self.max_length), jnp.int32)
        )
        return self.params

    def __call__(self, text_or_ids):
        assert self.params is not None, "load convert_open_clip weights or init() first"
        if isinstance(text_or_ids, str):
            # open_clip.tokenize accepts Union[str, List[str]]
            text_or_ids = [text_or_ids]
        if isinstance(text_or_ids, (list, tuple)) and (
            not text_or_ids or isinstance(text_or_ids[0], str)
        ):
            assert self.tokenizer is not None, (
                "string input needs the CLIP BPE vocab — construct with "
                "tokenizer=SimpleTokenizer(vocab_path)"
            )
            ids = self.tokenizer.tokenize(list(text_or_ids), self.max_length)
        else:
            ids = text_or_ids
        return self.model.apply(
            self.params, jnp.asarray(ids), layer=self.layer, legacy=self.legacy,
            return_pooled=self.always_return_pooled,
        )


@dataclasses.dataclass
class FrozenOpenCLIPImageEmbedder:
    """FrozenOpenCLIPImageEmbedder (modules.py:612-769) over the native
    vision tower: clip-preprocess → class-token embedding, with the output
    reshaping modes the reference exposes. Per-embedder ucg dropout is
    applied uniformly by the conditioner (conditioning.py), matching how the
    reference's GeneralConditioner drives it."""

    model: OpenClipVisionTransformer = dataclasses.field(
        default_factory=OpenClipVisionTransformer
    )
    antialias: bool = True
    max_length: int = 77
    unsqueeze_dim: bool = False
    repeat_to_max_len: bool = False
    output_tokens: bool = False
    params: Optional[Dict] = None

    def init(self, rng):
        s = self.model.image_size
        self.params = self.model.init(rng, jnp.zeros((1, s, s, 3)))
        return self.params

    def __call__(self, image: Array):
        assert self.params is not None, "load convert_open_clip weights or init() first"
        x = clip_preprocess(image, antialias=self.antialias, size=self.model.image_size)
        out = self.model.apply(self.params, x, output_tokens=self.output_tokens)
        if self.output_tokens:
            z, tokens = out
            return tokens, z  # reference returns (tokens, pooled) (:706-709)
        z = out
        if self.unsqueeze_dim:
            z = z[:, None, :]
        if self.repeat_to_max_len:
            z_ = z[:, None, :] if z.ndim == 2 else z
            return jnp.broadcast_to(
                z_, (z_.shape[0], self.max_length, z_.shape[-1])
            ), z
        return z


# ---------------------------------------------------------------------------
# CLIP BPE tokenizer (open_clip.tokenize), gated on the public vocab file
# ---------------------------------------------------------------------------


def _bytes_to_unicode():
    """GPT-2/CLIP byte↔unicode table (public algorithm)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class SimpleTokenizer:
    """open_clip.tokenizer.SimpleTokenizer semantics over the public
    `bpe_simple_vocab_16e6.txt.gz` merges file (place it at
    $UDIFFTEXT_CLIP_BPE or ./checkpoints/clip/bpe_simple_vocab_16e6.txt.gz).
    ftfy is not in this image; cleaning is html-unescape + whitespace
    collapse, which matches ftfy output for already-well-formed text."""

    def __init__(self, bpe_path: Optional[str] = None, context_length: int = 77):
        import gzip
        import html
        import os

        import regex

        path = bpe_path or os.environ.get(
            "UDIFFTEXT_CLIP_BPE", "./checkpoints/clip/bpe_simple_vocab_16e6.txt.gz"
        )
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"CLIP BPE vocab not found at {path}; set UDIFFTEXT_CLIP_BPE "
                "or pass token ids directly"
            )
        self._html = html
        self.byte_encoder = _bytes_to_unicode()
        merges = gzip.open(path).read().decode("utf-8").split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<start_of_text>", "<end_of_text>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<start_of_text>": "<start_of_text>",
            "<end_of_text>": "<end_of_text>",
        }
        self.pat = regex.compile(
            r"<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE,
        )
        self.sot = self.encoder["<start_of_text>"]
        self.eot = self.encoder["<end_of_text>"]
        self.context_length = context_length

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = set(zip(word, word[1:]))
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = set(zip(word, word[1:]))
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode_text(self, text: str):
        text = self._html.unescape(self._html.unescape(text))
        text = " ".join(text.strip().split()).lower()
        ids = []
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def tokenize(self, texts, context_length: Optional[int] = None) -> np.ndarray:
        n = context_length or self.context_length
        out = np.zeros((len(texts), n), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode_text(text)[: n - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out
