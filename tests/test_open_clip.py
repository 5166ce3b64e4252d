"""Native OpenCLIP towers (models/open_clip.py): converter forward parity
against torch re-statements with the exact open_clip state-dict key layout
(token_embedding / transformer.resblocks.{i}.{ln_1,attn,ln_2,mlp.c_fc,
mlp.c_proj} / ln_final / text_projection; visual.{conv1,class_embedding,
positional_embedding,ln_pre,transformer,ln_post,proj}), plus the sgm wrapper
semantics (FrozenOpenCLIPEmbedder layer/legacy/pooled modes,
FrozenOpenCLIPImageEmbedder preprocessing + output modes) and the BPE
tokenizer machinery.

open_clip is NOT installed; the torch modules below re-state its public
architecture (open_clip model/transformer.py) so random-init state dicts
exercise utils/ckpt_torch.convert_open_clip like a published weight file
would — the test_metrics.py recipe.
"""

import os
from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from udifftext_tpu.models.open_clip import (
    CLIP_MEAN,
    CLIP_STD,
    FrozenOpenCLIPImageEmbedder,
    FrozenOpenCLIPTextEmbedder,
    OpenClipTextTransformer,
    OpenClipVisionTransformer,
    SimpleTokenizer,
    clip_preprocess,
)
from udifftext_tpu.utils.ckpt_torch import convert_open_clip


# ---------------------------------------------------------------------------
# torch re-statement of the open_clip towers (state-dict-exact key layout)
# ---------------------------------------------------------------------------


class TResBlock(tnn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(width)
        self.attn = tnn.MultiheadAttention(width, heads)
        self.ln_2 = tnn.LayerNorm(width)
        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(width, width * 4)),
            ("gelu", tnn.GELU()),
            ("c_proj", tnn.Linear(width * 4, width)),
        ]))

    def forward(self, x, attn_mask=None):
        # LND layout, like open_clip
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)[0]
        return x + self.mlp(self.ln_2(x))


class TTransformer(tnn.Module):
    def __init__(self, width, heads, layers):
        super().__init__()
        self.resblocks = tnn.ModuleList(
            [TResBlock(width, heads) for _ in range(layers)]
        )


class TTextTower(tnn.Module):
    def __init__(self, vocab, width, heads, layers, ctx, embed_dim):
        super().__init__()
        self.token_embedding = tnn.Embedding(vocab, width)
        self.positional_embedding = tnn.Parameter(torch.empty(ctx, width))
        self.transformer = TTransformer(width, heads, layers)
        self.ln_final = tnn.LayerNorm(width)
        self.text_projection = tnn.Parameter(torch.empty(width, embed_dim))
        self.logit_scale = tnn.Parameter(torch.ones([]) * np.log(1 / 0.07))

    def hidden_states(self, ids):
        """reference encode_with_transformer/text_transformer_forward
        (modules.py:494-531): returns {'last','penultimate'} in NLD."""
        n = ids.shape[1]
        mask = torch.full((n, n), float("-inf")).triu_(1)
        x = self.token_embedding(ids) + self.positional_embedding[:n]
        x = x.permute(1, 0, 2)  # NLD -> LND
        out = {}
        for i, r in enumerate(self.transformer.resblocks):
            if i == len(self.transformer.resblocks) - 1:
                out["penultimate"] = x.permute(1, 0, 2)
            x = r(x, attn_mask=mask)
        out["last"] = x.permute(1, 0, 2)
        return out


class TVisionTower(tnn.Module):
    def __init__(self, image_size, patch, width, heads, layers, out_dim):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width, patch, patch, bias=False)
        self.class_embedding = tnn.Parameter(torch.empty(width))
        grid = image_size // patch
        self.positional_embedding = tnn.Parameter(torch.empty(grid * grid + 1, width))
        self.ln_pre = tnn.LayerNorm(width)
        self.transformer = TTransformer(width, heads, layers)
        self.ln_post = tnn.LayerNorm(width)
        self.proj = tnn.Parameter(torch.empty(width, out_dim))

    def forward(self, x, output_tokens=False):
        h = self.conv1(x)
        b, w = h.shape[:2]
        h = h.reshape(b, w, -1).permute(0, 2, 1)  # NLD
        cls = self.class_embedding[None, None].expand(b, 1, -1)
        h = torch.cat([cls, h], dim=1) + self.positional_embedding
        h = self.ln_pre(h)
        h = h.permute(1, 0, 2)
        for r in self.transformer.resblocks:
            h = r(h)
        h = h.permute(1, 0, 2)
        pooled = self.ln_post(h[:, 0]) @ self.proj
        if output_tokens:
            return pooled, h[:, 1:]
        return pooled


def _randomize(model, seed=3, scale=0.2):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


TEXT_CFG = dict(vocab_size=50, width=32, heads=2, layers=3,
                context_length=10, embed_dim=16)
VIS_CFG = dict(image_size=16, patch_size=8, width=32, heads=2, layers=2,
               output_dim=16)


@pytest.fixture(scope="module")
def text_pair():
    t = TTextTower(TEXT_CFG["vocab_size"], TEXT_CFG["width"], TEXT_CFG["heads"],
                   TEXT_CFG["layers"], TEXT_CFG["context_length"],
                   TEXT_CFG["embed_dim"]).eval()
    _randomize(t)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    conv = convert_open_clip(sd)
    assert not conv["unknown"], conv["unknown"]
    return t, {"params": conv["params"]["text"]}


@pytest.fixture(scope="module")
def vis_pair():
    t = TVisionTower(VIS_CFG["image_size"], VIS_CFG["patch_size"],
                     VIS_CFG["width"], VIS_CFG["heads"], VIS_CFG["layers"],
                     VIS_CFG["output_dim"]).eval()
    _randomize(t, seed=4)
    sd = {("visual." + k): v.detach().numpy() for k, v in t.state_dict().items()}
    conv = convert_open_clip(sd)
    assert not conv["unknown"], conv["unknown"]
    return t, {"params": conv["params"]["visual"]}


def _ids(n=2):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, TEXT_CFG["vocab_size"] - 1,
                      (n, TEXT_CFG["context_length"])).astype(np.int32)
    ids[:, 0] = 1
    ids[0, 6:] = 0  # padding after the "eot" (argmax picks position 5)
    ids[0, 5] = TEXT_CFG["vocab_size"] - 1
    ids[1, -1] = TEXT_CFG["vocab_size"] - 1
    return ids


def test_text_tower_parity_legacy_layers(text_pair):
    """FrozenOpenCLIPEmbedder semantics: ln_final(last) and ln_final(stack
    stopped before the final block) (modules.py:589-608)."""
    tmodel, params = text_pair
    jmodel = OpenClipTextTransformer(**TEXT_CFG)
    ids = _ids()

    with torch.no_grad():
        hs = tmodel.hidden_states(torch.from_numpy(ids).long())
        t_last = tmodel.ln_final(hs["last"]).numpy()
        t_pen = tmodel.ln_final(hs["penultimate"]).numpy()

    j_last = np.asarray(jmodel.apply(params, jnp.asarray(ids), layer="last"))
    j_pen = np.asarray(jmodel.apply(params, jnp.asarray(ids), layer="penultimate"))
    np.testing.assert_allclose(j_last, t_last, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(j_pen, t_pen, rtol=2e-3, atol=2e-4)


def test_text_tower_parity_pooled(text_pair):
    """FrozenOpenCLIPEmbedder2 non-legacy: penultimate WITHOUT ln_final +
    EOT-argmax pooled projection (modules.py:495-516)."""
    tmodel, params = text_pair
    jmodel = OpenClipTextTransformer(**TEXT_CFG)
    ids = _ids()

    with torch.no_grad():
        hs = tmodel.hidden_states(torch.from_numpy(ids).long())
        t_pen_raw = hs["penultimate"].numpy()
        o = tmodel.ln_final(hs["last"])
        eot = torch.from_numpy(ids).long().argmax(dim=-1)
        t_pooled = (o[torch.arange(o.shape[0]), eot] @ tmodel.text_projection).numpy()

    j_pen, j_pooled = jmodel.apply(
        params, jnp.asarray(ids), layer="penultimate", legacy=False,
        return_pooled=True,
    )
    np.testing.assert_allclose(np.asarray(j_pen), t_pen_raw, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_pooled), t_pooled, rtol=2e-3, atol=3e-4)


def test_vision_tower_parity(vis_pair):
    """Pooled class-token embedding + output_tokens, with the reference's
    preprocessing ([-1,1]→[0,1]→CLIP mean/std; native-size inputs bypass the
    resize whose align-corners convention differs) (modules.py:660-746)."""
    tmodel, params = vis_pair
    jmodel = OpenClipVisionTransformer(**VIS_CFG)

    rng = np.random.RandomState(1)
    s = VIS_CFG["image_size"]
    img = (rng.rand(2, s, s, 3).astype(np.float32)) * 2 - 1

    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    timg = ((timg + 1.0) / 2.0 - mean) / std
    with torch.no_grad():
        t_pooled, t_tokens = tmodel(timg, output_tokens=True)

    x = clip_preprocess(jnp.asarray(img), size=s)
    j_pooled, j_tokens = jmodel.apply(params, x, output_tokens=True)
    np.testing.assert_allclose(np.asarray(j_pooled), t_pooled.numpy(),
                               rtol=2e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(j_tokens), t_tokens.numpy(),
                               rtol=2e-3, atol=3e-4)


def test_image_embedder_wrapper_modes(vis_pair):
    """unsqueeze_dim / repeat_to_max_len / output_tokens output shapes
    (modules.py:704-731)."""
    _, params = vis_pair
    s = VIS_CFG["image_size"]
    img = jnp.zeros((2, s, s, 3))

    emb = FrozenOpenCLIPImageEmbedder(
        model=OpenClipVisionTransformer(**VIS_CFG), params=params,
        unsqueeze_dim=True,
    )
    assert emb(img).shape == (2, 1, VIS_CFG["output_dim"])

    emb = FrozenOpenCLIPImageEmbedder(
        model=OpenClipVisionTransformer(**VIS_CFG), params=params,
        repeat_to_max_len=True, max_length=7,
    )
    z_rep, z = emb(img)
    assert z_rep.shape == (2, 7, VIS_CFG["output_dim"]) and z.shape == (2, VIS_CFG["output_dim"])
    np.testing.assert_array_equal(np.asarray(z_rep[:, 3]), np.asarray(z))

    emb = FrozenOpenCLIPImageEmbedder(
        model=OpenClipVisionTransformer(**VIS_CFG), params=params,
        output_tokens=True,
    )
    tokens, z = emb(img)
    grid = (s // VIS_CFG["patch_size"]) ** 2
    assert tokens.shape == (2, grid, VIS_CFG["width"])
    assert z.shape == (2, VIS_CFG["output_dim"])


def test_text_embedder_wrapper_and_loader(tmp_path, text_pair):
    """The weight-gated loader converts a saved open_clip-layout checkpoint
    and the wrapper consumes token ids end-to-end."""
    from udifftext_tpu.embedders import load_frozen_open_clip_text_embedder

    tmodel, params = text_pair
    path = tmp_path / "open_clip_pytorch_model.bin"
    torch.save(tmodel.state_dict(), path)

    with pytest.raises(RuntimeError, match="open_clip weights not found"):
        load_frozen_open_clip_text_embedder(weights_path=str(tmp_path / "nope.bin"))

    emb = load_frozen_open_clip_text_embedder(
        max_length=TEXT_CFG["context_length"], layer="penultimate",
        weights_path=str(path), **TEXT_CFG,
    )
    ids = _ids()
    out = emb(ids)
    ref = OpenClipTextTransformer(**TEXT_CFG).apply(
        params, jnp.asarray(ids), layer="penultimate"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_simple_tokenizer_byte_fallback(tmp_path):
    """SimpleTokenizer machinery on a minimal merges file: byte-level tokens
    with the </w> word suffix and one learned merge."""
    import gzip

    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("#version: 0.2\n")
        f.write("a b</w>\n")  # single merge: "ab" as one token

    tok = SimpleTokenizer(str(path), context_length=8)
    ids = tok.tokenize(["ab", "ba"])
    assert ids.shape == (2, 8)
    assert ids[0, 0] == tok.sot
    merged = tok.encoder["ab</w>"]
    assert ids[0, 1] == merged and ids[0, 2] == tok.eot  # merge applied
    # "ba" has no merge: two byte tokens
    assert ids[1, 3] == tok.eot

    with pytest.raises(FileNotFoundError):
        SimpleTokenizer(str(tmp_path / "absent.gz"))
