"""Golden-parity tests: randomly-initialized torch reference modules vs the
JAX rebuild after weight conversion (SURVEY.md §4(b))."""

import numpy as np
import pytest

from torch_ref import REFERENCE, install_stubs, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="torch reference tree not mounted"
)


@pytest.fixture(scope="module")
def torch_ref():
    install_stubs()
    import torch

    torch.manual_seed(0)
    return torch


def randomize_(torch, model, scale=0.05):
    """Replace every param (incl. zero-inited output convs) with random
    values so parity checks exercise every weight."""
    g = torch.Generator().manual_seed(1234)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def test_unet_forward_parity(torch_ref):
    torch = torch_ref
    from sgm.modules.diffusionmodules.openaimodel import UnifiedUNetModel

    import jax
    import jax.numpy as jnp
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.utils.ckpt_torch import convert_unet

    kw = dict(
        in_channels=9, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=[2, 1], channel_mult=[1, 2], num_head_channels=8,
        transformer_depth=1, t_context_dim=16,
    )
    tmodel = UnifiedUNetModel(
        ctrl_channels=0, use_linear_in_transformer=True,
        save_attn_type=["t_attn"], save_attn_layers=["input_blocks.1.1"], **kw
    ).eval()
    randomize_(torch, tmodel)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    conv = convert_unet(sd, prefix="")
    assert not conv["unknown"], conv["unknown"]

    jmodel = UNetModel(
        in_channels=9, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=8,
        t_context_dim=16, dtype=jnp.float32,
    )

    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 16, 16).astype(np.float32)
    t = np.array([3.0, 500.0], np.float32)
    ctx = rng.randn(2, 12, 16).astype(np.float32)

    with torch.no_grad():
        tout = tmodel(
            torch.from_numpy(x), timesteps=torch.from_numpy(t),
            t_context=torch.from_numpy(ctx),
        ).numpy()

    jout, maps = jmodel.apply(
        {"params": conv["params"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        capture_attn=True,
    )
    jout = np.asarray(jout).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(jout, tout, rtol=1e-3, atol=1e-4)

    # attention-map parity for the cached layer
    titem = [it for it in tmodel.attn_map_cache if it["name"] == "input_blocks.1.1.transformer_blocks.0.t_attn"]
    assert titem, [it["name"] for it in tmodel.attn_map_cache]
    tmap = titem[0]["attn_map"].detach().numpy()  # (b*h, n, l)
    h = titem[0]["heads"]
    jmap = np.asarray(maps["input_blocks.1.1.t_attn"])  # (b, h, n, l)
    tmap = tmap.reshape(-1, h, *tmap.shape[1:])
    np.testing.assert_allclose(jmap, tmap, rtol=1e-3, atol=1e-4)


def test_vae_roundtrip_parity(torch_ref):
    torch = torch_ref
    from sgm.modules.diffusionmodules.model import Encoder as TEncoder, Decoder as TDecoder

    import jax.numpy as jnp
    from udifftext_tpu.models.vae import DDConfig, Encoder, Decoder
    from udifftext_tpu.utils.ckpt_torch import convert_vae

    dd = dict(
        ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=[],
        in_channels=3, resolution=32, z_channels=4, double_z=True, attn_type="vanilla-xformers",
    )
    tenc = TEncoder(**dd).eval()
    tdec = TDecoder(**dd).eval()
    randomize_(torch, tenc)
    randomize_(torch, tdec)
    sd = {}
    sd.update({f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()})
    sd.update({f"decoder.{k}": v.detach().numpy() for k, v in tdec.state_dict().items()})
    conv = convert_vae(sd)
    assert not conv["unknown"], conv["unknown"]

    cfg = DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(), in_channels=3, resolution=32, z_channels=4)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        tmom = tenc(torch.from_numpy(x)).numpy()

    jenc = Encoder(cfg)
    jmom = np.asarray(
        jenc.apply({"params": conv["params"]["encoder"]}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(jmom, tmom, rtol=1e-3, atol=1e-4)

    z = rng.randn(1, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        trec = tdec(torch.from_numpy(z)).numpy()
    jdec = Decoder(cfg)
    jrec = np.asarray(
        jdec.apply({"params": conv["params"]["decoder"]}, jnp.asarray(z.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(jrec, trec, rtol=1e-3, atol=1e-4)


def test_label_encoder_parity(torch_ref):
    torch = torch_ref
    from sgm.modules.encoders.modules import LabelEncoder as TLabelEncoder

    import jax.numpy as jnp
    from udifftext_tpu import charset
    from udifftext_tpu.models.label_encoder import LabelEncoder
    from udifftext_tpu.utils.ckpt_torch import convert_label_encoder

    tmodel = TLabelEncoder(max_len=12, emb_dim=64, n_heads=4, n_trans_layers=2).eval()
    randomize_(torch, tmodel)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    conv = convert_label_encoder(sd)
    assert not conv["unknown"], conv["unknown"]

    labels = ["hello", "WORLD42"]
    with torch.no_grad():
        tout = tmodel(labels).numpy()

    jmodel = LabelEncoder(max_len=12, emb_dim=64, n_heads=4, n_trans_layers=2)
    ids = jnp.asarray(charset.encode_labels(labels, 12))
    jout = np.asarray(jmodel.apply({"params": conv["params"]}, ids))
    np.testing.assert_allclose(jout, tout, rtol=1e-3, atol=1e-4)
