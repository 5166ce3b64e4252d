"""Full-size checkpoint-conversion dry runs: the real published-checkpoint
shapes (891M UNet, 83M VAE, 100M+ LabelEncoder, 23.8M PARSeq) must convert
with zero missing/unexpected/mismatched keys."""

import numpy as np
import pytest

from torch_ref import install_stubs, reference_available

pytestmark = [
    pytest.mark.skipif(not reference_available(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def torch_ref():
    install_stubs()
    import torch

    return torch


def _flax_shapes(module, *inputs):
    import jax

    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *inputs)
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes["params"])


def test_fullsize_unet_conversion(torch_ref):
    import jax.numpy as jnp

    from sgm.modules.diffusionmodules.openaimodel import UnifiedUNetModel
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.utils.ckpt_torch import convert_unet, merge_params

    t = UnifiedUNetModel(
        in_channels=9, out_channels=4, ctrl_channels=0, model_channels=320,
        attention_resolutions=[4, 2, 1], save_attn_type=["t_attn"],
        save_attn_layers=["output_blocks.6.1"], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_head_channels=64,
        use_linear_in_transformer=True, transformer_depth=1, t_context_dim=2048,
    ).eval()
    sd = {f"model.diffusion_model.{k}": v.detach().numpy() for k, v in t.state_dict().items()}
    n_torch = sum(v.size for v in sd.values())

    conv = convert_unet(sd)
    assert not conv["unknown"], conv["unknown"][:10]

    init_np = _flax_shapes(
        UNetModel(dtype=jnp.bfloat16),
        jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)), jnp.zeros((1, 12, 2048)),
    )
    merged, missing, unexpected, mismatched = merge_params(init_np, conv["params"])
    assert not missing and not unexpected and not mismatched, (
        missing[:5], unexpected[:5], mismatched[:5]
    )
    n_flax = sum(np.asarray(v).size for v in __import__("jax").tree.leaves(merged))
    assert n_flax == n_torch  # 891,484,164 params


def test_fullsize_vae_conversion(torch_ref):
    import jax.numpy as jnp

    from sgm.modules.diffusionmodules.model import Decoder as TDecoder, Encoder as TEncoder
    from udifftext_tpu.models.vae import AutoencoderKL, DDConfig
    from udifftext_tpu.utils.ckpt_torch import convert_vae, merge_params

    torch = torch_ref
    dd = dict(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
              attn_resolutions=[], in_channels=3, resolution=256, z_channels=4,
              double_z=True, attn_type="vanilla-xformers")
    tenc, tdec = TEncoder(**dd).eval(), TDecoder(**dd).eval()
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    sd.update({f"decoder.{k}": v.detach().numpy() for k, v in tdec.state_dict().items()})
    sd["quant_conv.weight"] = np.zeros((8, 8, 1, 1), np.float32)
    sd["quant_conv.bias"] = np.zeros((8,), np.float32)
    sd["post_quant_conv.weight"] = np.zeros((4, 4, 1, 1), np.float32)
    sd["post_quant_conv.bias"] = np.zeros((4,), np.float32)

    conv = convert_vae(sd)
    assert not conv["unknown"], conv["unknown"][:10]

    init_np = _flax_shapes(AutoencoderKL(DDConfig()), jnp.zeros((1, 256, 256, 3)))
    merged, missing, unexpected, mismatched = merge_params(init_np, conv["params"])
    assert not missing and not unexpected and not mismatched, (
        missing[:5], unexpected[:5], mismatched[:5]
    )


def test_fullsize_label_encoder_conversion(torch_ref):
    import jax.numpy as jnp

    from sgm.modules.encoders.modules import LabelEncoder as TLabelEncoder
    from udifftext_tpu.models.label_encoder import LabelEncoder
    from udifftext_tpu.utils.ckpt_torch import convert_label_encoder, merge_params

    t = TLabelEncoder(max_len=12, emb_dim=2048, n_heads=8, n_trans_layers=12).eval()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    conv = convert_label_encoder(sd)
    assert not conv["unknown"], conv["unknown"][:10]

    init_np = _flax_shapes(LabelEncoder(), jnp.zeros((1, 12), jnp.int32))
    merged, missing, unexpected, mismatched = merge_params(init_np, conv["params"])
    assert not missing and not unexpected and not mismatched, (
        missing[:5], unexpected[:5], mismatched[:5]
    )


def test_fullsize_parseq_conversion(torch_ref):
    import jax.numpy as jnp

    from strhub.models.parseq.system import PARSeq as TorchPARSeq
    from udifftext_tpu.models.parseq import PARSEQ_CHARSET, PARSeq
    from udifftext_tpu.utils.ckpt_torch import convert_parseq, merge_params

    t = TorchPARSeq(
        charset_train=PARSEQ_CHARSET, charset_test=PARSEQ_CHARSET,
        max_label_length=25, batch_size=1, lr=1e-4, warmup_pct=0.1,
        weight_decay=0.0, img_size=[32, 128], patch_size=[4, 8], embed_dim=384,
        enc_num_heads=6, enc_mlp_ratio=4, enc_depth=12, dec_num_heads=12,
        dec_mlp_ratio=4, dec_depth=1, perm_num=6, perm_forward=True,
        perm_mirrored=True, decode_ar=True, refine_iters=1, dropout=0.0,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    n_torch = sum(v.size for v in sd.values())
    assert abs(n_torch - 23.833e6) / 23.833e6 < 0.01  # published 23.833M params

    conv = convert_parseq(sd)
    assert not conv["unknown"], conv["unknown"][:10]

    init_np = _flax_shapes(PARSeq(), jnp.zeros((1, 32, 128, 3)))
    merged, missing, unexpected, mismatched = merge_params(init_np, conv["params"])
    assert not missing and not unexpected and not mismatched, (
        missing[:5], unexpected[:5], mismatched[:5]
    )
