"""TRBA and ABINet shape/sanity tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_tps_constants_shapes():
    from udifftext_tpu.models.trba import build_tps_constants

    inv_delta_C, P_hat = build_tps_constants(20, 16, 48)
    assert inv_delta_C.shape == (23, 23)
    assert P_hat.shape == (16 * 48, 23)
    assert np.isfinite(inv_delta_C).all() and np.isfinite(P_hat).all()


def test_grid_sample_identity():
    from udifftext_tpu.ops.image import grid_sample_bilinear

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 8, 10, 3).astype(np.float32))
    ys, xs = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 10), indexing="ij")
    grid = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
    out = grid_sample_bilinear(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_trba_forward():
    from udifftext_tpu.models.trba import TRBA

    m = TRBA(num_class=38, max_label_length=5, output_channel=64, hidden=32,
             img_size=(32, 64))
    x = jnp.zeros((2, 32, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 6, 38)
    assert np.isfinite(np.asarray(out)).all()
    # teacher-forced path
    text = jnp.zeros((2, 6), jnp.int32)
    out_tf = m.apply(params, x, text)
    assert out_tf.shape == (2, 6, 38)


def test_abinet_forward():
    from udifftext_tpu.models.abinet import ABINet

    m = ABINet(max_length=6, num_classes=37, iter_size=2, d_model=64)
    x = jnp.zeros((2, 32, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 6, 37)
    assert np.isfinite(np.asarray(out)).all()


def test_trba_torch_parity():
    """Random-init torch TRBA → convert → forward parity (greedy decode)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_ref import install_stubs, reference_available

    if not reference_available():
        import pytest
        pytest.skip("reference not mounted")
    install_stubs()
    import torch
    from strhub.models.trba.model import TRBA as TorchTRBA
    from udifftext_tpu.models.trba import TRBA
    from udifftext_tpu.utils.ckpt_torch import convert_trba

    torch.manual_seed(0)
    tm = TorchTRBA(img_h=32, img_w=64, num_class=38, num_fiducial=20,
                   input_channel=3, output_channel=64, hidden_size=32).eval()
    g = torch.Generator().manual_seed(9)
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if "localization_fc2.bias" in n:
                continue  # keep the RARE canonical-fiducial bias init
            if "localization_fc2.weight" in n:
                # small NONZERO weights → non-affine predicted fiducials, so
                # the TPS rbf term actually participates (a zero fc2 weight
                # makes fiducials affine and hid a wrong rbf factor)
                p.copy_(torch.randn(p.shape, generator=g) * 0.01)
                continue
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    sd = {f"model.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    conv = convert_trba(sd)
    assert not conv["unknown"], conv["unknown"][:10]

    jm = TRBA(num_class=38, max_label_length=5, output_channel=64, hidden=32,
              img_size=(32, 64))
    rng = np.random.RandomState(3)
    x = rng.rand(2, 32, 64, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        # strhub greedy path: text = [SOS]=bos filled; Attention eval branch
        text = torch.zeros((1,), dtype=torch.long)
        tout = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), 5, text).numpy()

    variables = {"params": conv["params"], "batch_stats": conv["batch_stats"]}
    jout = np.asarray(jm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(jout, tout, rtol=5e-3, atol=5e-4)


def test_abinet_torch_parity():
    """Random-init torch ABINetIterModel → convert → final aligned logits."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_ref import install_stubs, reference_available

    if not reference_available():
        import pytest
        pytest.skip("reference not mounted")
    install_stubs()
    import copy
    import torch

    # torch 2.13's nn.TransformerDecoder probes layer.self_attn, which the
    # BCN layer omits (self_attn=False); swap in a plain iterate-and-norm stack
    class _SimpleDecoder(torch.nn.Module):
        def __init__(self, layer, num_layers, norm=None):
            super().__init__()
            self.layers = torch.nn.ModuleList(
                [copy.deepcopy(layer) for _ in range(num_layers)]
            )
            self.norm = norm

        def forward(self, tgt, memory, **kw):
            out = tgt
            for l in self.layers:
                out = l(out, memory, **kw)
            return self.norm(out) if self.norm is not None else out

    from strhub.models.abinet import model_language
    model_language.TransformerDecoder = _SimpleDecoder
    from strhub.models.abinet.model_abinet_iter import ABINetIterModel
    from udifftext_tpu.models.abinet import ABINet
    from udifftext_tpu.utils.ckpt_torch import convert_abinet

    torch.manual_seed(0)
    # NOTE: the torch resnet45 is hardcoded 512-wide, so parity runs at
    # d_model=512 with single-layer transformers to stay cheap
    tm = ABINetIterModel(
        dataset_max_length=5, null_label=0, num_classes=37, iter_size=1,
        d_model=512, nhead=8, d_inner=128, dropout=0.0, activation="relu",
        v_backbone="transformer", v_num_layers=1,
        l_num_layers=1, l_detach=True, l_use_self_attn=False,
    ).eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    sd = {f"model.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    conv = convert_abinet(sd)
    assert not conv["unknown"], conv["unknown"][:10]

    jm = ABINet(max_length=6, num_classes=37, iter_size=1, d_model=512,
                nhead=8, d_inner=128, v_num_layers=1, l_num_layers=1)
    rng = np.random.RandomState(4)
    x = rng.rand(1, 32, 128, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        a_res, _, _ = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        tout = a_res["logits"].numpy()

    variables = {"params": conv["params"], "batch_stats": conv["batch_stats"]}
    jout = np.asarray(jm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(jout, tout, rtol=5e-3, atol=5e-4)


def test_crnn_torch_parity():
    """Random-init torch CRNN → convert → per-frame logits parity."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_ref import install_stubs, reference_available

    if not reference_available():
        import pytest
        pytest.skip("reference not mounted")
    install_stubs()
    import torch
    from strhub.models.crnn.model import CRNN as TorchCRNN
    from udifftext_tpu.models.str_models import CRNN
    from udifftext_tpu.utils.ckpt_torch import convert_crnn

    torch.manual_seed(0)
    tm = TorchCRNN(img_h=32, nc=3, nclass=37, nh=32).eval()
    g = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    sd = {f"model.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    conv = convert_crnn(sd)
    assert not conv["unknown"], conv["unknown"][:10]

    jm = CRNN(num_classes=37, hidden=32)
    rng = np.random.RandomState(5)
    x = rng.rand(2, 32, 64, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        tout = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    variables = {"params": conv["params"], "batch_stats": conv["batch_stats"]}
    jout = np.asarray(jm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(jout, tout, rtol=5e-3, atol=5e-4)
