"""FID / LPIPS metrics: converter forward parity against torch-side models
built with the exact upstream state-dict key layout (pytorch_fid InceptionV3,
lpips.LPIPS(net='alex')), plus the Frechet math and calc_* plumbing.

The torch models below are NOT copies of any installed package (neither
pytorch_fid nor lpips is present) — they re-state the well-known torchvision
InceptionV3 / AlexNet topologies with pytorch_fid's FID pooling patches so
their random-init state dicts exercise utils/ckpt_torch.convert_* exactly the
way the published weight files would.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch-side FID InceptionV3
# ---------------------------------------------------------------------------


class TBasic(tnn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _fid_avg(x):
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, i, pf):
        super().__init__()
        self.branch1x1 = TBasic(i, 64, kernel_size=1)
        self.branch5x5_1 = TBasic(i, 48, kernel_size=1)
        self.branch5x5_2 = TBasic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasic(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasic(i, pf, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_fid_avg(x)),
        ], 1)


class TInceptionB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasic(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasic(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2),
        ], 1)


class TInceptionC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasic(i, 192, kernel_size=1)
        self.branch7x7_1 = TBasic(i, c7, kernel_size=1)
        self.branch7x7_2 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasic(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasic(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_fid_avg(x))
        ], 1)


class TInceptionD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasic(i, 192, kernel_size=1)
        self.branch3x3_2 = TBasic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasic(i, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasic(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2),
        ], 1)


class TInceptionE(tnn.Module):
    def __init__(self, i, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasic(i, 320, kernel_size=1)
        self.branch3x3_1 = TBasic(i, 384, kernel_size=1)
        self.branch3x3_2a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasic(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasic(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pooled = _fid_avg(x) if self.pool == "avg" else F.max_pool2d(x, 3, 1, 1)
        return torch.cat([
            self.branch1x1(x), b3, bd, self.branch_pool(pooled)
        ], 1)


class TFIDInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")

    def forward(self, x):
        x = 2 * x - 1
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for blk in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                    self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                    self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = blk(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def _randomize_bn(model, gen):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=gen) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


def test_fid_inception_converter_parity():
    from udifftext_tpu.models.inception import FIDInceptionV3
    from udifftext_tpu.utils.ckpt_torch import convert_fid_inception

    gen = torch.Generator().manual_seed(0)
    tmodel = TFIDInception().eval()
    _randomize_bn(tmodel, gen)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    x = np.random.RandomState(0).rand(2, 299, 299, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = FIDInceptionV3(resize_input=False)
    conv = convert_fid_inception(sd)
    assert not conv["unknown"], conv["unknown"][:5]
    params = {"params": jax.tree.map(jnp.asarray, conv["params"])}
    out = np.asarray(model.apply(params, jnp.asarray(x)))
    assert out.shape == (2, 2048)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# torch-side LPIPS-alex
# ---------------------------------------------------------------------------


class TAlexSlices(tnn.Module):
    """lpips.pretrained_networks.alexnet layout: slice1..slice5 keep the
    torchvision features indices as child names."""

    def __init__(self):
        super().__init__()
        feats = {
            0: tnn.Conv2d(3, 64, 11, 4, 2), 1: tnn.ReLU(),
            2: tnn.MaxPool2d(3, 2), 3: tnn.Conv2d(64, 192, 5, 1, 2),
            4: tnn.ReLU(), 5: tnn.MaxPool2d(3, 2),
            6: tnn.Conv2d(192, 384, 3, 1, 1), 7: tnn.ReLU(),
            8: tnn.Conv2d(384, 256, 3, 1, 1), 9: tnn.ReLU(),
            10: tnn.Conv2d(256, 256, 3, 1, 1), 11: tnn.ReLU(),
        }
        ranges = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]
        for si, (lo, hi) in enumerate(ranges):
            sl = tnn.Sequential()
            for i in range(lo, hi):
                sl.add_module(str(i), feats[i])
            setattr(self, f"slice{si + 1}", sl)

    def forward(self, x):
        taps = []
        for si in range(5):
            x = getattr(self, f"slice{si + 1}")(x)
            taps.append(x)
        return taps


class TLPIPS(tnn.Module):
    def __init__(self):
        super().__init__()
        self.net = TAlexSlices()
        chans = [64, 192, 384, 256, 256]
        for i, c in enumerate(chans):
            lin = tnn.Sequential(tnn.Dropout(), tnn.Conv2d(c, 1, 1, bias=False))
            setattr(self, f"lin{i}", lin)
        self.shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        self.scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def forward(self, a, b):
        fa = self.net((a - self.shift) / self.scale)
        fb = self.net((b - self.shift) / self.scale)
        total = 0.0
        for i, (ta, tb) in enumerate(zip(fa, fb)):
            na = ta / torch.sqrt(torch.sum(ta**2, 1, keepdim=True) + 1e-10)
            nb = tb / torch.sqrt(torch.sum(tb**2, 1, keepdim=True) + 1e-10)
            d = getattr(self, f"lin{i}")((na - nb) ** 2)
            total = total + d.mean(dim=(2, 3))
        return total.flatten()


def test_lpips_alex_converter_parity():
    from udifftext_tpu.models.lpips import LPIPSAlex
    from udifftext_tpu.utils.ckpt_torch import convert_lpips_alex

    torch.manual_seed(0)
    tmodel = TLPIPS().eval()
    with torch.no_grad():
        for i in range(5):
            getattr(tmodel, f"lin{i}")[1].weight.abs_()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # rename linK.1.weight → linK.model.1.weight (the lpips dump layout)
    sd = {
        (k.replace(".1.weight", ".model.1.weight") if k.startswith("lin") else k): v
        for k, v in sd.items()
    }

    rng = np.random.RandomState(1)
    a = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    b = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
        ).numpy()

    conv = convert_lpips_alex(sd)
    assert not conv["unknown"], conv["unknown"][:5]
    params = {"params": jax.tree.map(jnp.asarray, conv["params"])}
    out = np.asarray(LPIPSAlex().apply(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Frechet math + calc_* plumbing
# ---------------------------------------------------------------------------


def test_frechet_distance_zero_for_identical():
    from metrics import activation_statistics, frechet_distance

    f = np.random.RandomState(0).randn(64, 8)
    mu, sig = activation_statistics(f)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-6


def test_calc_fid_and_lpips_with_overrides(tmp_path):
    from PIL import Image

    from metrics import calc_fid, calc_lpips

    for d in ("real", "fake"):
        (tmp_path / d).mkdir()
        for i in range(3):
            arr = (np.random.RandomState(i).rand(32, 32, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / d / f"{i}.png")

    feature_fn = lambda x: x.reshape(x.shape[0], -1)[:, :16]
    fid = calc_fid(str(tmp_path / "fake"), str(tmp_path / "real"), feature_fn=feature_fn)
    assert fid is not None and np.isfinite(fid)

    distance_fn = lambda a, b: float(np.mean((a - b) ** 2))
    lp = calc_lpips(str(tmp_path / "fake"), str(tmp_path / "real"), distance_fn=distance_fn)
    assert lp is not None and np.isfinite(lp)


def test_calc_fid_skips_cleanly_without_weights(tmp_path, capsys):
    from metrics import calc_fid

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    assert calc_fid(str(tmp_path / "a"), str(tmp_path / "b")) is None
    assert "skipped" in capsys.readouterr().out
