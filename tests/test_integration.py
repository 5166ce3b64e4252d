"""End-to-end integration: dataset fixture → loader → engine.sample → OCR
predictor path, exercising the test.py flow on tiny models."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from udifftext_tpu.data.datasets import ICDAR13Dataset
from udifftext_tpu.data.loader import DataLoader
from udifftext_tpu.models.parseq import PARSeq, ParseqTokenizer
from udifftext_tpu.ocr import ParseqPredictor
from util import numpy_batch_to_device

FONT = os.path.join(
    os.path.dirname(__import__("matplotlib").__file__),
    "mpl-data/fonts/ttf/DejaVuSans.ttf",
)


@pytest.fixture(scope="module")
def tiny_engine():
    from udifftext_tpu.diffusion.loss import FullLossConfig
    from udifftext_tpu.engine import DiffusionEngine
    from udifftext_tpu.models.label_encoder import LabelEncoder
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.models.vae import AutoencoderKL, DDConfig

    IMG = 32
    unet = UNetModel(
        in_channels=9, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=8,
        t_context_dim=32,
    )
    vae = AutoencoderKL(
        DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(), in_channels=3, resolution=IMG, z_channels=4),
        embed_dim=4,
    )
    le = LabelEncoder(max_len=12, emb_dim=32, n_heads=4, n_trans_layers=2,
                      dim_feedforward=64)
    eng = DiffusionEngine(
        unet=unet, vae=vae, label_encoder=le,
        loss_cfg=FullLossConfig(min_attn_size=8),
        mask_multiplier=0.5, latent_factor=2,
    )
    k = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(k, jnp.zeros((1, 16, 16, 9)), jnp.zeros((1,)), jnp.zeros((1, 12, 32))),
        "vae": vae.init(k, jnp.zeros((1, IMG, IMG, 3))),
        "label_encoder": le.init(k, jnp.zeros((1, 12), jnp.int32)),
    }
    return eng, params, IMG


def _make_icdar_fixture(tmp_path, H=32):
    root = tmp_path / "ICDAR13" / "val"
    (root / "images").mkdir(parents=True)
    (root / "annos").mkdir()
    img = Image.new("RGB", (100, 80), (90, 90, 90))
    ImageDraw.Draw(img).text((30, 30), "ab", fill=(250, 250, 250),
                             font=ImageFont.truetype(FONT, 20))
    img.save(root / "images" / "img1.jpg")
    with open(root / "annos" / "gt_img1.txt", "w") as f:
        f.write('28, 28, 70, 55, "ab"\n')
    return {
        "data_root": str(tmp_path), "H": H, "W": H, "word_len": [1, 8],
        "seq_len": 12, "mask_min_ratio": 0.01, "aug_text_enabled": False,
        "aug_text_ratio": 0.0, "seed": 0,
    }


def test_eval_pipeline(tmp_path, tiny_engine):
    eng, params, IMG = tiny_engine
    cfg = _make_icdar_fixture(tmp_path, H=IMG)
    ds = ICDAR13Dataset(cfg, "val")
    dl = DataLoader(ds, batch_size=1, shuffle=False, prefetch=0)
    batch = next(iter(dl))
    dev = numpy_batch_to_device(batch)

    img, _ = eng.sample(params, dev, jax.random.PRNGKey(1), num_steps=2, noise_iters=1)
    img = np.asarray(img)
    assert img.shape == (1, IMG, IMG, 3)
    assert np.isfinite(img).all()

    # OCR predictor path on the generated crop (random weights — just e2e)
    tok = ParseqTokenizer()
    pq = PARSeq(max_label_length=7, img_size=(16, 32), patch_size=(4, 8),
                embed_dim=64, enc_depth=1, enc_num_heads=4, dec_num_heads=4)
    predictor = ParseqPredictor(model=pq, tokenizer=tok)
    pq_params = pq.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 32, 3)), 1)

    t, b, l, r = np.asarray(batch["r_bbox"][0])
    crop = img[0, t:b, l:r]
    txt = predictor.img2txt_ragged(pq_params, [crop])
    assert isinstance(txt[0], str)

    # jit OCR loss path
    ids = jnp.asarray(tok.encode(["ab"], max_length=7))
    loss = predictor.calc_loss(
        pq_params, jnp.asarray(img), jnp.asarray(batch["r_bbox"]), ids
    )
    assert loss.shape == (1,)
    assert float(loss[0]) <= 1.0 + 1e-6


def test_ocr_crop_resize_matches_host():
    """scale_and_translate bbox crop ≈ host crop+resize."""
    from udifftext_tpu.ocr import crop_resize_bbox
    import cv2

    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 3).astype(np.float32)
    bbox = np.array([10, 42, 8, 56], np.int32)  # t, b, l, r
    out = np.asarray(crop_resize_bbox(jnp.asarray(img), jnp.asarray(bbox), (32, 128), method="linear"))
    host = cv2.resize(img[10:42, 8:56], (128, 32), interpolation=cv2.INTER_LINEAR)
    # boundary rows differ (edge handling), interior should agree closely
    diff = np.abs(out[4:-4, 4:-4] - host[4:-4, 4:-4])
    assert diff.mean() < 0.06, diff.mean()
