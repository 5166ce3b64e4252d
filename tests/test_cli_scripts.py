"""End-to-end CLI script smoke tests: the actual train.py / test.py flows on
a tiny model graph + synthetic dataset (identical config schema to the
reference YAMLs)."""

import os
import textwrap

import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

FONT = os.path.join(
    os.path.dirname(__import__("matplotlib").__file__),
    "mpl-data/fonts/ttf/DejaVuSans.ttf",
)

TINY_MODEL_YAML = """
model:
  target: sgm.models.diffusion.DiffusionEngine
  params:
    opt_keys: [t_attn, t_norm]
    input_key: image
    scale_factor: 0.18215
    denoiser_config:
      target: sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser
      params:
        num_idx: 1000
        weighting_config: {target: sgm.modules.diffusionmodules.denoiser_weighting.EpsWeighting}
        scaling_config: {target: sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling}
        discretization_config: {target: sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization}
    network_config:
      target: sgm.modules.diffusionmodules.openaimodel.UnifiedUNetModel
      params:
        in_channels: 9
        out_channels: 4
        model_channels: 32
        attention_resolutions: [2, 1]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 8
        use_linear_in_transformer: True
        transformer_depth: 1
        t_context_dim: 32
    conditioner_config:
      target: sgm.modules.GeneralConditioner
      params:
        emb_models:
          - is_trainable: False
            emb_key: t_crossattn
            ucg_rate: 0.1
            input_key: label
            target: sgm.modules.encoders.modules.LabelEncoder
            params: {max_len: 12, emb_dim: 32, n_heads: 4, n_trans_layers: 2}
          - is_trainable: False
            input_key: mask
            target: sgm.modules.encoders.modules.SpatialRescaler
            params: {in_channels: 1, multiplier: 0.5}
          - is_trainable: False
            input_key: masked
            target: sgm.modules.encoders.modules.LatentEncoder
            params: {scale_factor: 0.18215}
    first_stage_config:
      target: sgm.models.autoencoder.AutoencoderKLInferenceWrapper
      params:
        embed_dim: 4
        ddconfig:
          double_z: true
          z_channels: 4
          resolution: 32
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 2]
          num_res_blocks: 1
          attn_resolutions: []
    loss_fn_config:
      target: sgm.modules.diffusionmodules.loss.FullLoss
      params:
        seq_len: 12
        kernel_size: 3
        gaussian_sigma: 1.0
        min_attn_size: 8
        lambda_local_loss: 0.01
        ocr_enabled: False
        sigma_sampler_config:
          target: sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling
          params:
            num_idx: 1000
            discretization_config: {target: sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization}
    sampler_config:
      target: sgm.modules.diffusionmodules.sampling.EulerEDMSampler
      params:
        num_steps: 2
        discretization_config: {target: sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization}
        guider_config:
          target: sgm.modules.diffusionmodules.guiders.VanillaCFG
          params: {scale: 5.0}
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    # dataset fixture
    droot = root / "data" / "ICDAR13" / "val"
    (droot / "images").mkdir(parents=True)
    (droot / "annos").mkdir()
    img = Image.new("RGB", (100, 80), (90, 90, 90))
    ImageDraw.Draw(img).text((30, 30), "ab", fill=(250, 250, 250),
                             font=ImageFont.truetype(FONT, 20))
    img.save(droot / "images" / "img1.jpg")
    (droot / "annos" / "gt_img1.txt").write_text('28, 28, 70, 55, "ab"\n')
    # train split mirrors val
    import shutil

    shutil.copytree(droot, root / "data" / "ICDAR13" / "train")

    (root / "model.yaml").write_text(TINY_MODEL_YAML)
    (root / "dataset.yaml").write_text(textwrap.dedent(f"""
        target: ICDAR13Dataset
        params:
          data_root: '{root / "data"}'
          H: 32
          W: 32
          word_len: [1, 8]
          seq_len: 12
          mask_min_ratio: 0.01
          aug_text_enabled: False
          aug_text_ratio: 0.0
    """))
    return root


def test_test_py_flow(workspace):
    """The full test.py flow: init_model from YAML → sample → image dumps."""
    from udifftext_tpu.config import ConfigNode
    from udifftext_tpu.data import get_dataloader
    import test as test_script
    from util import init_model, init_sampling

    cfgs = ConfigNode.wrap({
        "model_cfg_path": str(workspace / "model.yaml"),
        "dataset_cfg_path": str(workspace / "dataset.yaml"),
        "load_ckpt_path": None,
        "output_dir": str(workspace / "outputs"),
        "temp_dir": str(workspace / "temp"),
        "scale": [5.0, 0.0],
        "noise_iters": 1,
        "force_uc_zero_embeddings": ["label"],
        "aae_enabled": False,
        "detailed": False,
        "bf16": False,
        "steps": 2,
        "batch_size": 1,
        "max_iter": 1,
        "shuffle": False,
        "quan_test": False,
        "ocr_enabled": False,
    })
    bundle, params = init_model(cfgs, image_size=32)
    assert bundle.engine.latent_factor == 2
    assert bundle.engine.mask_multiplier == 0.5
    sampler = init_sampling(cfgs)
    assert sampler.num_steps == 2 and sampler.cfg_scale == 5.0
    dataloader = get_dataloader(cfgs, "val")
    test_script.test(bundle, params, sampler, dataloader, cfgs)
    out = workspace / "outputs"
    assert (out / "fake" / "0.png").exists()
    assert (out / "real" / "0.png").exists()


def test_general_conditioner_vector_embedder(workspace):
    """A modified model graph adding a ClassEmbedder (vector key) materializes
    through the generic embedder-list path (GeneralConditioner parity,
    modules.py:105-217) and trains one step."""
    import yaml
    import jax
    import numpy as np

    from udifftext_tpu.config import ConfigNode
    from udifftext_tpu.data import get_dataloader
    from udifftext_tpu.parallel.mesh import make_mesh
    from udifftext_tpu.parallel.train import TrainState, make_optimizer, make_train_step
    from util import init_model, numpy_batch_to_device
    import train as train_script

    graph = yaml.safe_load(TINY_MODEL_YAML)
    net = graph["model"]["params"]["network_config"]["params"]
    net["use_label"] = 1
    net["adm_in_channels"] = 16
    graph["model"]["params"]["conditioner_config"]["params"]["emb_models"].append({
        "is_trainable": True,
        "ucg_rate": 0.1,
        "input_key": "cls",
        "target": "sgm.modules.encoders.modules.ClassEmbedder",
        "params": {"embed_dim": 16, "n_classes": 10},
    })
    path = workspace / "model_vector.yaml"
    path.write_text(yaml.safe_dump(graph))

    cfgs = ConfigNode.wrap({
        "model_cfg_path": str(path),
        "dataset_cfg_path": str(workspace / "dataset.yaml"),
        "load_ckpt_path": None,
        "batch_size": 1,
        "shuffle": False,
        "bf16": False,
    })
    bundle, params = init_model(cfgs, image_size=32)
    engine = bundle.engine
    gc = engine.general_conditioner
    assert gc is not None
    assert "embedders" in params and gc.trainable_embedders == ("3_ClassEmbedder",)

    loader = get_dataloader(cfgs, "train")
    batch = next(iter(loader))
    b, h, w, _ = batch["image"].shape
    batch["seg"] = np.zeros((b, h, w, 12), np.float32)
    batch["cls"] = np.zeros((b,), np.int32)

    # the conditioner routes the 2-d embedding to the vector key
    cond = gc(
        params,
        numpy_batch_to_device({k: v for k, v in batch.items()
                               if isinstance(v, np.ndarray)}),
        rng=jax.random.PRNGKey(0),
    )
    assert cond["vector"].shape == (b, 16)
    assert "t_crossattn" in cond and "concat" in cond

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(
        params, base_lr=1e-2, opt_keys=bundle.opt_keys, steps_per_epoch=1,
        trainable_embedders=gc.trainable_embedders,
    )
    step = make_train_step(engine.loss, opt, accum_steps=1, mesh=mesh, donate=False)
    state = TrainState.create(params, opt)
    keys = train_script.BATCH_KEYS + ("cls",)
    stacked = {k: batch[k] for k in keys if k in batch}
    state2, loss, _ = step(state, numpy_batch_to_device(stacked), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # the is_trainable embedder's params received an update
    before = jax.tree.leaves(params["embedders"])[0]
    after = jax.tree.leaves(state2.params["embedders"])[0]
    assert float(np.max(np.abs(np.asarray(after) - np.asarray(before)))) > 0


def test_train_py_flow(workspace):
    """One optimizer step through the actual train.py helpers."""
    import jax
    import numpy as np

    from udifftext_tpu.config import ConfigNode
    from udifftext_tpu.data import get_dataloader
    from udifftext_tpu.parallel.mesh import make_mesh
    from udifftext_tpu.parallel.train import TrainState, make_optimizer, make_train_step
    from util import init_model, numpy_batch_to_device
    import train as train_script

    cfgs = ConfigNode.wrap({
        "model_cfg_path": str(workspace / "model.yaml"),
        "dataset_cfg_path": str(workspace / "dataset.yaml"),
        "load_ckpt_path": None,
        "batch_size": 1,
        "base_learning_rate": 1e-4,
        "shuffle": False,
        "bf16": False,
    })
    bundle, params = init_model(cfgs, image_size=32)
    engine = bundle.engine
    loader = get_dataloader(cfgs, "train")
    batch = next(iter(loader))
    # ICDAR13 has no char segmentation → provide zero seg like eval-only data
    b, h, w, _ = batch["image"].shape
    batch["seg"] = np.zeros((b, h, w, 12), np.float32)

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(params, base_lr=1e-4, opt_keys=bundle.opt_keys, steps_per_epoch=1)
    step = make_train_step(engine.loss, opt, accum_steps=1, mesh=mesh, donate=False)
    state = TrainState.create(params, opt)
    stacked = {k: batch[k] for k in train_script.BATCH_KEYS if k in batch}
    state2, loss, _ = step(state, numpy_batch_to_device(stacked), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1


def test_test_py_flow_ocr_enabled(workspace, monkeypatch, capsys):
    """test.py with ocr_enabled=True: the loaded ParseqPredictor must survive
    pipeline construction and score the generated bbox crops — the reference
    runs this metric unconditionally (test.py:74-91,119-120)."""
    import jax
    import jax.numpy as jnp

    from udifftext_tpu.config import ConfigNode
    from udifftext_tpu.data import get_dataloader
    from udifftext_tpu.models.parseq import PARSeq, ParseqTokenizer
    from udifftext_tpu.ocr import ParseqPredictor
    import test as test_script
    from util import init_model, init_sampling

    pq = PARSeq(max_label_length=7, img_size=(16, 32), patch_size=(4, 8),
                embed_dim=32, enc_depth=1, enc_num_heads=2, dec_num_heads=2)
    ocr_predictor = ParseqPredictor(model=pq, tokenizer=ParseqTokenizer())
    pq_params = pq.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), 1)
    monkeypatch.setattr(
        test_script, "load_predictor", lambda cfgs: (ocr_predictor, pq_params)
    )

    cfgs = ConfigNode.wrap({
        "model_cfg_path": str(workspace / "model.yaml"),
        "dataset_cfg_path": str(workspace / "dataset.yaml"),
        "load_ckpt_path": None,
        "output_dir": str(workspace / "outputs_ocr"),
        "temp_dir": str(workspace / "temp_ocr"),
        "scale": [5.0, 0.0],
        "noise_iters": 0,
        "aae_enabled": False,
        "detailed": False,
        "bf16": False,
        "steps": 2,
        "batch_size": 1,
        "max_iter": 1,
        "shuffle": False,
        "quan_test": False,
        "ocr_enabled": True,
    })
    bundle, params = init_model(cfgs, image_size=32)
    sampler = init_sampling(cfgs)
    dataloader = get_dataloader(cfgs, "val")
    test_script.test(bundle, params, sampler, dataloader, cfgs)
    out = capsys.readouterr().out
    assert "OCR Result:" in out
    assert "OCR test completed. Mean accuracy:" in out


def test_train_step_ocr_loss(workspace):
    """ocr_enabled=True training: the decode→bbox-crop→clamped-CE OCR loss
    term participates in the jitted train step (engine.py loss path; reference
    loss.py:151-152,178-190)."""
    import dataclasses

    import yaml
    import jax
    import jax.numpy as jnp
    import numpy as np

    from udifftext_tpu.config import ConfigNode
    from udifftext_tpu.data import get_dataloader
    from udifftext_tpu.models.parseq import PARSeq, ParseqTokenizer
    from udifftext_tpu.ocr import ParseqPredictor
    from udifftext_tpu.parallel.mesh import make_mesh
    from udifftext_tpu.parallel.train import TrainState, make_optimizer, make_train_step
    from util import init_model, numpy_batch_to_device
    import train as train_script

    graph = yaml.safe_load(TINY_MODEL_YAML)
    loss_p = graph["model"]["params"]["loss_fn_config"]["params"]
    loss_p["ocr_enabled"] = True
    loss_p["lambda_ocr_loss"] = 0.001
    loss_p["predictor_config"] = {
        "target": "sgm.modules.predictors.model.ParseqPredictor",
        "params": {"ckpt_path": "/nonexistent/parseq-bb5792a6.pt"},
    }
    path = workspace / "model_ocr.yaml"
    path.write_text(yaml.safe_dump(graph))

    cfgs = ConfigNode.wrap({
        "model_cfg_path": str(path),
        "dataset_cfg_path": str(workspace / "dataset.yaml"),
        "load_ckpt_path": None,
        "batch_size": 1,
        "shuffle": False,
        "bf16": False,
    })
    bundle, params = init_model(cfgs, image_size=32)
    engine = bundle.engine
    assert engine.loss_cfg.ocr_enabled and engine.ocr_predictor is not None
    assert bundle.ckpt_paths["parseq"] == "/nonexistent/parseq-bb5792a6.pt"

    # tiny recognizer (full pos-query length so the loader's 25-char
    # parseq_label_ids fit) for CPU speed
    tok = ParseqTokenizer()
    pq = PARSeq(max_label_length=25, img_size=(16, 32), patch_size=(4, 8),
                embed_dim=32, enc_depth=1, enc_num_heads=2, dec_num_heads=2)
    engine = dataclasses.replace(
        engine, ocr_predictor=ParseqPredictor(model=pq, tokenizer=tok)
    )
    params["parseq"] = pq.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 32, 3)), 1)

    loader = get_dataloader(cfgs, "train")
    batch = next(iter(loader))
    assert "parseq_label_ids" in batch  # collate() tokenizes for the OCR loss
    b, h, w, _ = batch["image"].shape
    batch["seg"] = np.zeros((b, h, w, 12), np.float32)

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(params, base_lr=1e-4, opt_keys=bundle.opt_keys,
                         steps_per_epoch=1)
    step = make_train_step(engine.loss, opt, accum_steps=1, mesh=mesh, donate=False)
    state = TrainState.create(params, opt)
    stacked = {k: batch[k] for k in train_script.BATCH_KEYS if k in batch}
    state2, loss, loss_dict = step(
        state, numpy_batch_to_device(stacked), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss))
    assert "loss/ocr_loss" in loss_dict
    o = float(loss_dict["loss/ocr_loss"])
    assert np.isfinite(o) and 0.0 <= o <= 1.0 + 1e-6


def test_shipped_graph_gate_rejects_overrides():
    """The fused-Conditioner fast path must only claim configs it encodes
    exactly; overrides route to GeneralConditioner (review round 3)."""
    from udifftext_tpu.builders import _is_shipped_graph

    shipped = [
        {"target": "sgm.modules.encoders.modules.LabelEncoder",
         "ucg_rate": 0.1, "input_key": "label", "params": {}},
        {"target": "sgm.modules.encoders.modules.SpatialRescaler",
         "input_key": "mask", "params": {"multiplier": 0.125}},
        {"target": "sgm.modules.encoders.modules.LatentEncoder",
         "input_key": "masked", "params": {}},
    ]
    assert _is_shipped_graph(shipped)

    import copy

    reordered = [shipped[1], shipped[0], shipped[2]]
    assert not _is_shipped_graph(reordered)

    for mutate in (
        lambda e: e[0].update(emb_key="v_crossattn"),
        lambda e: e[0].update(is_trainable=True),
        lambda e: e[2].update(ucg_rate=0.1),
        lambda e: e[1].update(input_key="image"),
        lambda e: e[1]["params"].update(n_stages=3),
        lambda e: e[1]["params"].update(out_channels=4),
    ):
        cfg = copy.deepcopy(shipped)
        mutate(cfg)
        assert not _is_shipped_graph(cfg), mutate


def test_fast_path_defaults_match_reference_classes():
    """Omitted ucg_rate / multiplier fall back to the reference class
    defaults (0.0 / 0.5), not the shipped-YAML values (review round 3)."""
    import jax.numpy as jnp

    from udifftext_tpu.builders import build_diffusion_engine

    cfg = {
        "network_config": {"params": {
            "model_channels": 32, "num_res_blocks": 1,
            "attention_resolutions": [2, 1], "channel_mult": [1, 2],
            "num_head_channels": 8, "t_context_dim": 32,
        }},
        "first_stage_config": {"params": {"ddconfig": {
            "ch": 32, "out_ch": 3, "ch_mult": [1, 2], "num_res_blocks": 1,
            "attn_resolutions": [], "in_channels": 3, "resolution": 32,
            "z_channels": 4, "double_z": True,
        }, "embed_dim": 4}},
        "conditioner_config": {"params": {"emb_models": [
            {"target": "x.LabelEncoder", "input_key": "label",
             "params": {"max_len": 12, "emb_dim": 32, "n_heads": 4,
                        "n_trans_layers": 2}},
            {"target": "x.SpatialRescaler", "input_key": "mask", "params": {}},
            {"target": "x.LatentEncoder", "input_key": "masked", "params": {}},
        ]}},
    }
    bundle = build_diffusion_engine(cfg, unet_dtype=jnp.float32)
    assert bundle.engine.general_conditioner is None  # fast path claimed it
    assert bundle.engine.ucg_rate_label == 0.0
    assert bundle.engine.mask_multiplier == 0.5


def test_charseg_channels_truncate_and_pad():
    """seg channel stacks are exactly seq_len even for over-long text."""
    import numpy as np

    from udifftext_tpu.data.augment import charseg_from_values

    seg_rgb = np.zeros((16, 16, 3), np.uint8)
    seg_rgb[2:6, 2:6] = 10
    seg_rgb[2:6, 8:12] = 20
    out = charseg_from_values(seg_rgb, "ababab", [10, 20] * 3, seq_len=4)
    assert out.shape == (4, 16, 16)
    out2 = charseg_from_values(seg_rgb, "ab", [10, 20], seq_len=5)
    assert out2.shape == (5, 16, 16)
