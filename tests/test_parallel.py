"""Data-parallel training step on an 8-device virtual CPU mesh.

Exercises: masked AdamW (only t_attn/t_norm update), grad accumulation,
batch sharding + XLA gradient all-reduce — the TPU-native replacement for the
reference's Lightning DDP (SURVEY.md §2c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.traverse_util as tu

from udifftext_tpu.parallel.mesh import make_mesh
from udifftext_tpu.parallel.train import (
    TrainState,
    make_optimizer,
    make_train_step,
    trainable_mask,
)


def _cpu_devices():
    try:
        return jax.devices("cpu")
    except RuntimeError:
        return []


pytestmark = pytest.mark.skipif(
    len(_cpu_devices()) < 8, reason="needs 8 virtual CPU devices"
)


def _tiny_setup():
    """A stand-in loss over a params tree shaped like the engine's: top-level
    {unet, vae} with t_attn/t_norm and frozen leaves."""
    params = {
        "unet": {
            "blocks_0": {
                "t_attn": {"to_q": {"kernel": jnp.ones((4, 4))}},
                "t_norm": {"scale": jnp.ones((4,))},
                "attn1": {"to_q": {"kernel": jnp.ones((4, 4))}},
            }
        },
        "vae": {"conv": {"kernel": jnp.ones((4, 4))}},
    }

    def loss_fn(p, batch, rng):
        x = batch["x"]  # (B, 4)
        h = x @ p["unet"]["blocks_0"]["t_attn"]["to_q"]["kernel"]
        h = h * p["unet"]["blocks_0"]["t_norm"]["scale"]
        h = h @ p["unet"]["blocks_0"]["attn1"]["to_q"]["kernel"]
        h = h @ p["vae"]["conv"]["kernel"]
        l = jnp.mean((h - batch["y"]) ** 2)
        return l, {"loss/diff_loss": l, "loss/full_loss": l}

    return params, loss_fn


def test_trainable_mask():
    params, _ = _tiny_setup()
    mask = trainable_mask(params, ("t_attn", "t_norm"))
    flat = {"/".join(k): v for k, v in tu.flatten_dict(mask).items()}
    assert flat["unet/blocks_0/t_attn/to_q/kernel"] is True
    assert flat["unet/blocks_0/t_norm/scale"] is True
    assert flat["unet/blocks_0/attn1/to_q/kernel"] is False
    assert flat["vae/conv/kernel"] is False


def test_data_parallel_masked_step_with_accum():
    params, loss_fn = _tiny_setup()
    mesh = make_mesh(n_data=8, devices=_cpu_devices()[:8])
    opt = make_optimizer(params, base_lr=1e-2, steps_per_epoch=10)
    step = make_train_step(loss_fn, opt, accum_steps=2, mesh=mesh, donate=False)

    state = TrainState.create(params, opt)
    rng = jax.random.PRNGKey(0)
    batch = {
        "x": jnp.asarray(np.random.RandomState(0).randn(16, 4), jnp.float32),
        "y": jnp.zeros((16, 4)),
    }
    with mesh:
        state2, loss, aux = step(state, batch, rng)
        state3, loss2, _ = step(state2, batch, rng)

    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    # the loss-component dict survives the accumulation scan
    # (reference logs every component per step, diffusion.py:151-171)
    assert set(aux) == {"loss/diff_loss", "loss/full_loss"}
    assert aux["loss/diff_loss"].shape == ()
    np.testing.assert_allclose(float(aux["loss/full_loss"]), float(loss), rtol=1e-5)
    # masked params moved
    before = params["unet"]["blocks_0"]["t_attn"]["to_q"]["kernel"]
    after = state3.params["unet"]["blocks_0"]["t_attn"]["to_q"]["kernel"]
    assert float(jnp.max(jnp.abs(after - before))) > 0
    # frozen params unchanged
    np.testing.assert_array_equal(
        np.asarray(state3.params["vae"]["conv"]["kernel"]),
        np.asarray(params["vae"]["conv"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(state3.params["unet"]["blocks_0"]["attn1"]["to_q"]["kernel"]),
        np.asarray(params["unet"]["blocks_0"]["attn1"]["to_q"]["kernel"]),
    )
    assert int(state3.step) == 2


def test_pretrain_step_data_parallel():
    """pretrain.py's step runs sharded on the 8-CPU mesh (reference
    pretrain.py:35-39 rides Lightning DDP; here the batch-global contrastive
    matrix forces XLA to all-gather features across the data axis)."""
    import optax

    from pretrain import make_pretrain_step
    from udifftext_tpu.models.label_encoder import LabelEncoderPretrain
    from udifftext_tpu.models.vit import ViTSTREncoder

    model = LabelEncoderPretrain(
        max_len=4, emb_dim=16, n_heads=2, n_trans_layers=1,
        visual_len=5, visual_dim=8,
    )
    visual = ViTSTREncoder(size=16, patch_size=8, embed_dim=8, depth=1,
                           num_heads=2, in_chans=1)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    params = model.init(
        k1, jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 5, 8))
    )
    vparams = visual.init(k2, jnp.zeros((1, 16, 16, 1)))

    mesh = make_mesh(n_data=8, devices=_cpu_devices()[:8])
    opt = optax.adamw(1e-4)
    step = make_pretrain_step(model, visual, vparams, opt, 0.1, 0.1, mesh=mesh)
    state = TrainState.create(params, opt)

    images = jnp.asarray(np.random.RandomState(0).randn(8, 16, 16, 1), jnp.float32)
    ids = jnp.asarray(np.random.RandomState(1).randint(1, 90, (8, 4)), jnp.int32)
    with mesh:
        state2, loss, ld = step(state, images, ids)
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    assert "loss/clip_loss" in ld


def test_lr_epoch_decay():
    from udifftext_tpu.parallel.train import epoch_decay_schedule

    sched = epoch_decay_schedule(1.0, steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert abs(float(sched(10)) - 0.95) < 1e-6
    assert abs(float(sched(25)) - 0.95**2) < 1e-6


def test_ema_update():
    from udifftext_tpu.parallel.train import ema_update

    ema = {"w": jnp.zeros((2,))}
    p = {"w": jnp.ones((2,))}
    out = ema_update(ema, p, step=jnp.asarray(0))
    # warmup: d = min(0.9999, 1/10) = 0.1 → ema = 0*0.1 + 1*0.9
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9, rtol=1e-6)


def test_tensor_parallel_matches_data_parallel():
    """Megatron-style TP sharding of the UNet transformers (parallel/
    sharding.py) produces the same loss as pure DP on a 2x4 dp-tp mesh —
    GSPMD inserts the tensor-axis collectives, numerics unchanged."""
    from udifftext_tpu.diffusion.loss import FullLossConfig
    from udifftext_tpu.engine import DiffusionEngine
    from udifftext_tpu.models.label_encoder import LabelEncoder
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.models.vae import AutoencoderKL, DDConfig
    from udifftext_tpu.parallel.sharding import state_shardings

    IMG, SEQ = 32, 12
    unet = UNetModel(
        in_channels=9, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=8,
        t_context_dim=32, attn_impl="xla",
    )
    vae = AutoencoderKL(
        DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(), in_channels=3, resolution=IMG, z_channels=4),
        embed_dim=4, attn_impl="xla",
    )
    le = LabelEncoder(max_len=SEQ, emb_dim=32, n_heads=4, n_trans_layers=1,
                      dim_feedforward=64)
    engine = DiffusionEngine(
        unet=unet, vae=vae, label_encoder=le,
        loss_cfg=FullLossConfig(min_attn_size=8),
        mask_multiplier=0.5, latent_factor=2,
    )
    k = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(k, jnp.zeros((1, IMG // 2, IMG // 2, 9)),
                          jnp.zeros((1,)), jnp.zeros((1, SEQ, 32))),
        "vae": vae.init(k, jnp.zeros((1, IMG, IMG, 3))),
        "label_encoder": le.init(k, jnp.zeros((1, SEQ), jnp.int32)),
    }
    rng = np.random.RandomState(0)
    b = 2
    batch = {
        "image": jnp.asarray(rng.randn(b, IMG, IMG, 3).astype(np.float32).clip(-1, 1)),
        "masked": jnp.zeros((b, IMG, IMG, 3)),
        "mask": jnp.ones((b, IMG, IMG, 1)),
        "seg": jnp.zeros((b, IMG, IMG, SEQ)).at[:, 8:16, 8:16, 0].set(1.0),
        "seg_mask": jnp.zeros((b, SEQ)).at[:, :2].set(1.0),
        "label_ids": jnp.ones((b, SEQ), jnp.int32),
    }

    opt = make_optimizer(params, base_lr=1e-4, steps_per_epoch=10)
    key = jax.random.PRNGKey(0)

    losses = {}
    for name, (nd, nt) in (("dp", (2, 1)), ("dp_tp", (2, 4))):
        mesh = make_mesh(n_data=nd, n_tensor=nt, devices=_cpu_devices()[: nd * nt])
        state = TrainState.create(params, opt)
        sh = (
            state_shardings(mesh, jax.eval_shape(lambda: state))
            if nt > 1 else None
        )
        step = make_train_step(engine.loss, opt, mesh=mesh, donate=False,
                               state_sharding_tree=sh)
        with mesh:
            state2, loss, aux = step(state, batch, key)
        losses[name] = float(loss)
        assert np.isfinite(losses[name])
        if nt > 1:
            # at least one param is actually tensor-sharded
            flat = jax.tree_util.tree_flatten_with_path(state2.params)[0]
            shardings = [
                l.sharding.spec for p, l in flat
                if "to_q" in jax.tree_util.keystr(p)
                and jax.tree_util.keystr(p).endswith("['kernel']")
            ]
            assert shardings and any("tensor" in str(s) for s in shardings), shardings

    np.testing.assert_allclose(losses["dp"], losses["dp_tp"], rtol=2e-4)


def test_warmup_cosine_cycles_schedule():
    """LambdaWarmUpCosineScheduler2 parity (sgm/lr_scheduler.py:51-111):
    per-cycle warmup + cosine decay, checked against a direct numpy replay."""
    from udifftext_tpu.parallel.train import warmup_cosine_cycles_schedule

    warm, fmin, fmax, fstart = [10, 5], [0.1, 0.0], [1.0, 0.5], [0.0, 0.1]
    lengths = [100, 50]
    sched = warmup_cosine_cycles_schedule(warm, fmin, fmax, fstart, lengths)

    def ref(n):
        cum = [0, 100, 150]
        cycle = 0 if n <= 100 else 1
        n = n - cum[cycle]
        if n < warm[cycle]:
            return (fmax[cycle] - fstart[cycle]) / warm[cycle] * n + fstart[cycle]
        t = min((n - warm[cycle]) / (lengths[cycle] - warm[cycle]), 1.0)
        return fmin[cycle] + 0.5 * (fmax[cycle] - fmin[cycle]) * (1 + np.cos(t * np.pi))

    for n in (0, 5, 10, 50, 99, 101, 104, 120, 149):
        np.testing.assert_allclose(float(sched(n)), ref(n), rtol=1e-5, atol=1e-6)


def test_loader_process_sharding():
    """Multi-host data loading: same-seed loaders with distinct process_index
    read disjoint strided shards that jointly cover the epoch."""
    import numpy as np

    from udifftext_tpu.data.loader import DataLoader

    dataset = [{"idx": np.asarray(i), "label": "ab"} for i in range(20)]
    seen = {}
    for pidx in (0, 1):
        dl = DataLoader(dataset, batch_size=2, shuffle=True, seed=7,
                        prefetch=0, process_index=pidx, process_count=2)
        assert len(dl) == 5
        idxs = []
        for batch in dl:
            assert batch["idx"].shape == (2,)
            idxs.extend(int(i) for i in batch["idx"])
        seen[pidx] = set(idxs)
    assert len(seen[0]) == 10 and len(seen[1]) == 10
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(20))


def test_loader_process_sharding_uneven_dataset():
    """len(dataset) % process_count != 0 must still give every process the
    SAME number of batches — unequal step counts would desynchronize the
    collective train step across hosts (review round 3)."""
    import numpy as np

    from udifftext_tpu.data.loader import DataLoader

    dataset = [{"idx": np.asarray(i), "label": "ab"} for i in range(47)]
    counts = {}
    for pidx in (0, 1):
        dl = DataLoader(dataset, batch_size=8, shuffle=True, seed=3,
                        prefetch=0, process_index=pidx, process_count=2)
        batches = list(dl)
        counts[pidx] = len(batches)
        assert len(dl) == len(batches)
    assert counts[0] == counts[1] == 2  # 46 usable → 23 per shard → 2 full


def test_jitted_predictor_rejects_indivisible_batch():
    """eval_data_parallel with batch % data-axis != 0 must fail with a clear
    message, not an opaque GSPMD sharding error (review round 3; the test
    config default batch_size is 1)."""
    import pytest as _pytest

    from udifftext_tpu.predict import JittedPredictor

    class _StubEngine:
        general_conditioner = None

        def sample(self, *a, **k):  # never reached
            raise AssertionError

    mesh = make_mesh(n_data=8, devices=_cpu_devices()[:8])
    pred = JittedPredictor(_StubEngine(), num_steps=2, noise_iters=1, mesh=mesh)
    batch = {"image": np.zeros((1, 8, 8, 3), np.float32)}
    with _pytest.raises(ValueError, match="divisible by the data-mesh"):
        pred({}, batch, jax.random.PRNGKey(0))


def test_make_global_batch_shards_over_data_axis():
    """make_global_batch assembles process-local numpy into global jax.Arrays
    sharded P('data') (multi-host path; on one process local data IS global)."""
    import jax
    import numpy as np

    from udifftext_tpu.parallel.mesh import make_mesh
    from udifftext_tpu.parallel.multihost import make_global_batch

    mesh = make_mesh(n_data=4, n_tensor=2, devices=jax.devices()[:8])
    batch = {
        "image": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3),
        "label_ids": np.ones((8, 12), np.int32),
        "label": ["ab"] * 8,
    }
    out = make_global_batch(batch, mesh)
    assert out["label"] == ["ab"] * 8  # non-array passthrough
    img = out["image"]
    assert isinstance(img, jax.Array) and img.shape == (8, 4, 4, 3)
    spec = img.sharding.spec
    assert tuple(spec)[:1] == ("data",)
    np.testing.assert_array_equal(np.asarray(img), batch["image"])
    # each data shard owns 2 consecutive batch rows
    shard_shapes = {s.data.shape for s in img.addressable_shards}
    assert shard_shapes == {(2, 4, 4, 3)}


def test_swa_update_running_mean():
    """swa_update is an equal-weight running mean (Lightning SWA semantics,
    reference src/parseq/train.py:69) and accepts a traced count."""
    import jax
    import jax.numpy as jnp

    from udifftext_tpu.parallel.train import swa_update

    snaps = [{"w": jnp.asarray(float(v))} for v in (1.0, 5.0, 9.0)]
    avg = snaps[0]
    jit_swa = jax.jit(swa_update)
    for n, p in enumerate(snaps[1:], start=1):
        avg = jit_swa(avg, p, jnp.asarray(n, jnp.float32))
    assert abs(float(avg["w"]) - 5.0) < 1e-6  # mean(1, 5, 9)
    # n_avg=0 returns the incoming params regardless of the carry
    fresh = swa_update({"w": jnp.asarray(123.0)}, {"w": jnp.asarray(2.0)}, 0)
    assert float(fresh["w"]) == 2.0


def test_data_parallel_serving_matches_single_device():
    """Multi-chip serving (scripts/serve.py --dp): an InpaintService backed by
    a JittedPredictor over an 8-device `data` mesh returns the same images as
    the single-device service — GSPMD shards each dispatched group's batch dim
    across the mesh without changing the math (up to float reassociation)."""
    from udifftext_tpu.diffusion.loss import FullLossConfig
    from udifftext_tpu.engine import DiffusionEngine
    from udifftext_tpu.models.label_encoder import LabelEncoder
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.models.vae import AutoencoderKL, DDConfig
    from udifftext_tpu.predict import JittedPredictor
    from udifftext_tpu.serving import InpaintRequest, InpaintService

    IMG, SEQ = 32, 12
    unet = UNetModel(
        in_channels=9, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=8,
        t_context_dim=32, attn_impl="xla",
    )
    vae = AutoencoderKL(
        DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(), in_channels=3, resolution=IMG, z_channels=4),
        embed_dim=4, attn_impl="xla",
    )
    le = LabelEncoder(max_len=SEQ, emb_dim=32, n_heads=4, n_trans_layers=1,
                      dim_feedforward=64)
    engine = DiffusionEngine(
        unet=unet, vae=vae, label_encoder=le,
        loss_cfg=FullLossConfig(min_attn_size=8),
        mask_multiplier=0.5, latent_factor=2,
    )
    k = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(k, jnp.zeros((1, IMG // 2, IMG // 2, 9)),
                          jnp.zeros((1,)), jnp.zeros((1, SEQ, 32))),
        "vae": vae.init(k, jnp.zeros((1, IMG, IMG, 3))),
        "label_encoder": le.init(k, jnp.zeros((1, SEQ), jnp.int32)),
    }

    rng = np.random.RandomState(7)
    reqs = [
        InpaintRequest(
            image=rng.randint(0, 255, (IMG, IMG, 3), np.uint8),
            mask=(np.arange(IMG)[:, None] + np.arange(IMG)[None, :] > i).astype(np.uint8),
            text=t,
        )
        for i, t in enumerate(["ab", "cd", "xyz"])
    ]

    def build_service(mesh, dp):
        pred = JittedPredictor(engine, num_steps=2, noise_iters=1, mesh=mesh)
        base_key = jax.random.PRNGKey(11)

        def run(arr_batch, key):
            import contextlib
            ctx = mesh if mesh is not None else contextlib.nullcontext()
            with ctx:
                imgs, _ = pred(params, arr_batch, jax.random.fold_in(base_key, key))
            return np.asarray(imgs)

        return InpaintService(run, max_batch=8, max_delay_ms=1.0, size=IMG,
                              seq_len=SEQ, dp=dp)

    outs = {}
    for name, mesh, dp in (
        ("single", None, 1),
        ("dp8", make_mesh(n_data=8, devices=_cpu_devices()[:8]), 8),
    ):
        svc = build_service(mesh, dp)
        futs = [svc.submit(r) for r in reqs]
        res = [f.result(timeout=600) for f in futs]
        svc.shutdown()
        assert [r["batch_size"] for r in res] == [8, 8, 8]
        outs[name] = np.stack([r["image"].astype(np.int32) for r in res])

    # uint8 images: reassociation can flip a pixel by ±1 across the quantize
    assert np.max(np.abs(outs["single"] - outs["dp8"])) <= 1
