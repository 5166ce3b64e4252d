"""Fine-tune UDiffText (t_attn/t_norm cross-attention branches) on scene-text
data — the TPU-native `python train.py`.

Parity: /root/reference/train.py:15-41 + the DiffusionEngine training path
(sgm/models/diffusion.py:144-222): frozen VAE + LabelEncoder, masked AdamW
over t_attn/t_norm, grad accumulation, per-epoch ×0.95 LR decay. Lightning
DDP is replaced by a 1-D data mesh (all devices) with XLA all-reduce.
"""

from __future__ import annotations

import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from udifftext_tpu.config import load_config
from udifftext_tpu.data import get_dataloader
from udifftext_tpu.parallel.mesh import make_mesh
from udifftext_tpu.parallel.multihost import make_global_batch
from udifftext_tpu.parallel.train import TrainState, make_optimizer, make_train_step
from udifftext_tpu.utils.ckpt_orbax import (
    AsyncCheckpointWriter,
    latest_checkpoint,
    restore_checkpoint,
)
from udifftext_tpu.utils.logger import MetricsLogger
from udifftext_tpu.utils.profiling import SimpleProfiler
from util import init_model


def maybe_init_distributed():
    """Multi-host init (replaces Lightning DDP process management): activated
    by the standard JAX cluster env vars when running on a multi-host slice;
    a no-op on a single host."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        print(f"distributed: process {jax.process_index()}/{jax.process_count()}")

BATCH_KEYS = (
    "image", "masked", "mask", "seg", "seg_mask", "label_ids",
    "r_bbox", "parseq_label_ids",  # consumed when ocr_enabled
)


def save_image_logs(engine, params, batch, rng, img_dir, step, n=4, num_steps=20):
    """Training-time image observability (reference ImageLogger callback over
    diffusion.py:280-335): inputs / reconstructions / fresh samples as PNGs."""
    from PIL import Image

    logs = engine.log_images(params, batch, rng, n=n, num_steps=num_steps)
    os.makedirs(img_dir, exist_ok=True)
    for key, imgs in logs.items():
        arr = np.asarray(imgs, np.float32)
        arr = np.clip((arr + 1.0) / 2.0, 0.0, 1.0)
        row = np.concatenate(list(arr), axis=1)  # side-by-side grid
        Image.fromarray((row * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"step{step:07d}_{key}.png")
        )


def train(cfgs):
    maybe_init_distributed()
    profiler = SimpleProfiler()
    seed = random.randint(0, 2**31 - 1)  # reference uses a random seed (train.py:26-27)
    print(f"seed: {seed}")

    dataloader = get_dataloader(cfgs, "train")
    bundle, params = init_model(cfgs, seed=seed)
    engine = bundle.engine

    accum = int(cfgs.get("lightning", {}).get("accumulate_grad_batches", 1))
    # data axis must evenly shard each microbatch; degenerate batches fall
    # back to fewer devices instead of a divisibility error. The fallback is
    # single-host only: slicing jax.devices() on a multi-host pod would leave
    # processes outside the mesh — there, require divisibility up front.
    micro_b = int(cfgs.get("batch_size", 1))
    n_dev = len(jax.devices())
    if jax.process_count() > 1:
        if micro_b % n_dev != 0:
            raise ValueError(
                f"multi-host run: batch_size {micro_b} must be divisible by "
                f"the global device count {n_dev}"
            )
        n_data = n_dev
    else:
        n_data = max(d for d in range(1, n_dev + 1) if micro_b % d == 0)
        if n_data < n_dev:
            print(f"[mesh] batch_size {micro_b} not divisible by {n_dev} devices "
                  f"— using {n_data}-way data parallelism")
    mesh = make_mesh(n_data=n_data, devices=jax.devices()[:n_data])
    max_epochs = int(cfgs.get("lightning", {}).get("max_epochs", 100))
    steps_per_epoch = max(len(dataloader) // max(accum, 1), 1)

    gc = engine.general_conditioner
    optimizer = make_optimizer(
        params,
        base_lr=float(cfgs.get("base_learning_rate", 5e-5)),
        opt_keys=bundle.opt_keys,
        steps_per_epoch=steps_per_epoch,
        trainable_embedders=gc.trainable_embedders if gc is not None else (),
    )
    use_ema = bool(cfgs.get("use_ema", False))
    step_fn = make_train_step(
        engine.loss, optimizer, accum_steps=accum, mesh=mesh, use_ema=use_ema
    )
    state = TrainState.create(params, optimizer, use_ema=use_ema)

    ckpt_dir = os.path.join(str(cfgs.get("save_ckpt_dir", "./checkpoints")), "udifftext_tpu")
    logger = MetricsLogger(str(cfgs.get("log_dir", "./logs")))
    resume = latest_checkpoint(ckpt_dir)
    if resume:
        print(f"resuming from {resume}")
        state = restore_checkpoint(resume, jax.eval_shape(lambda: state))

    # generic embedder graphs may consume extra array batch keys (e.g. a
    # ClassEmbedder's class ids)
    extra_keys = tuple(e.input_key for e in gc.embedders) if gc is not None else ()
    batch_keys = tuple(dict.fromkeys(BATCH_KEYS + extra_keys))

    rng = jax.random.PRNGKey(seed)
    global_step = int(state.step)
    t0 = time.time()
    # async writer: epoch-boundary saves snapshot to host and write to disk
    # on a background thread instead of stalling the step loop. Context
    # manager so a crash mid-epoch still flushes the in-flight write —
    # otherwise the last save could die as an orbax tmp dir and resume
    # would fall back a full extra epoch.
    with AsyncCheckpointWriter(
        ckpt_dir, keep=int(cfgs.get("keep_ckpts", 3))
    ) as ckpt_writer, mesh:
        for epoch in range(max_epochs):
            micro_accum = []
            for batch in dataloader:
                micro_accum.append(batch)
                if len(micro_accum) < accum:
                    continue
                stacked = {
                    k: np.concatenate([mb[k] for mb in micro_accum], axis=0)
                    for k in batch_keys
                    if k in micro_accum[0]
                }
                micro_accum = []
                with profiler.profile("host_to_device"):
                    # single-host: plain device_put; multi-host: each
                    # process contributes its loader shard to the global
                    # array (jax.make_array_from_process_local_data)
                    dev_batch = make_global_batch(stacked, mesh)
                rng, sub = jax.random.split(rng)
                with profiler.profile("train_step"):
                    state, loss, aux = step_fn(state, dev_batch, sub)
                global_step += 1
                if global_step % 10 == 0:
                    dt = time.time() - t0
                    # every loss component, like the reference's per-step
                    # log_dict (diffusion.py:151-171)
                    comps = {k: float(v) for k, v in sorted(aux.items())}
                    logger.log(global_step, {"loss": float(loss), **comps}, epoch=epoch)
                    comp_str = " ".join(
                        f"{k.split('/')[-1]} {v:.4f}" for k, v in comps.items()
                    )
                    print(
                        f"epoch {epoch} step {global_step} "
                        f"loss {float(loss):.4f} {comp_str} ({dt / 10:.2f}s/step)"
                    )
                    t0 = time.time()
                img_freq = int(cfgs.get("log_images_freq", 0))
                if img_freq and global_step % img_freq == 0:
                    # sample with EMA weights when enabled — the reference
                    # plots under ema_scope (diffusion.py:322)
                    log_params = (
                        state.ema_params if state.ema_params is not None
                        else state.params
                    )
                    save_image_logs(
                        engine, log_params, dev_batch, sub,
                        os.path.join(str(cfgs.get("log_dir", "./logs")), "images"),
                        global_step,
                        num_steps=int(cfgs.get("log_images_steps", 20)),
                    )
            if (epoch + 1) % int(cfgs.get("save_ckpt_freq", 1)) == 0:
                with profiler.profile("checkpoint"):
                    path = ckpt_writer.save(state, global_step)
                print(f"saving {path} (async)")
    profiler.print_summary()  # Lightning `profiler: simple` parity


if __name__ == "__main__":
    cfgs = load_config("./configs/train.yaml")
    train(cfgs)
