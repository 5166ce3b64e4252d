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
from udifftext_tpu.parallel.train import TrainState, make_optimizer, make_train_step
from udifftext_tpu.utils.ckpt_orbax import latest_checkpoint, restore_checkpoint, save_checkpoint
from udifftext_tpu.utils.profiling import SimpleProfiler
from util import init_model, numpy_batch_to_device


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


def train(cfgs):
    maybe_init_distributed()
    profiler = SimpleProfiler()
    seed = random.randint(0, 2**31 - 1)  # reference uses a random seed (train.py:26-27)
    print(f"seed: {seed}")

    dataloader = get_dataloader(cfgs, "train")
    bundle, params = init_model(cfgs, seed=seed)
    engine = bundle.engine

    mesh = make_mesh()
    accum = int(cfgs.get("lightning", {}).get("accumulate_grad_batches", 1))
    max_epochs = int(cfgs.get("lightning", {}).get("max_epochs", 100))
    steps_per_epoch = max(len(dataloader) // max(accum, 1), 1)

    optimizer = make_optimizer(
        params,
        base_lr=float(cfgs.get("base_learning_rate", 5e-5)),
        opt_keys=bundle.opt_keys,
        steps_per_epoch=steps_per_epoch,
    )
    use_ema = bool(cfgs.get("use_ema", False))
    step_fn = make_train_step(
        engine.loss, optimizer, accum_steps=accum, mesh=mesh, use_ema=use_ema
    )
    state = TrainState.create(params, optimizer, use_ema=use_ema)

    ckpt_dir = os.path.join(str(cfgs.get("save_ckpt_dir", "./checkpoints")), "udifftext_tpu")
    resume = latest_checkpoint(ckpt_dir)
    if resume:
        print(f"resuming from {resume}")
        state = restore_checkpoint(resume, jax.eval_shape(lambda: state))

    rng = jax.random.PRNGKey(seed)
    global_step = int(state.step)
    t0 = time.time()
    with mesh:
        for epoch in range(max_epochs):
            micro_accum = []
            for batch in dataloader:
                micro_accum.append(batch)
                if len(micro_accum) < accum:
                    continue
                stacked = {
                    k: np.concatenate([mb[k] for mb in micro_accum], axis=0)
                    for k in BATCH_KEYS
                    if k in micro_accum[0]
                }
                micro_accum = []
                with profiler.profile("host_to_device"):
                    dev_batch = numpy_batch_to_device(stacked)
                rng, sub = jax.random.split(rng)
                with profiler.profile("train_step"):
                    state, loss, aux = step_fn(state, dev_batch, sub)
                global_step += 1
                if global_step % 10 == 0:
                    dt = time.time() - t0
                    print(
                        f"epoch {epoch} step {global_step} "
                        f"loss {float(loss):.4f} ({dt / 10:.2f}s/step)"
                    )
                    t0 = time.time()
            if (epoch + 1) % int(cfgs.get("save_ckpt_freq", 1)) == 0:
                with profiler.profile("checkpoint"):
                    path = save_checkpoint(ckpt_dir, state, global_step)
                print(f"saved {path}")
    profiler.print_summary()  # Lightning `profiler: simple` parity


if __name__ == "__main__":
    cfgs = load_config("./configs/train.yaml")
    train(cfgs)
