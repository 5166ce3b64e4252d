"""Pretrain the character-level LabelEncoder with the CLIP-style contrastive
objective against frozen ViTSTR visual features.

Parity: /root/reference/pretrain.py:24-39 + LabelEncoder.training_step
(sgm/modules/encoders/modules.py:1193-1237): symmetric contrastive loss +
char-identity CE + position CE (λ 0.1 each) on randomly rendered strings.
"""

from __future__ import annotations

import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from udifftext_tpu.charset import encode_labels
from udifftext_tpu.config import load_config
from udifftext_tpu.data.datasets import LabelDataset
from udifftext_tpu.data.loader import DataLoader
from udifftext_tpu.diffusion.loss import clip_contrastive_loss
from udifftext_tpu.models.label_encoder import LabelEncoderPretrain
from udifftext_tpu.models.vit import ViTSTREncoder
from udifftext_tpu.parallel.mesh import make_mesh
from udifftext_tpu.parallel.train import TrainState
from udifftext_tpu.utils.ckpt_orbax import save_checkpoint
from udifftext_tpu.utils.ckpt_torch import (
    convert_vitstr,
    load_torch_state_dict,
    merge_params,
)


def build_models(cfgs):
    mp = cfgs["model"]["params"]
    vis = (mp.get("visual_config", {}) or {}).get("params", {}) or {}
    model = LabelEncoderPretrain(
        max_len=mp.get("max_len", 12),
        emb_dim=mp.get("emb_dim", 2048),
        n_heads=mp.get("n_heads", 8),
        n_trans_layers=mp.get("n_trans_layers", 12),
        visual_len=(vis.get("size", 224) // vis.get("patch_size", 16)) ** 2 + 1,
        visual_dim=vis.get("embed_dim", 768),
    )
    visual = ViTSTREncoder(
        size=vis.get("size", 224),
        patch_size=vis.get("patch_size", 16),
        embed_dim=vis.get("embed_dim", 768),
        depth=vis.get("depth", 12),
        num_heads=vis.get("num_heads", 12),
        in_chans=vis.get("in_chans", 1),
    )
    return model, visual, mp, vis


def make_pretrain_step(model, visual, vparams, opt, lam_cls, lam_pos, mesh=None):
    """Jitted pretrain step, data-parallel over the mesh's `data` axis
    (reference pretrain.py:35-39 rides Lightning DDP the same way). The
    contrastive similarity matrix is batch-global, so the batch is sharded
    and XLA inserts the feature all-gather for the logit matmul."""

    def step(state, images, ids):
        visual_emb = visual.apply(vparams, images)  # frozen

        def loss_fn(p):
            out = model.apply(p, ids, visual_emb)
            loss, ld = clip_contrastive_loss(
                out["text_out"], out["visual_out"], out["logit_scale"],
                out["cls_out"], out["pos_out"], ids, lam_cls, lam_pos,
            )
            return loss, ld

        (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params, opt_state=opt_state), loss, ld

    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl, repl),
    )


def train(cfgs):
    model, visual, mp, vis = build_models(cfgs)
    dparams = cfgs["dataset"]["params"]
    dataset = LabelDataset(
        size=dparams.get("size", 224),
        length=dparams.get("length", 100000),
        font_path=dparams.get("font_path"),
        min_len=dparams.get("min_len", 1),
        max_len=dparams.get("max_len", 12),
    )
    loader = DataLoader(
        dataset, batch_size=int(cfgs.get("batch_size", 256)),
        max_label_len=mp.get("max_len", 12),
        # reference pretrain.py:23-27 hands num_workers to torch DataLoader;
        # >0 forks worker processes for the PIL glyph rendering
        num_workers=int(cfgs.get("num_workers", 0) or 0),
    )

    # random seed like train.py (reference seed_everything semantics,
    # pretrain.py has no fixed seed either)
    rng = jax.random.PRNGKey(random.randint(0, 2**31 - 1))
    k1, k2 = jax.random.split(rng)
    size = dparams.get("size", 224)
    params = model.init(
        k1, jnp.zeros((1, mp.get("max_len", 12)), jnp.int32),
        jnp.zeros((1, model.visual_len, model.visual_dim)),
    )
    vparams = visual.init(k2, jnp.zeros((1, size, size, 1)))

    # frozen ViTSTR weights if present
    vckpt = vis.get("ckpt_path")
    if vckpt and os.path.exists(str(vckpt)):
        conv = convert_vitstr(load_torch_state_dict(str(vckpt)))
        merged, *_ = merge_params(
            jax.tree.map(np.asarray, vparams["params"]), conv["params"]
        )
        vparams = {"params": jax.tree.map(jnp.asarray, merged)}
        print(f"[vitstr] loaded {vckpt}")

    lr = float(mp.get("lr", 1e-5))
    opt = optax.adamw(lr)
    state = TrainState.create(params, opt)

    lam_cls = float(mp.get("lambda_cls", 0.1))
    lam_pos = float(mp.get("lambda_pos", 0.1))
    # data axis must divide the batch (same fallback as train.py)
    bsz = int(cfgs.get("batch_size", 256))
    n_dev = len(jax.devices())
    n_data = max(d for d in range(1, n_dev + 1) if bsz % d == 0)
    if n_data < n_dev:
        print(f"[mesh] batch_size {bsz} not divisible by {n_dev} devices — "
              f"using {n_data}-way data parallelism")
    step = make_pretrain_step(model, visual, vparams, opt, lam_cls, lam_pos,
                              mesh=make_mesh(n_data=n_data,
                                             devices=jax.devices()[:n_data]))

    ckpt_dir = str(cfgs.get("ckpt_dir", "./checkpoints/encoders/LabelEncoder"))
    max_epochs = int(cfgs.get("lightning", {}).get("max_epochs", 1000))
    gstep = 0
    t0 = time.time()
    for epoch in range(max_epochs):
        for batch in loader:
            images = jnp.asarray(batch["image"])
            ids = jnp.asarray(batch["label_ids"])
            state, loss, ld = step(state, images, ids)
            gstep += 1
            if gstep % 10 == 0:
                print(
                    f"epoch {epoch} step {gstep} loss {float(loss):.4f} "
                    f"cls_acc {float(ld['acc/cls_acc']):.3f} "
                    f"clip_acc {float(ld['acc/clip_acc']):.3f} "
                    f"({(time.time() - t0) / 10:.2f}s/step)"
                )
                t0 = time.time()
        if (epoch + 1) % int(cfgs.get("check_freq", 5)) == 0:
            print(f"saved {save_checkpoint(ckpt_dir, state, gstep)}")


if __name__ == "__main__":
    cfgs = load_config("./configs/pretrain.yaml")
    train(cfgs)
