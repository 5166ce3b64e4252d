"""PARSeq training (src/parseq/train.py parity, TPU-native).

Permutation-language-modeling fine-tuning of PARSeq on folder datasets
(labels.txt layout, see str_test.py) with OneCycle-style warmup (the
reference uses OneCycleLR with warmup_pct).

Usage: python scripts/str_train.py --data_root <root> [--steps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=7e-4)
    ap.add_argument("--warmup_pct", type=float, default=0.075)
    ap.add_argument("--perm_num", type=int, default=6)
    ap.add_argument("--ckpt_dir", default="./checkpoints/parseq_tpu")
    ap.add_argument("--swa", action="store_true",
                    help="stochastic weight averaging over the training tail "
                         "(reference: Lightning StochasticWeightAveraging("
                         "swa_epoch_start=0.75), src/parseq/train.py:69); the "
                         "SAVED checkpoint carries the averaged params")
    ap.add_argument("--swa_start_pct", type=float, default=0.75)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from scripts.str_test import load_folder
    from udifftext_tpu.models.parseq import (
        PARSeq, ParseqTokenizer, gen_tgt_perms, parseq_training_loss,
        perm_attn_masks,
    )
    from udifftext_tpu.parallel.train import TrainState, swa_update
    from udifftext_tpu.utils.ckpt_orbax import save_checkpoint

    items = load_folder(args.data_root)
    assert items, f"no labels.txt data under {args.data_root}"
    tok = ParseqTokenizer()
    model = PARSeq()

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)), 1)
    sched = optax.cosine_onecycle_schedule(
        args.steps, args.lr, pct_start=args.warmup_pct
    )
    opt = optax.chain(optax.clip_by_global_norm(20.0), optax.adamw(sched))
    state = TrainState.create(params, opt)

    def loss_fn(p, images, ids, cms, qms):
        return parseq_training_loss(model, p, images, ids,
                                    content_masks=cms, query_masks=qms)

    @jax.jit
    def step(state, images, ids, cms, qms):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images, ids, cms, qms)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params, opt_state=opt_state), loss

    swa_from = int(args.steps * args.swa_start_pct) if args.swa else args.steps
    swa_avg, swa_n = None, 0
    swa_step = jax.jit(swa_update)

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.steps):
        idx = rng.choice(len(items), args.batch)
        imgs, labels = [], []
        for j in idx:
            open_fn, label = items[j]
            im = np.asarray(open_fn().convert("RGB"), np.float32) / 255.0
            imgs.append(cv2.resize(im, (128, 32), interpolation=cv2.INTER_CUBIC))
            labels.append(label)
        images = jnp.asarray((np.stack(imgs) - 0.5) / 0.5)
        ids = jnp.asarray(tok.encode(labels))
        perms = gen_tgt_perms(rng, ids.shape[1] - 2, perm_num=args.perm_num)
        cms, qms = perm_attn_masks(perms)
        state, loss = step(state, images, ids, jnp.asarray(cms), jnp.asarray(qms))
        if args.swa and i >= swa_from:
            swa_avg = state.params if swa_avg is None else swa_step(
                swa_avg, state.params, jnp.asarray(swa_n, jnp.float32)
            )
            swa_n += 1
        if (i + 1) % 20 == 0:
            print(f"step {i+1}/{args.steps} loss {float(loss):.4f} "
                  f"({(time.time()-t0)/20:.2f}s/step)")
            t0 = time.time()
    if args.swa and swa_avg is not None:
        # the checkpoint (what str_test.py evaluates) carries the averaged
        # params, matching Lightning SWA's swap-in-at-end semantics
        state = state.replace(params=swa_avg)
        print(f"swa: averaged {swa_n} snapshots from step {swa_from + 1}")
    print(f"saved {save_checkpoint(args.ckpt_dir, state, args.steps)}")


if __name__ == "__main__":
    main()
