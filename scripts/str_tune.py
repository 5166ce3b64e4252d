"""Learning-rate search for PARSeq training (src/parseq/tune.py parity).

The reference uses ray-tune's ASHA over LR; here a simple log-space sweep of
short training runs picks the best final loss (ray is not available).

Usage: python scripts/str_tune.py --data_root <root> [--trials 6 --steps 60]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr_min", type=float, default=1e-5)
    ap.add_argument("--lr_max", type=float, default=3e-3)
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

    items = load_folder(args.data_root)
    assert items, f"no labels.txt data under {args.data_root}"
    tok = ParseqTokenizer()
    model = PARSeq()
    params0 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)), 1)

    lrs = np.exp(np.linspace(np.log(args.lr_min), np.log(args.lr_max), args.trials))
    results = []
    for lr in lrs:
        opt = optax.adamw(float(lr))
        opt_state = opt.init(params0)
        params = params0

        @jax.jit
        def step(params, opt_state, images, ids, cms, qms):
            loss, grads = jax.value_and_grad(
                lambda p: parseq_training_loss(model, p, images, ids,
                                               content_masks=cms, query_masks=qms)
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(0)
        last = float("nan")
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
            perms = gen_tgt_perms(rng, ids.shape[1] - 2)
            cms, qms = perm_attn_masks(perms)
            params, opt_state, loss = step(params, opt_state, images, ids,
                                           jnp.asarray(cms), jnp.asarray(qms))
            last = float(loss)
        print(f"lr {lr:.2e}: final loss {last:.4f}")
        results.append((last, lr))

    best = min(results)
    print(f"best lr: {best[1]:.2e} (loss {best[0]:.4f})")


if __name__ == "__main__":
    main()
