"""Per-stage breakdown of the fine-tuning step (bench.py train mode).

Each stage is a K-repetition lax.scan inside ONE jit (axon relay ~24 ms per
dispatch; see ROOFLINE.md measurement traps), timed on the second call and
ended by float() of an on-device scalar.

Usage: python scripts/train_probe.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _zeros_params, cast_params_bf16  # noqa: E402


def timed_scan(body, init_carry, label, K=4):
    @jax.jit
    def run():
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), init_carry, None, length=K)
        return jnp.sum(jax.tree_util.tree_leaves(c)[0].astype(jnp.float32))

    float(run())  # compile + warm
    t0 = time.perf_counter()
    float(run())
    dt = (time.perf_counter() - t0) / K
    print(f"{label:44s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.models.vae import AutoencoderKL

    # --- VAE encode: fp32 (reference parity) vs bf16 --------------------
    img = jnp.zeros((b, 512, 512, 3), jnp.float32)
    for dtype, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        vae = AutoencoderKL(dtype=dtype)
        vp = _zeros_params(vae, jnp.zeros((1, 512, 512, 3)))

        def enc(c, vae=vae, vp=vp):
            m = vae.apply(vp, c.astype(vae.dtype), method=AutoencoderKL.encode_moments)
            # keep carry shape: broadcast the mean back up (negligible cost)
            return jnp.broadcast_to(m[..., :1, :1, :3].mean(-1, keepdims=True), c.shape).astype(c.dtype)

        timed_scan(enc, img, f"vae encode {name} (B={b}, 512^2)")

    # --- UNet fwd / fwd+bwd at the training latent shape ----------------
    unet = UNetModel(dtype=jnp.bfloat16)
    up = cast_params_bf16(
        _zeros_params(unet, jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)), jnp.zeros((1, 12, 2048)))
    )
    x9 = jnp.zeros((b, 64, 64, 9), jnp.bfloat16)
    tn = jnp.full((b,), 10.0, jnp.float32)
    ctx = jnp.zeros((b, 12, 2048), jnp.bfloat16)

    def fwd(c):
        out, _ = unet.apply(up, c, tn, ctx)
        return jnp.concatenate([out, out, c[..., 8:]], axis=-1).astype(c.dtype)

    timed_scan(fwd, x9, f"unet fwd (B={b}, latent 64^2)")

    def fwd_capture(c):
        out, aux = unet.apply(up, c, tn, ctx, capture_attn=True)
        extra = sum(jnp.sum(a).astype(jnp.bfloat16) for a in jax.tree_util.tree_leaves(aux))
        return (jnp.concatenate([out, out, c[..., 8:]], axis=-1) + extra).astype(c.dtype)

    timed_scan(fwd_capture, x9, f"unet fwd + attn-map capture (B={b})")

    def loss_of(p, c):
        out, _ = unet.apply(p, c, tn, ctx)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def _gsum(g):
        # consume EVERY grad leaf — keeping only one alive lets XLA DCE the
        # rest of the backward (the first probe of the trainable-only stage
        # read a frozen leaf's zero grad and measured 8.7 ms of nothing)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))

    def fwd_bwd(c):
        g = jax.grad(loss_of)(up, c)
        return (c + _gsum(g)).astype(c.dtype)

    timed_scan(fwd_bwd, x9, f"unet fwd+bwd full-tree grads (B={b})")

    # grads only for the trainable branch (t_attn/t_norm), frozen weights
    # behind stop_gradient — what masked AdamW actually needs
    from udifftext_tpu.parallel.train import trainable_mask

    mask = trainable_mask({"unet": up}, ("t_attn", "t_norm"))["unet"]

    def loss_trainable(pt, c):
        merged = jax.tree_util.tree_map(
            lambda m, a, frozen: a if m else jax.lax.stop_gradient(frozen),
            mask, pt, up,
        )
        out, _ = unet.apply(merged, c, tn, ctx)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def fwd_bwd_trainable(c):
        g = jax.grad(loss_trainable)(up, c)
        return (c + _gsum(g)).astype(c.dtype)

    timed_scan(fwd_bwd_trainable, x9, f"unet fwd+bwd trainable-only grads (B={b})")


if __name__ == "__main__":
    main()
