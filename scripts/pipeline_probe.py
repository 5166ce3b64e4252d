"""Bisect the composed-pipeline slowdown: components (UNet step 184 ms,
VAE 236 ms) predict ~9.5 s per batch-16 sample() but bench measures ~14 s.

Times, each as ONE jit ending in a scalar reduction (float() host round-trip;
ROOFLINE.md measurement traps):
  A. lax.scan of 50 raw UNet CFG evals (no sampler math)     — expect ~9.2 s
  B. sample_euler_edm with the bench denoise fn (no VAE)     — locates sampler overhead
  C. B + chunked VAE decode + clip (the full bench pipeline) — expect B + 0.24 s

Usage: python scripts/pipeline_probe.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _zeros_params, cast_params_bf16  # noqa: E402


def bench_one(fn, *args, label=""):
    out = fn(*args)  # compile + warmup
    float(out)
    t0 = time.perf_counter()
    out = fn(*args)
    float(out)
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt:8.3f} s", flush=True)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from udifftext_tpu.diffusion import sampling as SP
    from udifftext_tpu.diffusion.denoiser import DiscreteDenoiser
    from udifftext_tpu.diffusion.guiders import VanillaCFG
    from udifftext_tpu.diffusion.schedules import LegacyDDPMDiscretization
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.models.vae import AutoencoderKL

    unet = UNetModel(dtype=jnp.bfloat16)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    unet_params = cast_params_bf16(
        _zeros_params(unet, jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)), jnp.zeros((1, 12, 2048)))
    )
    vae_params = _zeros_params(vae, jnp.zeros((1, 512, 512, 3)))

    denoiser = DiscreteDenoiser()
    guider = VanillaCFG(5.0)
    sigmas = jnp.asarray(LegacyDDPMDiscretization()(50, do_append_zero=True))

    b2 = 2 * b
    concat = jnp.zeros((b2, 64, 64, 5), jnp.bfloat16)
    ctx = jnp.zeros((b2, 12, 2048), jnp.bfloat16)
    cond = {"concat": concat, "t_crossattn": ctx}

    def network(xin, c_noise, c):
        x9 = jnp.concatenate([xin.astype(jnp.bfloat16), c["concat"]], axis=-1)
        return unet.apply(unet_params, x9, c_noise, c["t_crossattn"])

    def denoise(x, sigma):
        x2 = jnp.concatenate([x, x], axis=0)
        s2 = jnp.concatenate([sigma, sigma], axis=0)
        d, _ = denoiser(network, x2, s2, cond)
        return guider(d, sigma)

    # --- A: raw UNet scan, 50 iterations, no sampler math -------------------
    @jax.jit
    def scan50(x9, tn, c):
        def body(cur, _):
            out, _ = unet.apply(unet_params, cur, tn, c)
            out9 = jnp.concatenate([out, out, out[..., :1]], axis=-1)
            return out9.astype(cur.dtype), None

        out, _ = jax.lax.scan(body, x9, None, length=50)
        return jnp.sum(out.astype(jnp.float32))

    x9 = jnp.zeros((b2, 64, 64, 9), jnp.bfloat16)
    tn = jnp.zeros((b2,), jnp.float32)
    bench_one(scan50, x9, tn, ctx, label="A: scan(50) raw UNet CFG evals")

    # --- B: sampler without VAE ---------------------------------------------
    @jax.jit
    def sampler_only(rng):
        x = SP.init_latent(jax.random.normal(rng, (b, 64, 64, 4)), sigmas)
        z = SP.sample_euler_edm(denoise, x, sigmas)
        return jnp.sum(z)

    bench_one(sampler_only, jax.random.PRNGKey(0), label="B: sample_euler_edm (no VAE)")

    # --- C: full bench pipeline ---------------------------------------------
    decode_chunk = max(d for d in range(1, min(b, 16) + 1) if b % d == 0)

    @jax.jit
    def full(rng):
        x = SP.init_latent(jax.random.normal(rng, (b, 64, 64, 4)), sigmas)
        z = SP.sample_euler_edm(denoise, x, sigmas)
        zc = z.reshape(b // decode_chunk, decode_chunk, *z.shape[1:])
        img = jax.lax.map(
            lambda zz: vae.apply(vae_params, zz / 0.18215, method=AutoencoderKL.decode),
            zc,
        ).reshape(b, 512, 512, 3)
        return jnp.sum(jnp.clip((img + 1.0) / 2.0, 0.0, 1.0))

    bench_one(full, jax.random.PRNGKey(0), label="C: full bench pipeline")


if __name__ == "__main__":
    main()
