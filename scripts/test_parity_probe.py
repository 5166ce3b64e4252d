"""Stage-level measured-vs-composed table for the HONEST test.py scope.

ROOFLINE's round-4 table itemized the default bench scope (50-step CFG scan
+ bf16 decode) down to per-op floors. This probe does the same decomposition
for the `test_parity` scope (the reference's full test.py predict flow,
/root/reference/test.py:19-40): conditioner -> 10-candidate init-noise
search (2-step rollout each, sampling.py:264-322) -> 50-step CFG scan ->
fp32 VAE decode — each stage timed as a K-rep scan inside ONE jit on the
flagship graph at B=16, plus the full composed pipeline, so the table shows
whether composition adds anything over the sum of stages.

Methodology per ROOFLINE.md: float() of an on-device scalar closes every
window, ~24 ms fixed dispatch subtracted, best of 2 windows, quiet chip.

Usage: python scripts/test_parity_probe.py [batch=16]  (run from repo root)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import cast_params_bf16  # noqa: E402

from udifftext_tpu.builders import build_diffusion_engine  # noqa: E402
from udifftext_tpu.config import load_config  # noqa: E402
from udifftext_tpu.diffusion import sampling as SP  # noqa: E402
from udifftext_tpu.loading import init_engine_params  # noqa: E402


def timed_stage(fn, K: int, label: str) -> float:
    """Best-of-2 windows of a K-rep scan; fn: scalar carry -> scalar carry
    (the carry dependency keeps XLA from hoisting the body out of the scan)."""

    @jax.jit
    def run(s0):
        def body(s, _):
            return fn(s), None

        s, _ = jax.lax.scan(body, s0, None, length=K)
        return s

    z = jnp.float32(0.0)
    float(run(z))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(z))
        best = min(best, (time.perf_counter() - t0 - 0.024) / K)
    print(f"{label:52s} {best * 1e3:9.1f} ms  (K={K})", flush=True)
    return best


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    model_cfg = load_config("./configs/test/textdesign_sd_2.yaml")
    bundle = build_diffusion_engine(
        model_cfg["model"]["params"], unet_dtype=jnp.bfloat16
    )
    eng = bundle.engine
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: init_engine_params(bundle, jax.random.PRNGKey(0))),
    )
    params["unet"] = cast_params_bf16(params["unet"])

    mask = jnp.zeros((b, 512, 512, 1)).at[:, 128:384, 128:384].set(1.0)
    batch = {
        "image": jnp.zeros((b, 512, 512, 3)),
        "masked": jnp.zeros((b, 512, 512, 3)),
        "mask": mask,
        "seg": jnp.zeros((b, 512, 512, 12)),
        "seg_mask": jnp.ones((b, 12)),
        "label_ids": jnp.ones((b, 12), jnp.int32),
    }
    shape = (b, 64, 64, 4)
    rng = jax.random.PRNGKey(0)

    # the stage inputs the full pipeline would hand each stage
    c, uc = jax.jit(lambda p, bt: eng.conditionings(p, bt))(params, batch)
    sigmas = jnp.asarray(eng.discretization(50, do_append_zero=True))
    z_latent = jnp.zeros(shape)

    def mix(s, out):
        # carry dependency: fold the stage output into the scalar carry
        return s + jnp.sum(out.astype(jnp.float32)) * 1e-30

    def cond_stage(s):
        bt = dict(batch)
        bt["masked"] = batch["masked"] + s  # carry -> input dependency
        cc, uu = eng.conditionings(params, bt)
        # consume EVERY leaf — mixing in only t_crossattn lets XLA DCE the
        # VAE encode of the masked image (the concat latents go unused)
        out = s
        for leaf in jax.tree.leaves((cc, uu)):
            out = mix(out, leaf)
        return out

    def search_stage(s):
        key = jax.random.fold_in(rng, (s * 1e30).astype(jnp.int32) % 97)
        x0 = eng.get_init_noise(params, c, uc, batch, key, shape, 5.0, 10)
        return mix(s, x0)

    def scan50_stage(s):
        denoise = eng.make_denoise_fn(params, c, uc, 5.0)
        x = SP.init_latent(z_latent + s, sigmas)
        z = SP.sample_euler_edm(denoise, x, sigmas)
        return mix(s, z)

    def decode_stage(s):
        img = eng.decode_first_stage(params, z_latent + s)
        return mix(s, img)

    def full_stage(s):
        bt = dict(batch)
        bt["masked"] = batch["masked"] + s
        key = jax.random.fold_in(rng, (s * 1e30).astype(jnp.int32) % 97)
        img, _ = eng.sample(params, bt, key, num_steps=50, cfg_scale=5.0,
                            noise_iters=10)
        return mix(s, img)

    print(f"test_parity stage probe, B={b} (flagship graph, bf16 UNet, "
          f"fp32 VAE)", flush=True)
    t_cond = timed_stage(cond_stage, 6, "conditioner (LabelEnc + fp32 VAE encode + rescale)")
    t_dec = timed_stage(decode_stage, 6, "fp32 VAE decode 64^2 -> 512^2")
    t_scan = timed_stage(scan50_stage, 3, "50-step CFG Euler-EDM scan (hoisted K/V)")
    t_srch = timed_stage(search_stage, 3, "init-noise search (10 cand x 2-step rollout, capture)")
    t_full = timed_stage(full_stage, 3, "FULL pipeline (one jit, as JittedPredictor runs it)")

    parts = t_cond + t_dec + t_scan + t_srch
    print()
    print(f"{'sum(stages)':52s} {parts * 1e3:9.1f} ms")
    print(f"{'full - sum (composition overhead)':52s} {(t_full - parts) * 1e3:9.1f} ms")
    print(f"samples/s: full {b / t_full:.4f}   sum-of-stages bound {b / parts:.4f}")
    # per-UNet-eval accounting: the scan runs 50 CFG-doubled evals, the
    # search 10x2 = 20 CFG-doubled evals + capture + min-local scoring
    print(f"scan per step  {t_scan / 50 * 1e3:6.1f} ms   "
          f"search per rollout eval {t_srch / 20 * 1e3:6.1f} ms "
          f"(delta = capture + min-local scoring + select)")


if __name__ == "__main__":
    main()
