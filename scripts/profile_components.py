"""Component-level timing on the real chip: UNet eval, VAE decode, attention
sizes, GroupNorm. Informs kernel priorities (run manually)."""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    from bench import _zeros_params, cast_params_bf16
    from udifftext_tpu.models.unet import UNetModel
    from udifftext_tpu.models.vae import AutoencoderKL

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    unet = UNetModel(dtype=jnp.bfloat16)
    up = cast_params_bf16(
        _zeros_params(unet, jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)), jnp.zeros((1, 12, 2048)))
    )
    x = jnp.zeros((B, 64, 64, 9), jnp.bfloat16)
    t = jnp.zeros((B,), jnp.float32)
    ctx = jnp.zeros((B, 12, 2048), jnp.bfloat16)

    unet_fwd = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c)[0])
    dt = timeit(unet_fwd, up, x, t, ctx)
    flops = 2 * 434e9 * B  # ~434 GMACs per 64² eval (SD2 UNet)
    print(f"UNet fwd B={B}: {dt*1e3:.1f} ms  (~{flops/dt/1e12:.0f} TF/s)")

    # capture_attn variant (training/AAE path)
    unet_cap = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c, capture_attn=True)[0])
    dt = timeit(unet_cap, up, x, t, ctx)
    print(f"UNet fwd+maps B={B}: {dt*1e3:.1f} ms")

    vae = AutoencoderKL()
    vp = _zeros_params(vae, jnp.zeros((1, 512, 512, 3)))
    z = jnp.zeros((B // 2, 64, 64, 4), jnp.float32)
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))
    dt = timeit(dec, vp, z, n=3)
    print(f"VAE decode fp32 B={B//2}: {dt*1e3:.1f} ms")

    vae_bf = AutoencoderKL(dtype=jnp.bfloat16)
    dec_bf = jax.jit(lambda p, z: vae_bf.apply(p, z, method=AutoencoderKL.decode))
    dt = timeit(dec_bf, vp, z, n=3)
    print(f"VAE decode bf16 B={B//2}: {dt*1e3:.1f} ms")

    # attention paths at UNet sizes
    from udifftext_tpu.ops.attention import _xla_sdpa
    from udifftext_tpu.ops.flash_attention import flash_attention

    for n_seq, heads, ch in ((4096, 5, 64), (1024, 10, 64), (256, 20, 64)):
        q = jnp.zeros((B, n_seq, heads, ch), jnp.bfloat16)
        f = jax.jit(lambda q: flash_attention(q, q, q))
        dt_f = timeit(f, q)
        g = jax.jit(lambda q: _xla_sdpa(q, q, q))
        dt_x = timeit(g, q)
        print(f"attn N={n_seq} H={heads}: flash {dt_f*1e3:.2f} ms | xla {dt_x*1e3:.2f} ms")

    # GroupNorm32 cost at the biggest activation
    from udifftext_tpu.models.layers import GroupNorm32, silu

    gn = GroupNorm32()
    h = jnp.zeros((B, 64, 64, 320), jnp.bfloat16)
    gp = gn.init(jax.random.PRNGKey(0), h)
    gfn = jax.jit(lambda p, h: silu(gn.apply(p, h)))
    dt = timeit(gfn, gp, h)
    print(f"GN+SiLU 64²x320 B={B}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
