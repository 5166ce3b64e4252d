"""Pallas kernel tests (run on the TPU backend; skipped elsewhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu = jax.default_backend() == "tpu"


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_fused_groupnorm_silu_matches_xla():
    from udifftext_tpu.models.layers import GroupNorm32, silu
    from udifftext_tpu.ops.groupnorm import fused_groupnorm_silu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    scale = jnp.asarray(rng.randn(64).astype(np.float32))
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    gn = GroupNorm32()
    params = {"params": {"GroupNorm_0": {"scale": scale, "bias": bias}}}
    ref = silu(gn.apply(params, x))
    out = fused_groupnorm_silu(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_flash_attention_matches_xla():
    from udifftext_tpu.ops.attention import _xla_sdpa
    from udifftext_tpu.ops.flash_attention import flash_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (2, 256, 4, 64))
    k = jax.random.normal(k2, (2, 256, 4, 64))
    v = jax.random.normal(k3, (2, 256, 4, 64))
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v)), np.asarray(_xla_sdpa(q, k, v)),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_flash_attention_vjp_matches_xla():
    from udifftext_tpu.ops.attention import _xla_sdpa
    from udifftext_tpu.ops.flash_attention import flash_attention

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q = jax.random.normal(k1, (1, 128, 2, 64))
    kv = jax.random.normal(k2, (1, 128, 2, 64))

    g1 = jax.grad(lambda q: jnp.sum(flash_attention(q, kv, kv) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(_xla_sdpa(q, kv, kv) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)
