"""Determinism: identical seeds must produce identical samples (the TPU-native
counterpart of fixed-seed parity runs, BASELINE config 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_sampling_deterministic(tmp_path):
    from udifftext_tpu.diffusion import sampling as SP
    from udifftext_tpu.diffusion import schedules as S

    sig = jnp.asarray(S.LegacyDDPMDiscretization()(6, do_append_zero=True))

    calls = []

    def denoise(x, s):
        calls.append(1)
        return x * 0.9  # arbitrary deterministic function

    x0 = jax.random.normal(jax.random.PRNGKey(42), (1, 8, 8, 4))
    a = SP.sample_euler_edm(denoise, SP.init_latent(x0, sig), sig)
    b = SP.sample_euler_edm(denoise, SP.init_latent(x0, sig), sig)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_rng_structure():
    """Different seeds give different init noise; same seed identical."""
    k1 = jax.random.PRNGKey(0)
    k2 = jax.random.PRNGKey(1)
    n1 = jax.random.normal(k1, (4, 4))
    n1b = jax.random.normal(jax.random.PRNGKey(0), (4, 4))
    n2 = jax.random.normal(k2, (4, 4))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n1b))
    assert np.abs(np.asarray(n1) - np.asarray(n2)).max() > 0
