"""Capability-surface embedders (reference modules.py: Class/TimestepND/
Gaussian/SpatialRescalerRemap/LowScale/Identity/InceptionV3 — SURVEY §2 #13)."""

import jax
import jax.numpy as jnp
import numpy as np

from udifftext_tpu.embedders import (
    ClassEmbedder,
    IdentityEncoder,
    IdentityFirstStage,
    InceptionV3Embedder,
    LowScaleEncoder,
    SpatialRescalerRemap,
    concat_timestep_embedder_nd,
    gaussian_encode,
)


def test_class_embedder_shapes_and_ucg():
    m = ClassEmbedder(embed_dim=16, n_classes=10, ucg_rate=1.0)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
    out = m.apply(params, jnp.asarray([1, 2]))
    assert out.shape == (2, 16)
    # ucg_rate=1.0 with rng → every id replaced by the unconditional class
    # (the LAST configured id, reference uc_class = n_classes - 1)
    out_uc = m.apply(params, jnp.asarray([1, 2]), rng=jax.random.PRNGKey(1))
    emb_uc = m.apply(params, jnp.asarray([9, 9]))
    np.testing.assert_allclose(np.asarray(out_uc), np.asarray(emb_uc), atol=1e-6)
    # the table has exactly n_classes rows (torch weights load 1:1)
    assert params["params"]["Embed_0"]["embedding"].shape == (10, 16)
    m2 = ClassEmbedder(embed_dim=8, n_classes=4, add_sequence_dim=True)
    p2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((3,), jnp.int32))
    assert m2.apply(p2, jnp.zeros((3,), jnp.int32)).shape == (3, 1, 8)


def test_concat_timestep_embedder_nd():
    out = concat_timestep_embedder_nd(jnp.asarray([[1.0, 2.0], [3.0, 4.0]]), 8)
    assert out.shape == (2, 16)
    out1 = concat_timestep_embedder_nd(jnp.asarray([1.0, 3.0]), 8)
    assert out1.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(out1), atol=1e-6)


def test_gaussian_encode():
    moments = jnp.concatenate(
        [jnp.ones((2, 4, 4, 3)), jnp.zeros((2, 4, 4, 3))], axis=-1
    )
    z, kl = gaussian_encode(moments, rng=None, flatten=True)
    assert z.shape == (2, 16, 3)  # mode == mean
    np.testing.assert_allclose(np.asarray(z), 1.0, atol=1e-6)
    assert kl.shape == (2,) and np.all(np.asarray(kl) > 0)


def test_spatial_rescaler_remap():
    m = SpatialRescalerRemap(multiplier=0.5, out_channels=4)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 2)))
    out = m.apply(params, jnp.ones((1, 8, 8, 2)))
    assert out.shape == (1, 4, 4, 4)


def test_low_scale_encoder():
    enc = LowScaleEncoder(max_noise_level=10, out_size=8)
    z, t = enc(jax.random.PRNGKey(0), jnp.ones((2, 16, 16, 4)))
    assert z.shape == (2, 8, 8, 4)
    assert t.shape == (2,) and int(jnp.max(t)) < 10


def test_identity_stages():
    x = jnp.ones((2, 3))
    fs = IdentityFirstStage()
    assert fs.encode(x) is x and fs.decode(x) is x
    enc = IdentityEncoder()
    assert enc(x) is x and enc.encode(x) is x


def test_inception_embedder_random_init():
    emb = InceptionV3Embedder()
    x = jnp.zeros((2, 64, 64, 3))
    emb.init(jax.random.PRNGKey(0), x)
    out = emb(x)
    assert out.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(out)))
