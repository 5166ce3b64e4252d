"""VAE adversarial training path (AutoencodingEngine two-optimizer parity,
autoencoder.py:182-267 + losses/__init__.py:88-246): discriminator shape,
hinge/vanilla losses, and both train steps updating the right params."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from udifftext_tpu.diffusion.vae_loss import (
    VAEGanLossConfig,
    adopt_weight,
    hinge_d_loss,
    make_vae_train_steps,
    vanilla_d_loss,
)
from udifftext_tpu.models.discriminator import NLayerDiscriminator
from udifftext_tpu.models.vae import AutoencoderKL, DDConfig

IMG = 32


def test_discriminator_patch_output():
    disc = NLayerDiscriminator(n_layers=3)
    x = jnp.zeros((2, 64, 64, 3))
    variables = disc.init(jax.random.PRNGKey(0), x, train=False)
    out = disc.apply(variables, x, train=False)
    # 64 → 32 → 16 → 8 (stride-1 last block + 1ch head keeps ~8)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert "batch_stats" in variables


def test_d_losses():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_d_loss(fake, real)) > 2.0
    assert float(vanilla_d_loss(real, fake)) < float(vanilla_d_loss(fake, real))
    assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(15), threshold=10)) == 1.0


@pytest.fixture(scope="module")
def setup():
    vae = AutoencoderKL(
        DDConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(), in_channels=3, resolution=IMG, z_channels=4),
        embed_dim=4,
    )
    disc = NLayerDiscriminator(ndf=16, n_layers=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae.init(k1, jnp.zeros((1, IMG, IMG, 3)))
    disc_vars = disc.init(k2, jnp.zeros((1, IMG, IMG, 3)), train=False)
    return vae, disc, vae_params, disc_vars


def test_vae_gan_train_steps(setup):
    vae, disc, vae_params, disc_vars = setup
    cfg = VAEGanLossConfig(disc_start=0, perceptual_weight=0.0)
    ae_opt = optax.adam(1e-4)
    d_opt = optax.adam(1e-4)
    ae_step, disc_step = make_vae_train_steps(cfg, vae, disc, ae_opt, d_opt)

    ae_state = {
        "params": vae_params,
        "logvar": jnp.zeros(()),
        "opt_state": ae_opt.init(vae_params),
        "step": jnp.asarray(0),
    }
    disc_state = {"vars": disc_vars, "opt_state": d_opt.init(disc_vars["params"])}

    x = jnp.asarray(
        np.random.RandomState(0).randn(2, IMG, IMG, 3).clip(-1, 1), jnp.float32
    )
    rng = jax.random.PRNGKey(1)

    ae_state2, loss, log = ae_step(ae_state, disc_state, x, rng)
    assert np.isfinite(float(loss))
    for key in ("loss/nll_loss", "loss/rec_loss", "loss/kl_loss", "loss/g_loss",
                "loss/d_weight"):
        assert np.isfinite(float(log[key])), key
    # the VAE moved, the discriminator did not
    before = jax.tree.leaves(vae_params)[0]
    after = jax.tree.leaves(ae_state2["params"])[0]
    assert float(jnp.max(jnp.abs(after - before))) > 0
    assert int(ae_state2["step"]) == 1

    disc_state2, d_loss, d_log = disc_step(ae_state2, disc_state, x, rng)
    assert np.isfinite(float(d_loss))
    db = jax.tree.leaves(disc_vars["params"])[0]
    da = jax.tree.leaves(disc_state2["vars"]["params"])[0]
    assert float(jnp.max(jnp.abs(da - db))) > 0
    # BN running stats advanced
    sb = jax.tree.leaves(disc_vars["batch_stats"])[0]
    sa = jax.tree.leaves(disc_state2["vars"]["batch_stats"])[0]
    assert float(jnp.max(jnp.abs(sa - sb))) > 0


def test_vae_gan_with_perceptual(setup):
    """perceptual_fn plugs in (LPIPSAlex-shaped callable)."""
    vae, disc, vae_params, disc_vars = setup
    cfg = VAEGanLossConfig(perceptual_weight=1.0)
    ae_opt = optax.adam(1e-4)
    d_opt = optax.adam(1e-4)
    perceptual = lambda a, b: jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    ae_step, _ = make_vae_train_steps(cfg, vae, disc, ae_opt, d_opt, perceptual)
    ae_state = {
        "params": vae_params, "logvar": jnp.zeros(()),
        "opt_state": ae_opt.init(vae_params), "step": jnp.asarray(0),
    }
    disc_state = {"vars": disc_vars, "opt_state": d_opt.init(disc_vars["params"])}
    x = jnp.zeros((1, IMG, IMG, 3))
    _, loss, log = ae_step(ae_state, disc_state, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_diagonal_gaussian_regularizer():
    """regularizers/__init__.py:23-42: mode/sample routing + per-batch-mean
    summed KL in the log dict."""
    from udifftext_tpu.diffusion.vae_loss import diagonal_gaussian_regularizer
    from udifftext_tpu.models.vae import DiagonalGaussian

    z = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 8))
    out, log = diagonal_gaussian_regularizer(z, sample=False)
    post = DiagonalGaussian(z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(post.mode()))
    np.testing.assert_allclose(
        float(log["kl_loss"]), float(jnp.sum(post.kl()) / 4), rtol=1e-6
    )
    out_s, _ = diagonal_gaussian_regularizer(z, rng=jax.random.PRNGKey(1), sample=True)
    assert not np.allclose(np.asarray(out_s), np.asarray(out))
    with pytest.raises(ValueError, match="requires an rng"):
        diagonal_gaussian_regularizer(z, sample=True)


def test_measure_perplexity():
    """regularizers/__init__.py:44-53: uniform usage → perplexity = K,
    single-cluster collapse → perplexity = 1."""
    from udifftext_tpu.diffusion.vae_loss import measure_perplexity

    uniform = jnp.tile(jnp.arange(4), 8)
    p, used = measure_perplexity(uniform, 4)
    np.testing.assert_allclose(float(p), 4.0, rtol=1e-4)
    assert int(used) == 4
    collapsed = jnp.zeros((32,), jnp.int32)
    p, used = measure_perplexity(collapsed, 4)
    np.testing.assert_allclose(float(p), 1.0, rtol=1e-4)
    assert int(used) == 1


def test_latent_lpips_loss():
    """losses/__init__.py:19-84 weight semantics: latent L2 + perceptual on
    decodes, optional perceptual-on-inputs with bicubic size adaptation,
    elementwise L2 passthrough when perceptual_weight == 0."""
    from udifftext_tpu.diffusion.vae_loss import latent_lpips_loss

    rng = np.random.RandomState(0)
    li = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    lp = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    img = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))

    def decode(z):  # toy 2x nearest upsample "decoder"
        return jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)

    def mse(a, b):  # per-sample perceptual stand-in
        return ((a - b) ** 2).mean(axis=(1, 2, 3))

    l2 = (li - lp) ** 2
    p = mse(decode(li), decode(lp))
    loss, log = latent_lpips_loss(decode, mse, li, lp, latent_weight=0.5,
                                  perceptual_weight=2.0)
    np.testing.assert_allclose(
        float(loss), float(0.5 * l2.mean() + 2.0 * p.mean()), rtol=1e-5
    )
    np.testing.assert_allclose(float(log["train/latent_l2_loss"]), float(l2.mean()), rtol=1e-5)

    # perceptual on original pixels; sizes already match the decodes here
    p2 = mse(img, decode(lp))
    loss2, log2 = latent_lpips_loss(decode, mse, li, lp, image_inputs=img,
                                    perceptual_weight=1.0,
                                    perceptual_weight_on_inputs=0.25, split="val")
    np.testing.assert_allclose(
        float(loss2), float(l2.mean() + p.mean() + 0.25 * p2.mean()), rtol=1e-5
    )
    assert "val/perceptual_loss_on_inputs" in log2

    # scale_tgt_to_input_size resizes the decodes down to the pixel input
    small = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    loss3, _ = latent_lpips_loss(decode, mse, li, lp, image_inputs=small,
                                 perceptual_weight=0.0,
                                 perceptual_weight_on_inputs=1.0,
                                 scale_tgt_to_input_size=True)
    # perceptual_weight=0 keeps the elementwise L2 term, so the scalar
    # on-inputs term broadcasts over it (reference semantics: tensor + scalar)
    assert np.asarray(loss3).shape == l2.shape
    np.testing.assert_allclose(
        np.asarray(loss3),
        np.asarray(l2 + mse(small, jax.image.resize(
            decode(lp), small.shape, method="bicubic")).mean()),
        rtol=1e-5,
    )
