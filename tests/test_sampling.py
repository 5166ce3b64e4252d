"""Sampler math on a toy linear-Gaussian problem.

With denoise_fn(x, sigma) = x0 (the perfect denoiser for a deterministic
target), every ODE sampler must recover x0 exactly regardless of schedule:
d = (x - x0)/sigma, and the Euler step with dt = (sig_next - sig) moves x
along the straight line to x0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from udifftext_tpu.diffusion import sampling as SP
from udifftext_tpu.diffusion import schedules as S
from udifftext_tpu.diffusion.denoiser import DiscreteDenoiser
from udifftext_tpu.diffusion.guiders import VanillaCFG


def _sigmas(n=10):
    return jnp.asarray(S.LegacyDDPMDiscretization()(n, do_append_zero=True))


def test_euler_edm_perfect_denoiser_converges():
    x0 = jnp.full((2, 4, 4, 1), 3.0)
    denoise = lambda x, s: x0
    sig = _sigmas(10)
    x = SP.init_latent(jax.random.normal(jax.random.PRNGKey(0), x0.shape), sig)
    out = SP.sample_euler_edm(denoise, x, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_heun_perfect_denoiser_converges():
    x0 = jnp.full((1, 4, 4, 1), -2.0)
    sig = _sigmas(8)
    x = SP.init_latent(jax.random.normal(jax.random.PRNGKey(1), x0.shape), sig)
    out = SP.sample_heun_edm(lambda x, s: x0, x, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_dpmpp2m_perfect_denoiser_converges():
    x0 = jnp.full((1, 4, 4, 1), 1.5)
    sig = _sigmas(8)
    x = SP.init_latent(jax.random.normal(jax.random.PRNGKey(2), x0.shape), sig)
    out = SP.sample_dpmpp2m(lambda x, s: x0, x, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_euler_ancestral_runs():
    x0 = jnp.zeros((1, 4, 4, 1))
    sig = _sigmas(8)
    x = SP.init_latent(jax.random.normal(jax.random.PRNGKey(3), x0.shape), sig)
    out = SP.sample_euler_ancestral(lambda x, s: x0, x, sig, jax.random.PRNGKey(4))
    assert jnp.all(jnp.isfinite(out))
    # final ancestral step has next_sigma == 0 → x should equal x0 exactly
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)


def test_dpmpp2s_runs():
    x0 = jnp.zeros((1, 4, 4, 1))
    sig = _sigmas(6)
    x = SP.init_latent(jax.random.normal(jax.random.PRNGKey(5), x0.shape), sig)
    out = SP.sample_dpmpp2s_ancestral(lambda x, s: x0, x, sig, jax.random.PRNGKey(6))
    assert jnp.all(jnp.isfinite(out))


def test_lms_perfect_denoiser():
    x0 = jnp.full((1, 2, 2, 1), 0.7)
    sig = _sigmas(6)
    x = SP.init_latent(jax.random.normal(jax.random.PRNGKey(7), x0.shape), sig)
    out = SP.sample_lms(lambda x, s: x0, x, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-2, atol=1e-2)


def test_cfg_guider_blend():
    g = VanillaCFG(scale=5.0)
    uc = jnp.zeros((2, 3))
    c = jnp.ones((2, 3))
    x = jnp.concatenate([uc, c], axis=0)
    out = g(x, jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_cfg_prepare_inputs_doubles():
    g = VanillaCFG(scale=5.0)
    c = {"t_crossattn": jnp.ones((2, 12, 8)), "concat": jnp.ones((2, 4, 4, 5)), "extra": 7}
    uc = {"t_crossattn": jnp.zeros((2, 12, 8)), "concat": jnp.zeros((2, 4, 4, 5)), "extra": 7}
    x, s, cc = g.prepare_inputs(jnp.ones((2, 4, 4, 4)), jnp.ones((2,)), c, uc)
    assert x.shape == (4, 4, 4, 4)
    assert s.shape == (4,)
    assert cc["t_crossattn"].shape == (4, 12, 8)
    assert (np.asarray(cc["t_crossattn"][:2]) == 0).all()
    assert cc["extra"] == 7


def test_denoiser_eps_identity():
    """With a network returning zeros, D(x) = x * c_skip = x for EpsScaling."""
    d = DiscreteDenoiser()
    net = lambda x, cn, cond: (jnp.zeros_like(x), {})
    x = jnp.ones((2, 4, 4, 4))
    sigma = jnp.array([0.5, 3.0])
    out, aux = d(net, x, sigma, {})
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_denoiser_quantized_timestep():
    d = DiscreteDenoiser()
    seen = {}

    def net(x, cn, cond):
        seen["c_noise"] = cn
        return jnp.zeros_like(x), {}

    x = jnp.ones((4, 2, 2, 1))
    sigma = jnp.array([0.5, 3.0, 10.0, 150.0])
    d(net, x, sigma, {})
    np.testing.assert_array_equal(np.asarray(seen["c_noise"]), [169, 673, 934, 999])


# ---------------------------------------------------------------------------
# Encoder propagation (opt-in approximate sampler, arXiv 2312.09608)
# ---------------------------------------------------------------------------


def test_uniform_key_mask():
    m = SP.uniform_key_mask(10, 3)
    assert m.tolist() == [True, False, False, True, False, False, True,
                          False, False, True]
    assert SP.uniform_key_mask(4, 1).all()


def _tiny_unet_and_params():
    import jax

    from udifftext_tpu.models.unet import UNetModel

    unet = UNetModel(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=8,
        t_context_dim=8, attn_impl="xla",
    )
    x = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 3, 8))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ctx)
    # the output conv is zero-initialized (SD convention), which would make
    # the whole network output 0 and any two samplers trivially agree —
    # perturb it so the model is a real nonlinear function
    oc = params["params"]["out_conv"]["Conv_0"]
    oc["kernel"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), oc["kernel"].shape, oc["kernel"].dtype
    )
    return unet, params, ctx


def test_forward_cached_matches_call():
    """forward_cached returns the exact __call__ output plus the skip stack,
    and decode_cached on a same-step stack reproduces it exactly."""
    import jax

    from udifftext_tpu.models.unet import UNetModel

    unet, params, ctx = _tiny_unet_and_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.asarray([3.0, 7.0])
    ref, _ = unet.apply(params, x, t, ctx)
    out, hs = unet.apply(params, x, t, ctx, method=UNetModel.forward_cached)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    redec = unet.apply(params, hs, t, ctx, method=UNetModel.decode_cached)
    np.testing.assert_allclose(np.asarray(redec), np.asarray(ref), atol=1e-6)


def test_encprop_all_key_equals_exact_sampler():
    """With every step a key step the encprop sampler IS the exact Euler-EDM
    loop; with reuse steps it runs, stays finite, and actually consumes the
    cache (outputs differ from exact on a nonlinear model)."""
    import jax

    from udifftext_tpu.models.unet import UNetModel

    unet, params, ctx = _tiny_unet_and_params()

    def denoise(x, s):
        return unet.apply(params, x, s, ctx)[0]

    def denoise_full(x, s):
        return unet.apply(params, x, s, ctx, method=UNetModel.forward_cached)

    def denoise_reuse(x, s, hs):
        return unet.apply(params, hs, s, ctx, method=UNetModel.decode_cached)

    from udifftext_tpu.diffusion.schedules import LegacyDDPMDiscretization

    sig = jnp.asarray(LegacyDDPMDiscretization()(6, do_append_zero=True))
    x = SP.init_latent(jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4)), sig)

    exact = SP.sample_euler_edm(denoise, x, sig)
    allkey = SP.sample_euler_edm_encprop(
        denoise_full, denoise_reuse, x, sig, SP.uniform_key_mask(6, 1)
    )
    np.testing.assert_allclose(np.asarray(allkey), np.asarray(exact), atol=1e-5)

    prop = SP.sample_euler_edm_encprop(
        denoise_full, denoise_reuse, x, sig, SP.uniform_key_mask(6, 2)
    )
    assert np.isfinite(np.asarray(prop)).all()
    assert not np.allclose(np.asarray(prop), np.asarray(exact))
