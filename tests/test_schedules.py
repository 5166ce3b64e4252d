"""Schedules/scalings vs golden values computed from the torch reference
formulas (discretizer.py, denoiser_scaling.py, sigma_sampling.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from udifftext_tpu.diffusion import schedules as S


def test_ddpm_discretization_50_steps():
    d = S.LegacyDDPMDiscretization()
    sig = d(50, do_append_zero=True, flip=False)
    assert sig.shape == (51,)
    np.testing.assert_allclose(
        sig[:3], [14.614641189575195, 12.966320991516113, 11.542771339416504], rtol=1e-6
    )
    np.testing.assert_allclose(
        sig[-3:], [0.19630272686481476, 0.13445067405700684, 0.0], rtol=1e-5, atol=1e-8
    )


def test_ddpm_discretization_full_table_ascending():
    d = S.LegacyDDPMDiscretization()
    sig = d(1000, do_append_zero=False, flip=True)
    assert sig.shape == (1000,)
    np.testing.assert_allclose(sig[0], 0.029167158529162407, rtol=1e-6)
    np.testing.assert_allclose(sig[1], 0.04131441190838814, rtol=1e-6)
    np.testing.assert_allclose(sig[500], 1.6182788610458374, rtol=1e-6)
    np.testing.assert_allclose(sig[999], 14.614641189575195, rtol=1e-6)
    assert np.all(np.diff(sig) > 0)


def test_edm_discretization():
    d = S.EDMDiscretization()
    sig = d(10, do_append_zero=True, flip=False)
    assert sig.shape == (11,)
    np.testing.assert_allclose(
        sig[:3], [79.99998474121094, 45.60978698730469, 24.757915496826172], rtol=1e-5
    )
    np.testing.assert_allclose(sig[-2], 0.01999998651444912, rtol=1e-5)
    assert sig[-1] == 0.0


def test_sigma_quantization():
    d = S.LegacyDDPMDiscretization()
    table = jnp.asarray(d(1000, do_append_zero=False, flip=True))
    sig = jnp.array([0.5, 3.0, 10.0, 150.0])
    idx = S.sigma_to_idx(sig, table)
    np.testing.assert_array_equal(np.asarray(idx), [169, 673, 934, 999])
    q = S.quantize_sigma(sig, table)
    np.testing.assert_allclose(
        np.asarray(q),
        [0.4992789030075073, 2.9981930255889893, 10.027289390563965, 14.614641189575195],
        rtol=1e-6,
    )


def test_eps_scaling():
    sig = jnp.array([0.5, 2.0])
    c_skip, c_out, c_in, c_noise = S.eps_scaling(sig)
    np.testing.assert_allclose(np.asarray(c_skip), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(c_out), [-0.5, -2.0])
    np.testing.assert_allclose(np.asarray(c_in), [1 / np.sqrt(1.25), 1 / np.sqrt(5.0)], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_noise), [0.5, 2.0])


def test_v_scaling():
    sig = jnp.array([2.0])
    c_skip, c_out, c_in, c_noise = S.v_scaling(sig)
    np.testing.assert_allclose(np.asarray(c_skip), [0.2])
    np.testing.assert_allclose(np.asarray(c_out), [-2.0 / np.sqrt(5.0)], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_in), [1.0 / np.sqrt(5.0)], rtol=1e-6)


def test_edm_scaling():
    sig = jnp.array([1.0])
    c_skip, c_out, c_in, c_noise = S.edm_scaling(sig, sigma_data=0.5)
    np.testing.assert_allclose(np.asarray(c_skip), [0.25 / 1.25], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), [0.5 / np.sqrt(1.25)], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_noise), [0.0], atol=1e-7)


def test_weightings():
    sig = jnp.array([0.5, 2.0])
    np.testing.assert_allclose(np.asarray(S.eps_weighting(sig)), [4.0, 0.25])
    np.testing.assert_allclose(np.asarray(S.unit_weighting(sig)), [1.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(S.edm_weighting(sig, 0.5)), [(0.25 + 0.25) / 0.0625, (4 + 0.25) / 1.0]
    )


def test_discrete_sampling_range():
    import jax

    samp = S.DiscreteSampling()
    sig = samp(jax.random.PRNGKey(0), 512)
    table = samp.sigmas
    assert float(jnp.min(sig)) >= table.min()
    assert float(jnp.max(sig)) <= table.max()
    # every drawn sigma must be a table entry
    dists = np.abs(np.asarray(sig)[:, None] - table[None, :]).min(axis=1)
    assert dists.max() < 1e-6


def test_append_dims():
    x = jnp.ones((4,))
    y = S.append_dims(x, 4)
    assert y.shape == (4, 1, 1, 1)
    with pytest.raises(ValueError):
        S.append_dims(jnp.ones((2, 2)), 1)
