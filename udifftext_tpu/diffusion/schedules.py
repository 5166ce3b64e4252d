"""Diffusion schedules, scalings, and weightings as pure closed-form functions.

Behavior parity with the reference (file:line cites into /root/reference):
  - make_beta_schedule / LegacyDDPMDiscretization:
      sgm/modules/diffusionmodules/util.py:19-32,
      sgm/modules/diffusionmodules/discretizer.py:41-68
  - EDMDiscretization: discretizer.py:27-38
  - Eps/V/EDM scalings: denoiser_scaling.py:4-31
  - Unit/EDM/V/Eps weightings: denoiser_weighting.py:4-24
  - DiscreteSampling / EDMSampling (train-time sigma draws):
      sigma_sampling.py:6-31

Design: tables are built once on host in float64/float32 numpy (they are tiny,
1000 entries); everything evaluated per-step is jnp and jit-safe. No object
registry — thin dataclasses with __call__ keep the config surface while the
internals stay functional.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def append_dims(x: Array, target_ndim: int) -> Array:
    """Right-pad shape with singleton dims (reference sgm/util.py:192-199)."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def make_beta_schedule(
    n_timestep: int, linear_start: float = 1e-4, linear_end: float = 2e-2
) -> np.ndarray:
    """Linear-in-sqrt beta schedule (reference diffusionmodules/util.py:19-32)."""
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
        ** 2
    )


def ddpm_alphas_cumprod(
    num_timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
) -> np.ndarray:
    betas = make_beta_schedule(num_timesteps, linear_start, linear_end)
    return np.cumprod(1.0 - betas, axis=0)


def _roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    # reference discretizer.py:11-14
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


class _Discretization:
    """Shared __call__ convention (reference Discretization base,
    discretizer.py:16-20): append-zero + optional flip over get_sigmas."""

    def __call__(self, n: int, do_append_zero: bool = True, flip: bool = False) -> np.ndarray:
        sigmas = self.get_sigmas(n)
        if do_append_zero:
            sigmas = np.concatenate([sigmas, np.zeros((1,), dtype=sigmas.dtype)])
        return sigmas[::-1].copy() if flip else sigmas


@dataclasses.dataclass(frozen=True)
class LegacyDDPMDiscretization(_Discretization):
    """sigma(i) = sqrt((1-abar_i)/abar_i) over the 1000-step DDPM table.

    Reference discretizer.py:41-68. ``__call__(n, do_append_zero, flip)``
    matches the torch semantics: sigmas are returned descending by default
    (get_sigmas flips ascending->descending internally... the torch
    ``get_sigmas`` returns descending after its flip; ``flip=True`` at call
    level flips once more to ascending, used by DiscreteDenoiser/
    DiscreteSampling so that index 0 is the smallest sigma).
    """

    linear_start: float = 0.00085
    linear_end: float = 0.0120
    num_timesteps: int = 1000

    def get_sigmas(self, n: int) -> np.ndarray:
        acp = ddpm_alphas_cumprod(self.num_timesteps, self.linear_start, self.linear_end)
        if n < self.num_timesteps:
            timesteps = _roughly_equally_spaced_steps(n, self.num_timesteps)
            acp = acp[timesteps]
        elif n != self.num_timesteps:
            raise ValueError(f"n={n} > num_timesteps={self.num_timesteps}")
        sigmas = np.sqrt((1 - acp) / acp).astype(np.float32)
        return sigmas[::-1].copy()  # descending (torch.flip in get_sigmas)


@dataclasses.dataclass(frozen=True)
class EDMDiscretization(_Discretization):
    """Karras rho-schedule (reference discretizer.py:27-38)."""

    sigma_min: float = 0.02
    sigma_max: float = 80.0
    rho: float = 7.0

    def get_sigmas(self, n: int) -> np.ndarray:
        ramp = np.linspace(0, 1, n, dtype=np.float64)
        min_inv_rho = self.sigma_min ** (1 / self.rho)
        max_inv_rho = self.sigma_max ** (1 / self.rho)
        return ((max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** self.rho).astype(
            np.float32
        )


# ---------------------------------------------------------------------------
# Scalings: sigma -> (c_skip, c_out, c_in, c_noise)
# ---------------------------------------------------------------------------


def eps_scaling(sigma: Array) -> Tuple[Array, Array, Array, Array]:
    """EpsScaling (reference denoiser_scaling.py:16-22)."""
    c_skip = jnp.ones_like(sigma)
    c_out = -sigma
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def v_scaling(sigma: Array) -> Tuple[Array, Array, Array, Array]:
    """VScaling (reference denoiser_scaling.py:25-31)."""
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def edm_scaling(
    sigma: Array, sigma_data: float = 0.5
) -> Tuple[Array, Array, Array, Array]:
    """EDMScaling (reference denoiser_scaling.py:4-13)."""
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2)
    c_in = 1.0 / jnp.sqrt(sigma**2 + sigma_data**2)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


SCALINGS = {"eps": eps_scaling, "v": v_scaling, "edm": edm_scaling}


# ---------------------------------------------------------------------------
# Loss weightings: sigma -> w(sigma)
# ---------------------------------------------------------------------------


def unit_weighting(sigma: Array) -> Array:
    return jnp.ones_like(sigma)


def eps_weighting(sigma: Array) -> Array:
    return sigma**-2.0


def edm_weighting(sigma: Array, sigma_data: float = 0.5) -> Array:
    return (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2


def v_weighting(sigma: Array) -> Array:
    return edm_weighting(sigma, sigma_data=1.0)


WEIGHTINGS = {
    "unit": unit_weighting,
    "eps": eps_weighting,
    "edm": edm_weighting,
    "v": v_weighting,
}


# ---------------------------------------------------------------------------
# Train-time sigma samplers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DiscreteSampling:
    """Uniform draw over the (ascending) DDPM sigma table.

    Reference sigma_sampling.py:16-31: table built with flip=True so that
    idx 0 is the smallest sigma.
    """

    num_idx: int = 1000
    discretization: LegacyDDPMDiscretization = LegacyDDPMDiscretization()

    @property
    def sigmas(self) -> np.ndarray:
        return self.discretization(self.num_idx, do_append_zero=False, flip=True)

    def __call__(self, rng: jax.Array, n_samples: int) -> Array:
        sigmas = jnp.asarray(self.sigmas)
        idx = jax.random.randint(rng, (n_samples,), 0, self.num_idx)
        return sigmas[idx]


@dataclasses.dataclass(frozen=True)
class EDMSampling:
    """Lognormal sigma draw (reference sigma_sampling.py:6-13)."""

    p_mean: float = -1.2
    p_std: float = 1.2

    def __call__(self, rng: jax.Array, n_samples: int) -> Array:
        log_sigma = self.p_mean + self.p_std * jax.random.normal(rng, (n_samples,))
        return jnp.exp(log_sigma)


# ---------------------------------------------------------------------------
# Sigma quantization for DiscreteDenoiser
# ---------------------------------------------------------------------------


def sigma_to_idx(sigma: Array, sigmas_table: Array) -> Array:
    """Nearest index in the table (reference denoiser.py:49-52)."""
    dists = jnp.abs(sigma[..., None] - sigmas_table)
    return jnp.argmin(dists, axis=-1)


def quantize_sigma(sigma: Array, sigmas_table: Array) -> Array:
    return sigmas_table[sigma_to_idx(sigma, sigmas_table)]
