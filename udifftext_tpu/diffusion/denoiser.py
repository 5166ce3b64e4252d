"""EDM-style denoiser preconditioning as pure functions.

Parity: sgm/modules/diffusionmodules/denoiser.py:22-63 —
``D(x; sigma) = network(x * c_in, c_noise, cond) * c_out + x * c_skip`` with
the DiscreteDenoiser variant quantizing sigma to the nearest entry of the
1000-step DDPM table and c_noise to its integer index.

The network callable must have signature ``network(x, c_noise, cond) ->
(out, aux)`` where ``aux`` is a dict of auxiliary outputs (e.g. cross-attention
maps); the denoiser is agnostic to ``aux`` and passes it through.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import (
    SCALINGS,
    WEIGHTINGS,
    LegacyDDPMDiscretization,
    append_dims,
    sigma_to_idx,
)

Array = jax.Array
NetworkFn = Callable[[Array, Array, Dict[str, Any]], Tuple[Array, Dict[str, Any]]]


@dataclasses.dataclass(frozen=True)
class Denoiser:
    """Continuous denoiser: no sigma quantization (reference denoiser.py:6-28)."""

    scaling: str = "eps"
    weighting: str = "eps"

    def w(self, sigma: Array) -> Array:
        return WEIGHTINGS[self.weighting](sigma)

    def scale(self, sigma: Array):
        return SCALINGS[self.scaling](sigma)

    def quantize_sigma(self, sigma: Array) -> Array:
        return sigma

    def quantize_c_noise(self, c_noise: Array) -> Array:
        return c_noise

    def __call__(
        self, network: NetworkFn, x: Array, sigma: Array, cond: Dict[str, Any]
    ) -> Tuple[Array, Dict[str, Any]]:
        sigma = self.quantize_sigma(sigma)
        sigma_b = append_dims(sigma, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scale(sigma_b)
        c_noise = self.quantize_c_noise(c_noise.reshape(sigma.shape))
        out, aux = network(x * c_in, c_noise, cond)
        return out * c_out + x * c_skip, aux


@dataclasses.dataclass(frozen=True)
class DiscreteDenoiser(Denoiser):
    """Quantizing denoiser (reference denoiser.py:31-63).

    The sigma table is ascending (flip=True) so the quantized c_noise index is
    the DDPM timestep the UNet expects.
    """

    num_idx: int = 1000
    quantize_c_noise_flag: bool = True
    discretization: LegacyDDPMDiscretization = LegacyDDPMDiscretization()

    @functools.cached_property
    def sigmas(self) -> np.ndarray:
        # built once per denoiser (cached_property writes the instance
        # __dict__ directly, bypassing the frozen-dataclass setattr) — the
        # property form rebuilt the 1000-entry float64 table on every
        # quantize call
        return self.discretization(self.num_idx, do_append_zero=False, flip=True)

    def quantize_sigma(self, sigma: Array) -> Array:
        table = jnp.asarray(self.sigmas)
        return table[sigma_to_idx(sigma, table)]

    def quantize_c_noise(self, c_noise: Array) -> Array:
        if self.quantize_c_noise_flag:
            table = jnp.asarray(self.sigmas)
            return sigma_to_idx(c_noise, table)
        return c_noise
