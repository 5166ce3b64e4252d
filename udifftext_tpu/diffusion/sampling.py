"""Diffusion samplers as jit-friendly `lax.scan` loops.

Parity: sgm/modules/diffusionmodules/sampling.py — the Euler-EDM loop
(:218-420), Heun (:423-438), Euler-ancestral (:441-448), DPM++(2S) ancestral
(:451-489), DPM++(2M) (:492-567), and linear multistep (:177-215); plus
sampling_utils.py helpers (to_d, ancestral step). The init-noise search and
attend-and-excite refinement of the reference's EulerEDMSampler live in
`udifftext_tpu/engine.py` because they need the loss and the attention maps.

Conventions:
  - ``sigmas`` is the descending schedule with a trailing zero, shape (n+1,),
    built by a Discretization from `schedules.py`.
  - ``denoise_fn(x, sigma_vec) -> denoised`` is the CFG-blended denoiser built
    by `make_denoise_fn`; sigma_vec has shape (B,).
  - The initial latent must be pre-scaled by sqrt(1 + sigmas[0]^2)
    (reference sampling.py:54), done here in `init_latent`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import append_dims

Array = jax.Array
DenoiseFn = Callable[[Array, Array], Array]


def init_latent(randn: Array, sigmas: Array) -> Array:
    """x0 = randn * sqrt(1 + sigma_max^2) (reference sampling.py:54)."""
    return randn * jnp.sqrt(1.0 + sigmas[0] ** 2)


def to_d(x: Array, sigma: Array, denoised: Array) -> Array:
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from: Array, sigma_to: Array, eta: float = 1.0):
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2),
    )
    sigma_down = jnp.sqrt(sigma_to**2 - sigma_up**2)
    return sigma_down, sigma_up


def make_denoise_fn(denoiser, network, guider, cond, uc) -> DenoiseFn:
    """CFG-blended single denoise evaluation (reference sampling.py:61-64).

    The guider doubles the batch (uc‖c); the denoiser applies EDM
    preconditioning around the raw network; the guider blend halves it back.
    """

    def denoise(x: Array, sigma: Array) -> Array:
        x_in, s_in, c_in = guider.prepare_inputs(x, sigma, cond, uc)
        denoised, _ = denoiser(network, x_in, s_in, c_in)
        return guider(denoised, sigma)

    return denoise


def _gamma_for_step(sigma: Array, num_sigmas: int, s_churn, s_tmin, s_tmax) -> Array:
    gamma_val = min(s_churn / (num_sigmas - 1), 2**0.5 - 1) if s_churn > 0 else 0.0
    in_range = jnp.logical_and(sigma >= s_tmin, sigma <= s_tmax)
    return jnp.where(in_range, gamma_val, 0.0)


@dataclasses.dataclass(frozen=True)
class EDMStochasticParams:
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0


def _maybe_churn(
    x: Array,
    sigma: Array,
    gamma: Array,
    rng: Optional[jax.Array],
    s_noise: float,
) -> Tuple[Array, Array]:
    sigma_hat = sigma * (gamma + 1.0)
    if rng is not None:
        eps = jax.random.normal(rng, x.shape, x.dtype) * s_noise
        extra = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        x = x + eps * append_dims(extra, x.ndim)
    return x, sigma_hat


def sample_euler_edm(
    denoise_fn: DenoiseFn,
    x: Array,
    sigmas: Array,
    params: EDMStochasticParams = EDMStochasticParams(),
    rng: Optional[jax.Array] = None,
) -> Array:
    """Euler EDM loop (reference sampling.py:89-137 with identity correction)."""
    num_sigmas = sigmas.shape[0]
    batch = x.shape[0]
    use_churn = params.s_churn > 0 and rng is not None

    def step(carry, i):
        x, rng = carry
        sigma = jnp.full((batch,), sigmas[i], x.dtype)
        next_sigma = jnp.full((batch,), sigmas[i + 1], x.dtype)
        gamma = _gamma_for_step(
            sigmas[i], num_sigmas, params.s_churn, params.s_tmin, params.s_tmax
        )
        if use_churn:
            rng, sub = jax.random.split(rng)
            x, sigma_hat = _maybe_churn(x, sigma, gamma, sub, params.s_noise)
        else:
            sigma_hat = sigma
        denoised = denoise_fn(x, sigma_hat)
        d = to_d(x, sigma_hat, denoised)
        dt = append_dims(next_sigma - sigma_hat, x.ndim)
        return (x + dt * d, rng), None

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    (x, _), _ = jax.lax.scan(step, (x, rng), jnp.arange(num_sigmas - 1))
    return x


def uniform_key_mask(num_steps: int, interval: int) -> np.ndarray:
    """Key-step mask for encoder propagation: every `interval`-th step runs
    the full UNet (True); the rest reuse the cached encoder features. Step 0
    is always key (there is no cache to reuse yet)."""
    mask = np.zeros((num_steps,), bool)
    mask[::max(interval, 1)] = True
    mask[0] = True
    return mask


def sample_euler_edm_encprop(
    denoise_full: Callable[[Array, Array], Tuple[Array, Any]],
    denoise_reuse: Callable[[Array, Array, Any], Array],
    x: Array,
    sigmas: Array,
    key_mask: Array,
) -> Array:
    """Euler-EDM loop with encoder-feature propagation ("Faster Diffusion",
    arXiv 2312.09608): UNet encoder features vary little between adjacent
    noise levels, so non-key steps skip the input blocks and replay the
    cached skip stack through middle+decoder with the current timestep.

    APPROXIMATE — an opt-in acceleration, NOT the reference sampler
    (sampling.py:218-262); outputs differ from `sample_euler_edm` except when
    every step is key. Validate quality against real checkpoints before
    production use.

    denoise_full(x, sigma) -> (denoised, cache); denoise_reuse(x, sigma,
    cache) -> denoised. The cache is any pytree (e.g. the UNet's skip stack
    for the CFG-doubled batch).
    """
    num_sigmas = sigmas.shape[0]
    batch = x.shape[0]
    key_mask = jnp.asarray(key_mask)
    if key_mask.shape[0] != num_sigmas - 1:
        # JAX clamps out-of-bounds gathers, so a short mask would silently
        # repeat its last decision instead of erroring
        raise ValueError(
            f"key_mask has {key_mask.shape[0]} entries for {num_sigmas - 1} steps"
        )
    key_mask = key_mask.at[0].set(True)

    sigma0 = jnp.full((batch,), sigmas[0], x.dtype)
    cache0 = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(denoise_full, x, sigma0)[1],
    )

    def step(carry, i):
        x, cache = carry
        sigma = jnp.full((batch,), sigmas[i], x.dtype)
        next_sigma = jnp.full((batch,), sigmas[i + 1], x.dtype)
        denoised, cache = jax.lax.cond(
            key_mask[i],
            lambda x, s, c: denoise_full(x, s),
            lambda x, s, c: (denoise_reuse(x, s, c), c),
            x, sigma, cache,
        )
        d = to_d(x, sigma, denoised)
        dt = append_dims(next_sigma - sigma, x.ndim)
        return (x + dt * d, cache), None

    (x, _), _ = jax.lax.scan(step, (x, cache0), jnp.arange(num_sigmas - 1))
    return x


def sample_heun_edm(
    denoise_fn: DenoiseFn,
    x: Array,
    sigmas: Array,
    params: EDMStochasticParams = EDMStochasticParams(),
    rng: Optional[jax.Array] = None,
) -> Array:
    """Heun second-order correction (reference sampling.py:423-438)."""
    num_sigmas = sigmas.shape[0]
    batch = x.shape[0]
    use_churn = params.s_churn > 0 and rng is not None

    def step(carry, i):
        x, rng = carry
        sigma = jnp.full((batch,), sigmas[i], x.dtype)
        next_sigma = jnp.full((batch,), sigmas[i + 1], x.dtype)
        gamma = _gamma_for_step(
            sigmas[i], num_sigmas, params.s_churn, params.s_tmin, params.s_tmax
        )
        if use_churn:
            rng, sub = jax.random.split(rng)
            x, sigma_hat = _maybe_churn(x, sigma, gamma, sub, params.s_noise)
        else:
            sigma_hat = sigma
        denoised = denoise_fn(x, sigma_hat)
        d = to_d(x, sigma_hat, denoised)
        dt = append_dims(next_sigma - sigma_hat, x.ndim)
        euler = x + dt * d

        def correct(euler):
            denoised2 = denoise_fn(euler, next_sigma)
            d2 = to_d(euler, next_sigma, denoised2)
            return x + dt * (d + d2) / 2.0

        # next_sigma == 0 only on the final step; jnp.where keeps it traceable
        # (reference skips the second eval; we predicate on the value).
        corrected = correct(euler)
        x_new = jnp.where(jnp.sum(next_sigma) < 1e-14, euler, corrected)
        return (x_new, rng), None

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    (x, _), _ = jax.lax.scan(step, (x, rng), jnp.arange(num_sigmas - 1))
    return x


def sample_euler_ancestral(
    denoise_fn: DenoiseFn,
    x: Array,
    sigmas: Array,
    rng: jax.Array,
    eta: float = 1.0,
    s_noise: float = 1.0,
) -> Array:
    """Euler ancestral (reference sampling.py:441-448)."""
    num_sigmas = sigmas.shape[0]
    batch = x.shape[0]

    def step(carry, i):
        x, rng = carry
        sigma = jnp.full((batch,), sigmas[i], x.dtype)
        next_sigma = jnp.full((batch,), sigmas[i + 1], x.dtype)
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta)
        denoised = denoise_fn(x, sigma)
        d = to_d(x, sigma, denoised)
        x = x + append_dims(sigma_down - sigma, x.ndim) * d
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.where(
            append_dims(next_sigma, x.ndim) > 0.0,
            x + noise * s_noise * append_dims(sigma_up, x.ndim),
            x,
        )
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), jnp.arange(num_sigmas - 1))
    return x


def _to_neg_log_sigma(sigma: Array) -> Array:
    return -jnp.log(sigma)


def _to_sigma(neg_log_sigma: Array) -> Array:
    return jnp.exp(-neg_log_sigma)


def sample_dpmpp2s_ancestral(
    denoise_fn: DenoiseFn,
    x: Array,
    sigmas: Array,
    rng: jax.Array,
    eta: float = 1.0,
    s_noise: float = 1.0,
) -> Array:
    """DPM++(2S) ancestral (reference sampling.py:451-489)."""
    num_sigmas = sigmas.shape[0]
    batch = x.shape[0]

    def step(carry, i):
        x, rng = carry
        sigma = jnp.full((batch,), sigmas[i], x.dtype)
        next_sigma = jnp.full((batch,), sigmas[i + 1], x.dtype)
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta)
        denoised = denoise_fn(x, sigma)
        d = to_d(x, sigma, denoised)
        x_euler = x + append_dims(sigma_down - sigma, x.ndim) * d

        safe_down = jnp.maximum(sigma_down, 1e-10)
        t, t_next = _to_neg_log_sigma(sigma), _to_neg_log_sigma(safe_down)
        h = t_next - t
        s = t + 0.5 * h
        mult1 = _to_sigma(s) / _to_sigma(t)
        mult2 = jnp.expm1(-0.5 * h)
        mult3 = _to_sigma(t_next) / _to_sigma(t)
        mult4 = jnp.expm1(-h)
        x2 = append_dims(mult1, x.ndim) * x - append_dims(mult2, x.ndim) * denoised
        denoised2 = denoise_fn(x2, _to_sigma(s))
        x_dpmpp = append_dims(mult3, x.ndim) * x - append_dims(mult4, x.ndim) * denoised2

        x = jnp.where(append_dims(sigma_down, x.ndim) > 0.0, x_dpmpp, x_euler)
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.where(
            append_dims(next_sigma, x.ndim) > 0.0,
            x + noise * s_noise * append_dims(sigma_up, x.ndim),
            x,
        )
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), jnp.arange(num_sigmas - 1))
    return x


def sample_dpmpp2m(denoise_fn: DenoiseFn, x: Array, sigmas: Array) -> Array:
    """DPM++(2M) multistep (reference sampling.py:492-567)."""
    num_sigmas = sigmas.shape[0]
    batch = x.shape[0]

    def step(carry, i):
        x, old_denoised = carry
        sigma = jnp.full((batch,), sigmas[i], x.dtype)
        next_sigma = jnp.full((batch,), sigmas[i + 1], x.dtype)
        prev_sigma = jnp.full((batch,), sigmas[jnp.maximum(i - 1, 0)], x.dtype)
        denoised = denoise_fn(x, sigma)

        safe_next = jnp.maximum(next_sigma, 1e-10)
        t, t_next = _to_neg_log_sigma(sigma), _to_neg_log_sigma(safe_next)
        h = t_next - t
        h_last = t - _to_neg_log_sigma(prev_sigma)
        r = h_last / h
        mult1 = append_dims(_to_sigma(t_next) / _to_sigma(t), x.ndim)
        mult2 = append_dims(jnp.expm1(-h), x.ndim)
        mult3 = append_dims(1 + 1 / (2 * r), x.ndim)
        mult4 = append_dims(1 / (2 * r), x.ndim)

        x_standard = mult1 * x - mult2 * denoised
        denoised_d = mult3 * denoised - mult4 * old_denoised
        x_advanced = mult1 * x - mult2 * denoised_d

        first_or_last = jnp.logical_or(i == 0, jnp.sum(next_sigma) < 1e-14)
        x_new = jnp.where(first_or_last, x_standard, x_advanced)
        return (x_new, denoised), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), jnp.arange(num_sigmas - 1))
    return x


def sample_lms(
    denoise_fn: DenoiseFn, x: Array, sigmas: Array, order: int = 4
) -> Array:
    """Linear multistep (reference sampling.py:177-215).

    Coefficients are quadrature integrals over the (host-side, static) sigma
    schedule, so the step loop is a Python loop over jitted denoise calls.
    """
    from scipy import integrate

    sigmas_np = np.asarray(sigmas)
    num_sigmas = len(sigmas_np)
    batch = x.shape[0]

    def lms_coeff(order, t, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(order):
                if j == k:
                    continue
                prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
            return prod

        return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]

    ds = []
    for i in range(num_sigmas - 1):
        sigma = jnp.full((batch,), sigmas_np[i], x.dtype)
        denoised = denoise_fn(x, sigma)
        d = to_d(x, sigma, denoised)
        ds.append(d)
        if len(ds) > order:
            ds.pop(0)
        cur_order = min(i + 1, order)
        coeffs = [lms_coeff(cur_order, sigmas_np, i, j) for j in range(cur_order)]
        x = x + sum(c * d for c, d in zip(coeffs, reversed(ds)))
    return x


SAMPLERS = {
    "euler_edm": sample_euler_edm,
    "heun_edm": sample_heun_edm,
    "euler_ancestral": sample_euler_ancestral,
    "dpmpp2s_ancestral": sample_dpmpp2s_ancestral,
    "dpmpp2m": sample_dpmpp2m,
    "lms": sample_lms,
}
