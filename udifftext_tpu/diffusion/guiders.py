"""Classifier-free guidance guiders.

Parity: sgm/modules/diffusionmodules/guiders.py:8-53. ``VanillaCFG`` doubles
the batch by concatenating (uc, c) for the four tensor conditioning keys and
blends ``uc + scale * (c - uc)`` after the network call.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_CFG_KEYS = ("vector", "t_crossattn", "v_crossattn", "concat")


@dataclasses.dataclass(frozen=True)
class VanillaCFG:
    scale: float = 5.0

    def prepare_inputs(
        self, x: Array, s: Array, c: Dict[str, Any], uc: Dict[str, Any]
    ) -> Tuple[Array, Array, Dict[str, Any]]:
        return (
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([s, s], axis=0),
            self.prepare_cond(c, uc),
        )

    def prepare_cond(self, c: Dict[str, Any], uc: Dict[str, Any]) -> Dict[str, Any]:
        """The (uc, c) batch-doubled cond dict alone — loop-invariant across a
        sampling scan, so samplers hoist this (and the UNet's cross-attn K/V
        projections of it) out of the per-step body."""
        c_out = {}
        for k in c:
            if k in _CFG_KEYS:
                c_out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
            else:
                # the reference asserts c[k] == uc[k] for every other key
                # (guiders.py:37-39) — silently reusing c[k] would run the
                # unconditional half WITH conditioning and degrade CFG to
                # near-identity with no error
                if k in uc and uc[k] is not c[k] and isinstance(c[k], jnp.ndarray):
                    raise ValueError(
                        f"CFG key {k!r} is outside {_CFG_KEYS} but holds a "
                        "distinct array for cond vs uncond — route it via "
                        "emb_key or extend the guider (the torch reference "
                        "asserts equality here rather than guiding silently)"
                    )
                c_out[k] = c[k]
        return c_out

    def __call__(self, x: Array, sigma: Array) -> Array:
        x_u, x_c = jnp.split(x, 2, axis=0)
        return x_u + self.scale * (x_c - x_u)


@dataclasses.dataclass(frozen=True)
class IdentityGuider:
    def prepare_inputs(self, x, s, c, uc):
        return x, s, dict(c)

    def __call__(self, x: Array, sigma: Array) -> Array:
        return x
