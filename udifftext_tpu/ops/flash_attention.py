"""Pallas TPU flash attention (non-causal, no mask).

Covers the UNet latent self-attention (up to 4096 tokens, head_dim 64) and
the VAE mid-block attention — the paths the reference offloads to xformers
(sgm/modules/attention.py:246-248, sgm/modules/diffusionmodules/model.py:
246-248). Blockwise accumulation over KV keeps VMEM bounded; the kernel uses
a transposed, max-free schedule (see _flash_kernel) measured 25% faster than
the classic online-softmax layout at head_dim 64.

Layout: q, k, v are (B, N, H, D); internally fused over (B*H) as the grid's
leading axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array



# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


# Logit clamp for the max-free softmax (see _flash_kernel): fp32 exp
# overflows at 88.7; at ±75, sum over 4096 keys of e^75 (~1.5e36) and the
# p·v accumulation stay inside fp32 range. Attention logits of the UNet's
# scaled qk products sit around ±30 in practice — the clamp never binds,
# making the result the exact softmax (a common factor cancels in acc/l).
_CLAMP = 75.0


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, precision):
    """Transposed-accumulation, max-free flash forward.

    Measured on v5e (scripts/flash_variants.py, ds1 shape 160×4096×64 bf16):
    8.35 ms for the classic online-softmax q@kᵀ/p@v layout vs **6.26 ms**
    here (109.7 TF/s — the per-shape roofline floor). Two effects:
      - sᵀ = k@qᵀ and accᵀ += vᵀ@pᵀ put the LONG axis (bq) on the MXU's
        128 result lanes for the p·v product; the classic layout leaves half
        the lanes idle at head_dim 64.
      - clamped exp replaces online max tracking: no m/alpha chain and no
        acc rescale per KV block (exact softmax whenever |logits| < _CLAMP;
        see _CLAMP above).
    MXU work stays in the input dtype (bf16 ~8x fp32 on the systolic array);
    accumulation/softmax stats are fp32 via preferred_element_type. Scaling
    applies to the fp32 logits, not to q.
    """
    q = q_ref[0]  # (bq, d)
    n_k = k_ref.shape[1]
    bq, d = q.shape

    acc = jnp.zeros((d, bq), jnp.float32)  # transposed accumulator
    l = jnp.zeros((1, bq), jnp.float32)

    num_kv = n_k // block_k
    for j in range(num_kv):
        k = k_ref[0, j * block_k : (j + 1) * block_k, :]
        v = v_ref[0, j * block_k : (j + 1) * block_k, :]
        # (bk, d) x (bq, d) -> (bk, bq): contraction d, result lanes bq
        st = jax.lax.dot_general(
            k,
            q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) * scale
        p = jnp.exp(jnp.clip(st, -_CLAMP, _CLAMP))
        l = l + jnp.sum(p, axis=0, keepdims=True)
        # (bk, d)ᵀ x (bk, bq) -> (d, bq): contraction bk, result lanes bq
        acc = acc + jax.lax.dot_general(
            v,
            p.astype(v.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    o_ref[0] = (acc / l).T.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 512,
) -> Array:
    """q (B, Nq, H, D), k/v (B, Nk, H, D) → (B, Nq, H, D).

    Differentiable: the backward pass recomputes the softmax row-wise (exact,
    non-flash — fine at ≤4096 tokens) in XLA; the forward stays the Pallas
    kernel. A fused Pallas backward is a later optimization.
    """
    return _flash_fwd_impl(q, k, v, scale, block_q, block_k)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_fwd_impl(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 512,
) -> Array:
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5 if scale is None else scale
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    assert nq % block_q == 0 and nk % block_k == 0

    # (B, N, H, D) -> (B*H, N, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)

    grid = (b * h, nq // block_q)
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=b * h * nq * nk,
        ),
    )(qf, kf, vf)

    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


def _fa_fwd(q, k, v, scale, block_q, block_k):
    out = _flash_fwd_impl(q, k, v, scale, block_q, block_k)
    return out, (q, k, v)


def _fa_bwd(scale, block_q, block_k, res, g):
    q, k, v = res
    d = q.shape[-1]
    s = d**-0.5 if scale is None else scale
    # fp32 primals must use exact matmuls; bf16 primals ride the native MXU
    # path with fp32 accumulation
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    ein = lambda spec, a, b: jnp.einsum(
        spec, a, b, precision=prec, preferred_element_type=jnp.float32
    )
    logits = ein("bqhd,bkhd->bhqk", q, k) * s
    p = jax.nn.softmax(logits, axis=-1)
    pq = p.astype(q.dtype)
    dv = ein("bhqk,bqhd->bkhd", pq, g)
    dp = ein("bqhd,bkhd->bhqk", g, v)
    # softmax vjp: dlogits = p * (dp - sum_k(p * dp))
    dsum = jnp.sum(p * dp, axis=-1, keepdims=True)
    dlogits = (p * (dp - dsum)).astype(q.dtype)
    dq = ein("bhqk,bkhd->bqhd", dlogits, k) * s
    dk = ein("bhqk,bqhd->bkhd", dlogits, q) * s
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
