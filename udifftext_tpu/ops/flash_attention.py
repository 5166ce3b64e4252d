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


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float, block_k: int, precision
):
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
    # denominator residual for the fused backward (tiny: one fp32 per q row)
    l_ref[0, 0] = l[0]


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

    Differentiable: both passes are fused Pallas kernels. The forward saves
    only the output and the per-row softmax denominators; the backward
    (_flash_bwd_impl) recomputes probabilities blockwise in VMEM — the XLA
    fallback materializes the full (B, H, Nq, Nk) fp32 softmax twice, ~335 MB
    per ds1 layer at training shapes.
    """
    return _flash_fwd_impl(q, k, v, scale, block_q, block_k)[0]


def _pick_block(n: int, preferred: int) -> int:
    """Largest multiple-of-128 divisor of n that is ≤ preferred (n itself if
    none exists — callers guarantee n % 128 == 0 via _flash_ok, but degrade
    gracefully otherwise instead of asserting)."""
    if n <= preferred:
        return n
    for cand in range(min(preferred, n) // 128 * 128, 0, -128):
        if n % cand == 0:
            return cand
    return n


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_fwd_impl(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 512,
):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5 if scale is None else scale
    block_q = _pick_block(nq, block_q)
    block_k = _pick_block(nk, block_k)
    assert nq % block_q == 0 and nk % block_k == 0

    # (B, N, H, D) -> (B*H, N, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)

    grid = (b * h, nq // block_q)
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    out, l = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, nq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=b * h * nq * nk,
        ),
    )(qf, kf, vf)

    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3), l


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _flash_bwd_kernel(
    q_ref, g_ref, kb_ref, vb_ref, l_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, dq_acc,
    *, scale: float, block_q: int, n_kv: int, precision,
):
    """One pass over (batch·head, kv-block) computing dk/dv for the block and
    accumulating dq across kv blocks in a VMEM scratch.

    Layout mirrors the forward: sᵀ = k@qᵀ keeps the long q axis on the MXU's
    128 result lanes; probabilities are recomputed from the saved denominator
    l (no lse/max chain — the forward's clamped-exp softmax), so nothing
    N²-sized ever leaves VMEM. Per (i, j) step with q chunked by block_q:
      p   = exp(clip(k·qᵀ·scale)) / l
      dv += p @ g          dp = v @ gᵀ
      ds  = p·(dp − delta)·scale   (masked where the clamp binds)
      dk += ds @ q         dq[chunk] += dsᵀ @ k
    delta = rowsum(g·out) is computed in XLA (one cheap fused reduction).
    """
    j = pl.program_id(1)
    kb = kb_ref[0]  # (bk, d)
    vb = vb_ref[0]
    nq, d = q_ref.shape[1], q_ref.shape[2]

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    dk = jnp.zeros((kb.shape[0], d), jnp.float32)
    dv = jnp.zeros((kb.shape[0], d), jnp.float32)

    for qi in range(nq // block_q):
        sl = slice(qi * block_q, (qi + 1) * block_q)
        qc = q_ref[0, sl, :]        # (bq, d)
        gc = g_ref[0, sl, :]        # (bq, d)
        lc = l_ref[0, 0, sl][None, :]      # (1, bq) fp32
        dc = delta_ref[0, 0, sl][None, :]  # (1, bq) fp32

        st = jax.lax.dot_general(
            kb, qc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale                   # (bk, bq)
        p = jnp.exp(jnp.clip(st, -_CLAMP, _CLAMP)) / lc
        pc = p.astype(vb.dtype)

        # dv += p @ g : contract bq -> (bk, d)
        dv = dv + jax.lax.dot_general(
            pc, gc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dp = v @ gᵀ : contract d -> (bk, bq)
        dp = jax.lax.dot_general(
            vb, gc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - dc) * scale
        # the clamp's vjp: zero where |logits| >= _CLAMP (never binds for
        # real attention logits; kept for exactness of the computed function)
        ds = jnp.where(jnp.abs(st) < _CLAMP, ds, 0.0)
        dsc = ds.astype(qc.dtype)

        # dk += ds @ q : contract bq -> (bk, d)
        dk = dk + jax.lax.dot_general(
            dsc, qc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dq[chunk] += dsᵀ @ k : contract bk -> (bq, d)
        dq_acc[sl, :] += jax.lax.dot_general(
            dsc, kb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(j == n_kv - 1)
    def _():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_bwd_impl(q, k, v, out, l, g, scale, block_q=512, block_k=512):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    block_q = _pick_block(nq, block_q)
    block_k = _pick_block(nk, block_k)
    assert nq % block_q == 0 and nk % block_k == 0

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    gf = g.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    # delta_i = Σ_d g·out per q row — fused by XLA into one cheap reduction
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(b * h, 1, nq)

    n_kv = nk // block_k
    grid = (b * h, n_kv)
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_kernel, scale=scale, block_q=block_q, n_kv=n_kv,
            precision=precision,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, nk, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((nq, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * nq * nk * d,
            bytes_accessed=(qf.size * 3 + kf.size * 4) * qf.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(qf, gf, kf, vf, l, delta)

    unflat = lambda x, n: x.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return unflat(dq, nq), unflat(dk, nk), unflat(dv, nk)


def _fa_fwd(q, k, v, scale, block_q, block_k):
    out, l = _flash_fwd_impl(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, l)


def _fa_bwd(scale, block_q, block_k, res, g):
    q, k, v, out, l = res
    d = q.shape[-1]
    s = d**-0.5 if scale is None else scale
    # the backward prefers 512-wide q chunks regardless of the forward's
    # block_q (dq lives in a VMEM scratch); _pick_block degrades both to a
    # divisor of the actual sequence length
    dq, dk, dv = _flash_bwd_impl(q, k, v, out, l, g, s, block_q=min(block_q, 512),
                                 block_k=block_k)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
