"""Transformer blocks for the UNet (and VAE mid-attention).

Parity: sgm/modules/attention.py —
  - CrossAttention (:111-174): textual/visual cross-attn that materializes the
    softmax attention map (softmax over tokens, sigmoid if a single token) so
    the local loss / AAE / viz can consume it. We return the map as an aux
    output instead of mutating module state.
  - MemoryEfficientCrossAttention (:177-262): the fused self-attention path —
    here `ops.sdpa` (Pallas flash on TPU).
  - BasicTransformerBlock (:265-341): self-attn → t_attn → (v_attn) → GEGLU FF,
    all with pre-LayerNorm residuals.
  - SpatialTransformer (:344-416): GroupNorm → linear proj-in → blocks →
    zero-init proj-out → residual, on (B, H, W, C).

The attention maps are shaped (B, heads, N, L) float32.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import sdpa
from .layers import Dense, GroupNorm32, matmul_precision, zeros_init

Array = jax.Array
Dtype = Any


class _KernelParams(nn.Module):
    """Bias-free kernel holder named Dense_0 so the flax param path matches a
    `Dense(use_bias=False)` submodule exactly (checkpoint-converter and
    `precompute_context_kv` compatibility — unet.py reads
    `attn_p["to_k"]["Dense_0"]["kernel"]`)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _KernelOnly(self.features, self.in_features, name="Dense_0")()


class _KernelOnly(nn.Module):
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )


class _BiasedKernelParams(nn.Module):
    """Kernel+bias holder matching a `Dense(zero_init=...)` submodule's param
    tree (to_out compatibility for the fused cross-attention branch)."""

    features: int
    in_features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        return _BiasedKernelOnly(
            self.features, self.in_features, self.zero_init, name="Dense_0"
        )()


class _BiasedKernelOnly(nn.Module):
    features: int
    in_features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = zeros_init if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", init, (self.in_features, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _LNParams(nn.Module):
    """Scale/bias holder matching LayerNormF32's param tree
    (<name>/LayerNorm_0/{scale,bias}) so the fused-glue paths can read the
    norm parameters without running the XLA LayerNorm."""

    features: int

    @nn.compact
    def __call__(self):
        return _LNParamsInner(self.features, name="LayerNorm_0")()


class _LNParamsInner(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


def _ln_f32(x: Array, scale: Array, bias: Array, eps: float = 1e-5) -> Array:
    """Functional LayerNorm with fp32 centered stats — delegates to the one
    canonical implementation (ops/ln_gemm.ln_ref_f32) so the fused kernels'
    reference math can never drift from the XLA fallback's."""
    from ..ops.ln_gemm import ln_ref_f32

    return ln_ref_f32(x, scale, bias, eps)


class SelfAttention(nn.Module):
    """Fused multi-head self-attention (no map capture).

    The SHIPPED path runs q/k/v as three separate GEMMs: the round-5
    glue-fusion probe measured three 320-wide GEMMs 2.1× FASTER than one
    fused 320→960 GEMM at these shapes (the ops are HBM-bound, not
    MXU-lane-bound), and an apply-time kernel concat regressed the
    end-to-end bench via strided-split copies (scripts/glue_fusion_probe.py,
    ROOFLINE.md round 5). A fused LN→qkv Pallas kernel with COMPACT outputs
    (ops/ln_gemm.ln_gemm3) remains behind `fuse_qkv` + `ln` for A/B use;
    the parameter tree (to_q/to_k/to_v kernels) is identical either way, so
    torch converters are untouched."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # fuse_qkv=True concatenates the to_q/to_k/to_v kernels at apply time
    # into one (C, 3·inner) GEMM (+ compacting split); with `ln` it instead
    # runs the Pallas ln_gemm3 kernel (compact outputs). DEFAULT OFF: the
    # round-5 probe measured the concat 2.1× SLOWER than three separate
    # 320-wide GEMMs (HBM-bound, not lane-bound) and the end-to-end bench
    # regressed 1.72 → 1.57 via the strided-split copies. The flag stays as
    # the A/B hook that keeps that evidence reproducible
    # (scripts/glue_fusion_probe.py sections A/B).
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x: Array, ln: Optional[Tuple[Array, Array]] = None) -> Array:
        """`ln`, when given, is the PRE-norm (scale, bias) and `x` is the RAW
        (un-normalized) input: the LayerNorm is fused into the qkv projection
        (Pallas ln_gemm3 on TPU — the normalized activation never round-trips
        HBM and q/k/v come back as COMPACT buffers; XLA fallback applies the
        same fp32-stats LN then separate projections)."""
        inner = self.heads * self.dim_head
        b, n, c = x.shape
        use_ln_kernel = False
        if self.fuse_qkv and ln is not None:
            from ..ops.ln_gemm import ln_gemm3, ln_gemm3_supported

            use_ln_kernel = ln_gemm3_supported(x, inner)
        if use_ln_kernel:
            wq = _KernelParams(inner, c, name="to_q")()
            wk = _KernelParams(inner, c, name="to_k")()
            wv = _KernelParams(inner, c, name="to_v")()
            q, k, v = ln_gemm3(x.astype(self.dtype), ln[0], ln[1], wq, wk, wv)
        elif self.fuse_qkv:
            # XLA concat-qkv (the probe's section-A subject): one wide GEMM,
            # then a split whose strided views XLA compacts with copies
            if ln is not None:
                x = _ln_f32(x.astype(self.dtype), ln[0], ln[1])
            wq = _KernelParams(inner, c, name="to_q")()
            wk = _KernelParams(inner, c, name="to_k")()
            wv = _KernelParams(inner, c, name="to_v")()
            w = jnp.concatenate(
                [wq.astype(self.dtype), wk.astype(self.dtype), wv.astype(self.dtype)],
                axis=1,
            )
            qkv = jnp.matmul(
                x.astype(self.dtype), w, precision=matmul_precision(self.dtype)
            )
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            if ln is not None:
                x = _ln_f32(x.astype(self.dtype), ln[0], ln[1])
            q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
            v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, n, self.heads, self.dim_head)
        v = v.reshape(b, n, self.heads, self.dim_head)
        out = sdpa(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, n, inner)
        return Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class CrossAttention(nn.Module):
    """Cross-attention with explicit softmax map (reference :111-174).

    Query length is the pixel count (≤4096); context length is tiny (12
    LabelEncoder tokens), so materializing the (B·H, N, L) map is cheap.
    """

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        context: Array,
        capture_map: bool = False,
        kv: Optional[Tuple[Array, Array]] = None,
        ln: Optional[Tuple[Array, Array]] = None,
    ) -> Tuple[Array, Optional[Array]]:
        """`kv`, when given, is the pre-projected (k, v) pair shaped
        (B, L, heads, dim_head) — the to_k/to_v projections of a context that
        is CONSTANT across a sampling scan are loop-invariant, so callers may
        hoist them out of the scan (models/unet.precompute_context_kv) and
        skip the per-step projections here. Bit-exact with the inline path
        (same dtype casts and matmul precision).

        `ln`, when given, is the PRE-norm (scale, bias), `x` is the RAW
        (un-normalized) input, and the RETURNED output INCLUDES the residual
        add (`x + branch`): on TPU with hoisted kv and no map capture the
        whole branch (LN → q proj → 12-token attention → out proj → residual)
        runs as ONE Pallas kernel (ops/cross_attention.py) that reads x once
        from HBM and writes once."""
        inner = self.heads * self.dim_head
        b, n, _ = x.shape
        scale = self.dim_head**-0.5

        # the fused branch is softmax-only: a SINGLE-token context uses
        # sigmoid attention (reference attention.py:160-163 — see below), so
        # L == 1 must keep the plain path regardless of fuse_glue
        if ln is not None and kv is not None and not capture_map and kv[0].shape[1] > 1:
            if context is not None:
                # keep to_k/to_v in the tree (the hoist reads them)
                _KernelParams(inner, context.shape[-1], name="to_k")()
                _KernelParams(inner, context.shape[-1], name="to_v")()
            wq = _KernelParams(inner, x.shape[-1], name="to_q")()
            wo, bo = _BiasedKernelParams(
                x.shape[-1], inner, zero_init=True, name="to_out"
            )()
            k, v = kv
            from ..ops.cross_attention import (
                cross_attention_supported, fused_cross_attention,
                fused_cross_attention_ref,
            )

            xc = x.astype(self.dtype)
            fn = (
                fused_cross_attention
                if cross_attention_supported(xc, k, self.heads)
                else fused_cross_attention_ref
            )
            return fn(xc, ln[0], ln[1], wq, k, v, wo, bo, self.heads), None
        x_residual = None
        if ln is not None:
            x_residual = x  # ln-given contract: output includes the residual
            x = _ln_f32(x.astype(self.dtype), ln[0], ln[1])

        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        # k/v stay SEPARATE GEMMs: a concat-GEMM + jnp.split yields strided
        # views whose compaction copies cost more than the wide-GEMM saves
        # (round-5 bench regression on the q/k/v version of the same idea)
        if kv is None:
            l = context.shape[1]
            k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
            v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
            k = k.reshape(b, l, self.heads, self.dim_head)
            v = v.reshape(b, l, self.heads, self.dim_head)
        else:
            k, v = kv
            l = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)

        sim = jnp.einsum("bnhd,blhd->bhnl", q, k, precision=matmul_precision(self.dtype)) * scale
        sim = sim.astype(jnp.float32)
        if l > 1:
            attn = jax.nn.softmax(sim, axis=-1)  # softmax over tokens
        else:
            attn = jax.nn.sigmoid(sim)  # sigmoid on single-token context
        attn_c = attn.astype(self.dtype)
        out = jnp.einsum("bhnl,blhd->bnhd", attn_c, v, precision=matmul_precision(self.dtype)).reshape(b, n, inner)
        # reference zero-inits to_out (attention.py:129-134)
        out = Dense(x.shape[-1], zero_init=True, dtype=self.dtype, name="to_out")(out)
        if x_residual is not None:
            out = out + x_residual.astype(out.dtype)
        return out, (attn if capture_map else None)


class _LinParams(nn.Module):
    """Kernel/bias holder named Dense_0 so the flax param path stays identical
    to the Dense module nesting (checkpoint-converter compatibility)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _DenseParams(nn.Module):
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _LinParams(self.features, self.in_features, name="Dense_0")()


class GEGLUFeedForward(nn.Module):
    """GEGLU FF (reference :44-69): Dense(d→8d) split ×gelu, Dense(4d→d).

    On TPU the whole FF runs as one fused Pallas kernel (ops/geglu.py) that
    keeps the 8×-wide gated hidden activations in VMEM — XLA's unfused form
    round-trips them through HBM (measured 4.35 ms vs ~2.3 ms fused for the
    ds1 layer, scripts/profile_transformer.py). `impl="xla"` forces the
    reference-shaped einsum path (CPU tests, debugging)."""

    mult: int = 4
    dtype: Dtype = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array, ln: Optional[Tuple[Array, Array]] = None) -> Array:
        """`ln`, when given, is the PRE-norm (scale, bias) and `x` is the RAW
        input: the LayerNorm runs inside the fused kernel's prologue
        (geglu_ff_ln), or as a functional fp32-stat LN on the XLA path."""
        dim = x.shape[-1]
        inner = dim * self.mult
        w1, b1 = _DenseParams(inner * 2, dim, name="proj")()
        w2, b2 = _DenseParams(dim, inner, name="out")()

        x = x.astype(self.dtype)  # Dense(dtype=...) promoted inputs likewise
        n = x.shape[1]
        # n % 128 == 0 guarantees _geglu_fwd_impl's _pick_block finds a
        # dividing block (review round 3: the old n % 256 gate admitted
        # N=768/1280, which asserted inside the kernel at block_n=512)
        use_fused = (
            self.impl == "fused"
            or (self.impl == "auto"
                and jax.default_backend() == "tpu"
                and n % 128 == 0)
        )
        if use_fused:
            if ln is not None:
                from ..ops.geglu import geglu_ff_ln

                return geglu_ff_ln(x, ln[0], ln[1], w1, b1, w2, b2,
                                   block_n=min(512, n))
            from ..ops.geglu import geglu_ff

            return geglu_ff(x, w1, b1, w2, b2, block_n=min(512, n))

        if ln is not None:
            x = _ln_f32(x, ln[0], ln[1])
        prec = matmul_precision(self.dtype)
        hg = jnp.matmul(x, w1.astype(x.dtype), precision=prec) + b1.astype(x.dtype)
        h, gate = jnp.split(hg, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return jnp.matmul(h, w2.astype(x.dtype), precision=prec) + b2.astype(x.dtype)


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 (torch LN under autocast runs fp32)."""

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig = x.dtype
        out = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return out.astype(orig)


class BasicTransformerBlock(nn.Module):
    """self-attn → t_attn → (v_attn) → GEGLU FF with pre-LN residuals.

    On TPU (bf16, N % 128 == 0, `fuse_glue` != "off") every pre-LayerNorm is
    fused into its consumer instead of round-tripping the (B, N, C)
    activation through HBM: norm1 → the qkv projection (ops/ln_gemm),
    t_norm/v_norm → the single-kernel cross-attention branch
    (ops/cross_attention, residual included), norm3 → the GEGLU prologue
    (ops/geglu.geglu_ff_ln). The parameter tree is IDENTICAL in both paths
    (LN scale/bias declared via holders at the same names), so checkpoints
    convert once and run either way. Map capture keeps the XLA cross-attn
    path (the kernel does not materialize the softmax map)."""

    heads: int
    dim_head: int
    t_context_dim: Optional[int] = None
    v_context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # A/B hook for scripts/glue_fusion_probe.py — True routes SelfAttention
    # through the concat-qkv GEMM (measured slower; see SelfAttention)
    fuse_qkv: bool = False
    # "auto" | "off" | "force" — LN-into-consumer fusion ("force" takes the
    # fused branch regardless of backend; off-TPU the ops' XLA reference
    # fallbacks run, which makes the branch CPU-testable).
    #
    # DEFAULT OFF — measured round 5 (scripts/glue_fusion_probe.py, v5e):
    # every fused variant LOSES to XLA's own scheduling of this bytes-bound
    # glue — ds1 block 11.61 ms plain vs 13.07 ms fused; the Pallas t_attn
    # branch kernel 1.47 ms vs 0.96 ms XLA; ln_gemm3 1.19 ms vs LN+3 GEMMs
    # 0.65 ms; and a plain XLA concat-qkv GEMM is 2x slower than three
    # separate 320-wide GEMMs (1.02 vs 0.49 ms) before even paying the
    # strided-split copies. The machinery stays for A/B evidence and other
    # toolchains/shapes; the shipped path is the XLA composition.
    fuse_glue: str = "off"

    @nn.compact
    def __call__(
        self,
        x: Array,
        t_context: Optional[Array] = None,
        v_context: Optional[Array] = None,
        capture_map: bool = False,
        ctx_kv: Optional[Dict[str, Tuple[Array, Array]]] = None,
    ) -> Tuple[Array, Optional[Array]]:
        ctx_kv = ctx_kv or {}
        c = x.shape[-1]
        fuse = self.fuse_glue == "force" or (
            self.fuse_glue != "off"
            and self.fuse_qkv
            and self.dtype == jnp.bfloat16
            and self.attn_impl != "xla"
            and jax.default_backend() == "tpu"
            and x.shape[1] % 128 == 0
        )

        if fuse:
            s1, b1 = _LNParams(c, name="norm1")()
            x = SelfAttention(
                self.heads, self.dim_head, dtype=self.dtype,
                attn_impl=self.attn_impl, fuse_qkv=True, name="attn1"
            )(x, ln=(s1, b1)) + x
        else:
            x = (
                SelfAttention(
                    self.heads, self.dim_head, dtype=self.dtype,
                    attn_impl=self.attn_impl, fuse_qkv=self.fuse_qkv, name="attn1"
                )(LayerNormF32(dtype=self.dtype, name="norm1")(x))
                + x
            )

        t_map = None
        if self.t_context_dim is not None and self.t_context_dim > 0:
            if fuse and ctx_kv.get("t") is not None and not capture_map:
                st, bt = _LNParams(c, name="t_norm")()
                x, _ = CrossAttention(
                    self.heads, self.dim_head, dtype=self.dtype, name="t_attn"
                )(x, t_context, False, kv=ctx_kv["t"], ln=(st, bt))
            else:
                h, t_map = CrossAttention(
                    self.heads, self.dim_head, dtype=self.dtype, name="t_attn"
                )(LayerNormF32(dtype=self.dtype, name="t_norm")(x), t_context,
                  capture_map, kv=ctx_kv.get("t"))
                x = h + x
        if self.v_context_dim is not None and self.v_context_dim > 0:
            if fuse and ctx_kv.get("v") is not None:
                sv, bv = _LNParams(c, name="v_norm")()
                x, _ = CrossAttention(
                    self.heads, self.dim_head, dtype=self.dtype, name="v_attn"
                )(x, v_context, False, kv=ctx_kv["v"], ln=(sv, bv))
            else:
                h, _ = CrossAttention(
                    self.heads, self.dim_head, dtype=self.dtype, name="v_attn"
                )(LayerNormF32(dtype=self.dtype, name="v_norm")(x), v_context, False,
                  kv=ctx_kv.get("v"))
                x = h + x

        ff = GEGLUFeedForward(
            dtype=self.dtype,
            impl="xla" if self.attn_impl == "xla" else "auto",
            name="ff",
        )
        if fuse:
            s3, b3 = _LNParams(c, name="norm3")()
            x = ff(x, ln=(s3, b3)) + x
        else:
            x = ff(LayerNormF32(dtype=self.dtype, name="norm3")(x)) + x
        return x, t_map


class SpatialTransformer(nn.Module):
    """Transformer over pixels (reference :344-416), use_linear variant.

    Returns (x, [t_attn_map per depth]) — maps are None unless capture_map.
    """

    heads: int
    dim_head: int
    depth: int = 1
    t_context_dim: Optional[int] = None
    v_context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: Array,
        t_context: Optional[Array] = None,
        v_context: Optional[Array] = None,
        capture_map: bool = False,
        ctx_kv: Optional[List[Dict[str, Tuple[Array, Array]]]] = None,
    ) -> Tuple[Array, List[Optional[Array]]]:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(eps=1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = Dense(inner, dtype=self.dtype, name="proj_in")(x)
        maps = []
        for d in range(self.depth):
            x, m = BasicTransformerBlock(
                self.heads,
                self.dim_head,
                t_context_dim=self.t_context_dim,
                v_context_dim=self.v_context_dim,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"blocks_{d}",
            )(x, t_context, v_context, capture_map,
              ctx_kv[d] if ctx_kv is not None else None)
            maps.append(m)
        x = Dense(c, zero_init=True, dtype=self.dtype, name="proj_out")(x)
        x = x.reshape(b, h, w, c)
        return x + x_in, maps
