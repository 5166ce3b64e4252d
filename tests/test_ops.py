"""Pallas kernel tests (run on the TPU backend; skipped elsewhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu = jax.default_backend() == "tpu"


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_fused_groupnorm_silu_matches_xla():
    from udifftext_tpu.models.layers import GroupNorm32, silu
    from udifftext_tpu.ops.groupnorm import fused_groupnorm_silu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    scale = jnp.asarray(rng.randn(64).astype(np.float32))
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    gn = GroupNorm32()
    params = {"params": {"GroupNorm_0": {"scale": scale, "bias": bias}}}
    ref = silu(gn.apply(params, x))
    out = fused_groupnorm_silu(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_flash_attention_matches_xla():
    from udifftext_tpu.ops.attention import _xla_sdpa
    from udifftext_tpu.ops.flash_attention import flash_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (2, 256, 4, 64))
    k = jax.random.normal(k2, (2, 256, 4, 64))
    v = jax.random.normal(k3, (2, 256, 4, 64))
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v)), np.asarray(_xla_sdpa(q, k, v)),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_flash_attention_vjp_matches_xla():
    """Fused Pallas backward: dq, dk, dv against XLA autodiff (fp32 exact)."""
    from udifftext_tpu.ops.attention import _xla_sdpa
    from udifftext_tpu.ops.flash_attention import flash_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (1, 128, 2, 64))
    k = jax.random.normal(k2, (1, 128, 2, 64))
    v = jax.random.normal(k3, (1, 128, 2, 64))

    g1 = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v) ** 2), (0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(_xla_sdpa(q, k, v) ** 2), (0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_flash_attention_vjp_bf16_training_shape():
    """bf16 grads at a multi-block training shape (q chunking + kv-grid
    accumulation paths of the backward kernel all exercised)."""
    from udifftext_tpu.ops.attention import _xla_sdpa
    from udifftext_tpu.ops.flash_attention import flash_attention

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    shp = (2, 1024, 2, 64)
    q = (jax.random.normal(k1, shp) * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(k2, shp) * 0.5).astype(jnp.bfloat16)
    v = (jax.random.normal(k3, shp) * 0.5).astype(jnp.bfloat16)
    g = (jax.random.normal(k4, shp) * 0.5).astype(jnp.bfloat16)

    _, vjp1 = jax.vjp(flash_attention, q, k, v)
    _, vjp2 = jax.vjp(_xla_sdpa, q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32))
    for a, b, name in zip(vjp1(g), vjp2(g.astype(jnp.float32)), ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-2, atol=5e-2, err_msg=name,
        )


def test_pick_block_divides():
    """Block picking must return a divisor for every _flash_ok-admissible N
    (review round 3: N=1536 asserted at the old fixed 1024 default; N=640
    crashed the backward's fixed 512)."""
    from udifftext_tpu.ops.flash_attention import _pick_block

    for n in range(128, 8192 + 1, 128):
        for preferred in (512, 1024):
            blk = _pick_block(n, preferred)
            assert n % blk == 0, (n, preferred, blk)
            assert blk <= max(preferred, 128)
    assert _pick_block(1536, 1024) == 768
    assert _pick_block(640, 512) == 128
    assert _pick_block(768, 512) == 384
    assert _pick_block(4096, 1024) == 1024


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_flash_attention_nonpow2_seq_fwd_bwd():
    """N=1536 (e.g. a 48x32 latent) through fwd AND the fused backward —
    the review-found crash shapes."""
    from udifftext_tpu.ops.attention import _xla_sdpa
    from udifftext_tpu.ops.flash_attention import flash_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(k1, (1, 1536, 2, 64))
    k = jax.random.normal(k2, (1, 1536, 2, 64))
    v = jax.random.normal(k3, (1, 1536, 2, 64))
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v)), np.asarray(_xla_sdpa(q, k, v)),
        rtol=1e-5, atol=1e-5,
    )
    g1 = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(_xla_sdpa(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_fused_geglu_nonpow2_seq():
    """N=768 admitted by the n%128 gate must pick a dividing block (the old
    n%256 gate + fixed 512 block asserted inside the kernel)."""
    from udifftext_tpu.ops.geglu import geglu_ff

    rng = np.random.RandomState(2)
    c, inner, n = 64, 256, 768
    x = jnp.asarray(rng.randn(1, n, c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(c, 2 * inner).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(2 * inner).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(inner, c).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)

    from udifftext_tpu.ops.geglu import _geglu_ref

    out = geglu_ff(x, w1, b1, w2, b2)
    ref = _geglu_ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_fused_geglu_matches_xla():
    from udifftext_tpu.ops.geglu import _geglu_ref, geglu_ff

    rng = np.random.RandomState(0)
    for c, inner_mult, n in ((64, 4, 512), (128, 4, 256)):
        inner = c * inner_mult
        x = jnp.asarray(rng.randn(2, n, c), jnp.bfloat16) * 0.5
        w1 = jnp.asarray(rng.randn(c, 2 * inner) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.randn(2 * inner) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.randn(inner, c) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        out = geglu_ff(x, w1, b1, w2, b2, 256)
        ref = _geglu_ref(x, w1, b1, w2, b2)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=3e-2,
        )


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_fused_geglu_vjp_matches_xla():
    from udifftext_tpu.ops.geglu import _geglu_ref, geglu_ff

    rng = np.random.RandomState(1)
    c, inner, n = 64, 256, 256
    x = jnp.asarray(rng.randn(1, n, c), jnp.float32) * 0.5
    w1 = jnp.asarray(rng.randn(c, 2 * inner) * 0.05, jnp.float32)
    b1 = jnp.zeros((2 * inner,), jnp.float32)
    w2 = jnp.asarray(rng.randn(inner, c) * 0.05, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    g1 = jax.grad(lambda xx: jnp.sum(geglu_ff(xx, w1, b1, w2, b2, 256) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(_geglu_ref(xx, w1, b1, w2, b2) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-2, atol=2e-2)


def test_ln_gemm_ref_matches_module_path():
    """ln_gemm_ref must agree with LayerNormF32 + matmul (the exact module
    composition it replaces in BasicTransformerBlock) — CPU-runnable."""
    from udifftext_tpu.models.attention import LayerNormF32
    from udifftext_tpu.ops.ln_gemm import ln_gemm_ref

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32)) * 3.0 + 1.0
    scale = jnp.asarray(rng.randn(32).astype(np.float32))
    bias = jnp.asarray(rng.randn(32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 96).astype(np.float32))

    ln = LayerNormF32()
    params = {"params": {"LayerNorm_0": {"scale": scale, "bias": bias}}}
    ref = jnp.matmul(ln.apply(params, x), w, precision=jax.lax.Precision.HIGHEST)
    out = ln_gemm_ref(x, scale, bias, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_ln_gemm_kernel_matches_ref():
    from udifftext_tpu.ops.ln_gemm import ln_gemm, ln_gemm_ref

    rng = np.random.RandomState(1)
    for (b, n, c, f), dt in (
        ((2, 512, 320, 960), jnp.bfloat16),   # ds1 fused-qkv shape (scaled N)
        ((2, 256, 640, 640), jnp.bfloat16),   # ds2 cross-q shape
        ((2, 128, 1280, 3840), jnp.bfloat16), # ds4 fused qkv (chunked F)
    ):
        x = jnp.asarray(rng.randn(b, n, c), dt) * 2.0
        scale = jnp.asarray(rng.randn(c).astype(np.float32))
        bias = jnp.asarray(rng.randn(c).astype(np.float32))
        w = jnp.asarray(rng.randn(c, f), dt) * 0.05
        out = ln_gemm(x, scale, bias, w)
        ref = ln_gemm_ref(x, scale, bias, w)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=5e-2, atol=5e-2,
        )


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_ln_gemm_vjp_matches_ref():
    from udifftext_tpu.ops.ln_gemm import ln_gemm, ln_gemm_ref

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 256, 320), jnp.bfloat16)
    scale = jnp.asarray(rng.randn(320).astype(np.float32))
    bias = jnp.asarray(rng.randn(320).astype(np.float32))
    w = jnp.asarray(rng.randn(320, 960), jnp.bfloat16) * 0.05

    def f_kernel(xx):
        return jnp.sum(ln_gemm(xx, scale, bias, w) ** 2)

    def f_ref(xx):
        return jnp.sum(ln_gemm_ref(xx, scale, bias, w) ** 2)

    gk = jax.grad(f_kernel)(x)
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(
        np.asarray(gk, np.float32), np.asarray(gr, np.float32), rtol=1e-1, atol=1e-1
    )


def test_fused_cross_attention_ref_matches_module_path():
    """fused_cross_attention_ref == LN + CrossAttention(hoisted kv) + residual
    (the exact composition it replaces) — CPU-runnable."""
    from udifftext_tpu.models.attention import CrossAttention, LayerNormF32
    from udifftext_tpu.ops.cross_attention import fused_cross_attention_ref

    rng = np.random.RandomState(0)
    heads, d = 4, 8
    x = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    ctx = jnp.asarray(rng.randn(2, 12, 16).astype(np.float32))
    ln = LayerNormF32()
    lnp = ln.init(jax.random.PRNGKey(0), x)
    ca = CrossAttention(heads=heads, dim_head=d)
    cap = ca.init(jax.random.PRNGKey(1), x, ctx)
    # make to_out nonzero (it is zero-init) so the test is non-trivial
    cap = jax.tree.map(lambda a: a + 0.01, cap)
    lnp = jax.tree.map(lambda a: a + 0.01, lnp)

    p = cap["params"]
    k = (ctx @ p["to_k"]["Dense_0"]["kernel"]).reshape(2, 12, heads, d)
    v = (ctx @ p["to_v"]["Dense_0"]["kernel"]).reshape(2, 12, heads, d)

    out_mod, _ = ca.apply(cap, ln.apply(lnp, x), ctx, False, kv=(k, v))
    ref = fused_cross_attention_ref(
        x, lnp["params"]["LayerNorm_0"]["scale"], lnp["params"]["LayerNorm_0"]["bias"],
        p["to_q"]["Dense_0"]["kernel"], k, v,
        p["to_out"]["Dense_0"]["kernel"], p["to_out"]["Dense_0"]["bias"], heads,
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out_mod + x), rtol=2e-4, atol=2e-4
    )


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_fused_cross_attention_kernel_matches_ref():
    from udifftext_tpu.ops.cross_attention import (
        fused_cross_attention, fused_cross_attention_ref,
    )

    rng = np.random.RandomState(1)
    for b, n, c, heads in ((2, 512, 320, 5), (2, 256, 640, 10), (1, 128, 1280, 20)):
        d = c // heads
        x = jnp.asarray(rng.randn(b, n, c), jnp.bfloat16)
        s = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1 + 1.0
        bb = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1
        wq = jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.05
        wo = jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.05
        bo = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1
        k = jnp.asarray(rng.randn(b, 12, heads, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, 12, heads, d), jnp.bfloat16)
        out = fused_cross_attention(x, s, bb, wq, k, v, wo, bo, heads)
        ref = fused_cross_attention_ref(x, s, bb, wq, k, v, wo, bo, heads)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=5e-2, atol=5e-2,
        )


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_fused_cross_attention_vjp_matches_ref():
    from udifftext_tpu.ops.cross_attention import (
        fused_cross_attention, fused_cross_attention_ref,
    )

    rng = np.random.RandomState(2)
    b, n, c, heads = 1, 256, 320, 5
    d = c // heads
    x = jnp.asarray(rng.randn(b, n, c), jnp.bfloat16)
    s = jnp.ones((c,), jnp.float32)
    bb = jnp.zeros((c,), jnp.float32)
    wq = jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.05
    wo = jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.05
    bo = jnp.zeros((c,), jnp.float32)
    k = jnp.asarray(rng.randn(b, 12, heads, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, 12, heads, d), jnp.bfloat16)

    gk = jax.grad(lambda xx: jnp.sum(
        fused_cross_attention(xx, s, bb, wq, k, v, wo, bo, heads) ** 2))(x)
    gr = jax.grad(lambda xx: jnp.sum(
        fused_cross_attention_ref(xx, s, bb, wq, k, v, wo, bo, heads) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(gk, np.float32), np.asarray(gr, np.float32), rtol=1e-1, atol=2e-1
    )


def test_ln_gemm3_ref_matches_module_path():
    from udifftext_tpu.models.attention import LayerNormF32
    from udifftext_tpu.ops.ln_gemm import ln_gemm3_ref

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32)) * 2.0
    scale = jnp.asarray(rng.randn(32).astype(np.float32))
    bias = jnp.asarray(rng.randn(32).astype(np.float32))
    ws = [jnp.asarray(rng.randn(32, 24).astype(np.float32)) for _ in range(3)]

    ln = LayerNormF32()
    params = {"params": {"LayerNorm_0": {"scale": scale, "bias": bias}}}
    xn = ln.apply(params, x)
    outs = ln_gemm3_ref(x, scale, bias, *ws)
    for o, w in zip(outs, ws):
        ref = jnp.matmul(xn, w, precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not tpu, reason="needs TPU backend")
def test_ln_gemm3_kernel_matches_ref():
    from udifftext_tpu.ops.ln_gemm import ln_gemm3, ln_gemm3_ref

    rng = np.random.RandomState(4)
    for b, n, c in ((2, 512, 320), (2, 256, 640)):
        x = jnp.asarray(rng.randn(b, n, c), jnp.bfloat16) * 2.0
        scale = jnp.asarray(rng.randn(c).astype(np.float32))
        bias = jnp.asarray(rng.randn(c).astype(np.float32))
        ws = [jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.05 for _ in range(3)]
        outs = ln_gemm3(x, scale, bias, *ws)
        refs = ln_gemm3_ref(x, scale, bias, *ws)
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(
                np.asarray(o, np.float32), np.asarray(r, np.float32),
                rtol=5e-2, atol=5e-2,
            )
    # ds4 (C=1280): three resident weights exceed the VMEM budget — the
    # support gate must say no (SelfAttention then falls back to LN + GEMMs)
    from udifftext_tpu.ops.ln_gemm import ln_gemm3_supported

    assert not ln_gemm3_supported(jnp.zeros((1, 256, 1280), jnp.bfloat16), 1280)
