"""Fused q/k/v (and cross-attn k/v) projection equivalence.

Round-5 perf work (VERDICT r4 #1): SelfAttention concatenates the to_q/to_k/
to_v kernels into one (C, 3·inner) GEMM at apply time; CrossAttention fuses
k/v likewise. These tests pin (a) the parameter tree is unchanged — converter
and kv-hoist compatibility — and (b) the fused outputs match the separate-GEMM
path exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udifftext_tpu.models.attention import CrossAttention, SelfAttention


def test_self_attention_fused_matches_unfused():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 40))
    fused = SelfAttention(heads=4, dim_head=8, attn_impl="xla", fuse_qkv=True)
    plain = SelfAttention(heads=4, dim_head=8, attn_impl="xla", fuse_qkv=False)
    p_fused = fused.init(rng, x)
    p_plain = plain.init(rng, x)

    paths_f = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(p_fused)}
    paths_p = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(p_plain)}
    assert paths_f == paths_p  # converter compatibility

    y_fused = fused.apply(p_fused, x)
    y_plain = plain.apply(p_fused, x)  # same weights through both paths
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain), rtol=1e-6, atol=1e-6)


def test_self_attention_fused_bf16_matches():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 40), jnp.bfloat16)
    fused = SelfAttention(heads=4, dim_head=8, dtype=jnp.bfloat16, attn_impl="xla", fuse_qkv=True)
    plain = SelfAttention(heads=4, dim_head=8, dtype=jnp.bfloat16, attn_impl="xla", fuse_qkv=False)
    params = fused.init(rng, x)
    y_fused = np.asarray(fused.apply(params, x), np.float32)
    y_plain = np.asarray(plain.apply(params, x), np.float32)
    np.testing.assert_allclose(y_fused, y_plain, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("ctx_len", [1, 12])
def test_cross_attention_fused_kv_matches_hoisted(ctx_len):
    """The fused-kv inline path must agree with the hoisted-kv path (which
    projects k and v with separate GEMMs from the same kernels)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 40))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, ctx_len, 16))
    attn = CrossAttention(heads=4, dim_head=8)
    params = attn.init(rng, x, ctx)

    out_inline, map_inline = attn.apply(params, x, ctx, True)

    p = params["params"]
    k = (ctx @ p["to_k"]["Dense_0"]["kernel"]).reshape(2, ctx_len, 4, 8)
    v = (ctx @ p["to_v"]["Dense_0"]["kernel"]).reshape(2, ctx_len, 4, 8)
    out_hoist, map_hoist = attn.apply(params, x, ctx, True, kv=(k, v))

    np.testing.assert_allclose(
        np.asarray(out_inline), np.asarray(out_hoist), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(map_inline), np.asarray(map_hoist), rtol=1e-5, atol=1e-5
    )


def test_block_fused_glue_matches_unfused():
    """The fused-glue branch (fuse_glue='force' → XLA ref fallbacks on CPU)
    must match the plain module composition: identical param tree, outputs
    equal up to the centered-vs-fast LN variance formulation."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 40))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 16))
    kw = dict(heads=4, dim_head=8, t_context_dim=16)
    from udifftext_tpu.models.attention import BasicTransformerBlock

    plain = BasicTransformerBlock(**kw, fuse_glue="off")
    fused = BasicTransformerBlock(**kw, fuse_glue="force")
    p_plain = plain.init(rng, x, ctx)
    p_fused = fused.init(rng, x, ctx)

    paths_p = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(p_plain)}
    paths_f = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(p_fused)}
    assert paths_p == paths_f

    # nonzero to_out so the cross branch contributes
    p = jax.tree.map(lambda a: a + 0.01, p_plain)
    kp = p["params"]["t_attn"]
    k = (ctx @ kp["to_k"]["Dense_0"]["kernel"]).reshape(2, 12, 4, 8)
    v = (ctx @ kp["to_v"]["Dense_0"]["kernel"]).reshape(2, 12, 4, 8)
    kv = {"t": (k, v)}

    out_plain, _ = plain.apply(p, x, ctx, None, False, kv)
    out_fused, _ = fused.apply(p, x, ctx, None, False, kv)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), rtol=2e-3, atol=2e-3
    )


def test_block_fused_glue_capture_falls_back():
    """capture_map=True must keep the XLA cross-attn path (the fused kernel
    does not materialize the softmax map) and still return the map."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 40))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 16))
    from udifftext_tpu.models.attention import BasicTransformerBlock

    fused = BasicTransformerBlock(heads=4, dim_head=8, t_context_dim=16,
                                  fuse_glue="force")
    p = fused.init(rng, x, ctx)
    kp = p["params"]["t_attn"]
    k = (ctx @ kp["to_k"]["Dense_0"]["kernel"]).reshape(2, 12, 4, 8)
    v = (ctx @ kp["to_v"]["Dense_0"]["kernel"]).reshape(2, 12, 4, 8)
    _, t_map = fused.apply(p, x, ctx, None, True, {"t": (k, v)})
    assert t_map is not None and t_map.shape == (2, 4, 128, 12)


def test_cross_attention_fused_branch_keeps_single_token_sigmoid():
    """A 1-token context uses SIGMOID attention (reference attention.py
    single-token branch); the fused ln+kv branch is softmax-only, so L == 1
    must fall back to the plain path — fused-branch args and the manual
    LN -> sigmoid composition must agree (round-5 review finding)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 40))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16))
    attn = CrossAttention(heads=4, dim_head=8)
    params = attn.init(rng, x, ctx)
    p = jax.tree.map(lambda a: a + 0.01, params)  # nonzero to_out

    kp = p["params"]
    k = (ctx @ kp["to_k"]["Dense_0"]["kernel"]).reshape(2, 1, 4, 8)
    v = (ctx @ kp["to_v"]["Dense_0"]["kernel"]).reshape(2, 1, 4, 8)
    ln_scale = jnp.ones((40,)) * 1.1
    ln_bias = jnp.ones((40,)) * 0.05

    # fused-contract call (ln + hoisted kv, no capture): returns x + branch
    out_fused, _ = attn.apply(p, x, ctx, False, kv=(k, v),
                              ln=(ln_scale, ln_bias))

    # manual plain composition with the same LN
    from udifftext_tpu.models.attention import _ln_f32

    xn = _ln_f32(x, ln_scale, ln_bias)
    out_plain, _ = attn.apply(p, xn, ctx, False, kv=(k, v))
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(x + out_plain), rtol=1e-5, atol=1e-5
    )
    # and the result genuinely uses sigmoid: it must differ from a softmax
    # (constant-1.0) weighting of v
    _, m = attn.apply(p, xn, ctx, True, kv=(k, v))
    assert m is not None and float(jnp.max(jnp.abs(m - 1.0))) > 1e-3
