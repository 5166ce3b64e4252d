"""UnifiedUNetModel — the SD2-inpainting denoising backbone, TPU-native.

Parity: sgm/modules/diffusionmodules/openaimodel.py:275-623. Shipped config
(configs/train/textdesign_sd_2.yaml:24-38): 9→4 channels, 320 base, mult
[1,2,4,4], attn at ds {4,2,1}, head_dim 64, linear-in-transformer, depth 1,
t_context_dim 2048, optional ctrl_block (ctrl_channels=0).

Design differences from the torch reference (intentional, TPU-first):
  - NHWC layout; bf16 compute with fp32 GroupNorm (GroupNorm32 parity).
  - Cross-attention maps are returned as an aux dict (keyed by the torch-style
    module path, e.g. "output_blocks.6.1.t_attn") instead of being cached on
    module attributes (openaimodel.py:542-591). This survives jit/scan/grad.
  - The block topology is computed by `unet_plan`, a pure function shared with
    the torch-checkpoint converter so weight remapping can never drift from
    the model structure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import SpatialTransformer
from .layers import (
    Conv1x1,
    Conv3x3,
    Dense,
    GroupNorm32,
    avg_pool_2x,
    matmul_precision,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)

Array = jax.Array
Dtype = Any


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    kind: str  # conv | res | attn | down | up
    in_ch: int = 0
    out_ch: int = 0
    heads: int = 0
    dim_head: int = 0
    ds: int = 0  # downsample factor at this layer (attn only)


@dataclasses.dataclass(frozen=True)
class UNetPlan:
    input_blocks: Tuple[Tuple[LayerSpec, ...], ...]
    middle_block: Tuple[LayerSpec, ...]
    output_blocks: Tuple[Tuple[LayerSpec, ...], ...]
    out_ch: int


def unet_plan(
    model_channels: int,
    num_res_blocks: int,
    attention_resolutions: Sequence[int],
    channel_mult: Sequence[int],
    num_head_channels: int,
    num_heads: int = -1,
) -> UNetPlan:
    """Reproduces the block layout loops of openaimodel.py:382-533."""

    def attn_spec(ch: int, ds: int) -> LayerSpec:
        if num_head_channels == -1:
            heads, dim_head = num_heads, ch // num_heads
        else:
            heads, dim_head = ch // num_head_channels, num_head_channels
        return LayerSpec("attn", ch, ch, heads, dim_head, ds)

    input_blocks: List[Tuple[LayerSpec, ...]] = [
        (LayerSpec("conv", 0, model_channels),)
    ]
    input_chans = [model_channels]
    ch = model_channels
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            layers = [LayerSpec("res", ch, mult * model_channels)]
            ch = mult * model_channels
            if ds in attention_resolutions:
                layers.append(attn_spec(ch, ds))
            input_blocks.append(tuple(layers))
            input_chans.append(ch)
        if level != len(channel_mult) - 1:
            input_blocks.append((LayerSpec("down", ch, ch),))
            input_chans.append(ch)
            ds *= 2

    middle = (
        LayerSpec("res", ch, ch),
        attn_spec(ch, ds),
        LayerSpec("res", ch, ch),
    )

    output_blocks: List[Tuple[LayerSpec, ...]] = []
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            ich = input_chans.pop()
            layers = [LayerSpec("res", ch + ich, model_channels * mult)]
            ch = model_channels * mult
            if ds in attention_resolutions:
                layers.append(attn_spec(ch, ds))
            if level and i == num_res_blocks:
                layers.append(LayerSpec("up", ch, ch))
                ds //= 2
            output_blocks.append(tuple(layers))

    return UNetPlan(
        tuple(input_blocks), middle, tuple(output_blocks), out_ch=model_channels
    )


class ResBlock(nn.Module):
    """Residual block (openaimodel.py:149-268), no up/down variant needed by
    the shipped configs (resblock_updown=False) but supported."""

    out_channels: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        h = GroupNorm32(name="in_norm")(x)
        h = silu(h)
        if self.up:
            h = upsample_nearest_2x(h)
            x = upsample_nearest_2x(x)
        elif self.down:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="in_conv")(h)

        emb_out = Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            name="emb_proj",
        )(silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            h = silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_norm")(h)
            h = silu(h)
        h = Conv3x3(self.out_channels, zero_init=True, dtype=self.dtype, name="out_conv")(h)

        if x.shape[-1] != self.out_channels:
            x = Conv1x1(self.out_channels, dtype=self.dtype, name="skip")(x)
        return x + h


class Downsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Conv3x3(self.out_channels, stride=2, dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample_nearest_2x(x)
        return Conv3x3(self.out_channels, dtype=self.dtype, name="conv")(x)


class UNetModel(nn.Module):
    in_channels: int = 9
    ctrl_channels: int = 0
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64
    num_heads: int = -1
    transformer_depth: int = 1
    t_context_dim: Optional[int] = 2048
    v_context_dim: Optional[int] = None
    adm_in_channels: Optional[int] = None
    use_label: Optional[int] = None
    use_scale_shift_norm: bool = False
    remat: bool = False  # gradient checkpointing (reference util.py:77-203)
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @property
    def plan(self) -> UNetPlan:
        return unet_plan(
            self.model_channels,
            self.num_res_blocks,
            self.attention_resolutions,
            self.channel_mult,
            self.num_head_channels,
            self.num_heads,
        )

    def _make_layer(self, spec: LayerSpec, name: str):
        res_cls, attn_cls = ResBlock, SpatialTransformer
        if self.remat:
            # trade recompute for activation memory in grad (training / AAE)
            res_cls = nn.remat(ResBlock)
            attn_cls = nn.remat(SpatialTransformer, static_argnums=(4,))
        if spec.kind == "conv":
            return Conv3x3(spec.out_ch, dtype=self.dtype, name=name)
        if spec.kind == "res":
            return res_cls(
                spec.out_ch,
                use_scale_shift_norm=self.use_scale_shift_norm,
                dtype=self.dtype,
                name=name,
            )
        if spec.kind == "attn":
            return attn_cls(
                spec.heads,
                spec.dim_head,
                depth=self.transformer_depth,
                t_context_dim=self.t_context_dim,
                v_context_dim=self.v_context_dim,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=name,
            )
        if spec.kind == "down":
            return Downsample(spec.out_ch, dtype=self.dtype, name=name)
        if spec.kind == "up":
            return Upsample(spec.out_ch, dtype=self.dtype, name=name)
        raise ValueError(spec.kind)

    def setup(self):
        plan = self.plan
        time_dim = self.model_channels * 4
        self.time_embed_0 = Dense(time_dim, dtype=self.dtype, name="time_embed_0")
        self.time_embed_2 = Dense(time_dim, dtype=self.dtype, name="time_embed_2")

        if self.use_label is not None:
            self.label_embed_0 = Dense(time_dim, dtype=self.dtype, name="label_embed_0")
            self.label_embed_2 = Dense(time_dim, dtype=self.dtype, name="label_embed_2")

        if self.ctrl_channels > 0:
            # ControlNet-style hint encoder (openaimodel.py:363-380)
            widths = [16, 16, 32, 32, 96, 96, 256]
            convs = []
            for wi, w in enumerate(widths):
                convs.append(Conv3x3(w, dtype=self.dtype, name=f"ctrl_conv_{wi}"))
            convs.append(
                Conv3x3(self.model_channels, zero_init=True, dtype=self.dtype, name="ctrl_conv_out")
            )
            self.ctrl_convs = convs

        self.in_layers = [
            [self._make_layer(s, f"input_blocks_{i}_{j}") for j, s in enumerate(block)]
            for i, block in enumerate(plan.input_blocks)
        ]
        self.mid_layers = [
            self._make_layer(s, f"middle_block_{j}") for j, s in enumerate(plan.middle_block)
        ]
        self.out_layers_ = [
            [self._make_layer(s, f"output_blocks_{i}_{j}") for j, s in enumerate(block)]
            for i, block in enumerate(plan.output_blocks)
        ]

        self.out_norm = GroupNorm32(name="out_norm")
        self.out_conv = Conv3x3(self.out_channels, zero_init=True, dtype=self.dtype, name="out_conv")

    def _apply_block(
        self,
        layers,
        specs,
        prefix: str,
        h: Array,
        emb: Array,
        t_context,
        v_context,
        capture_attn: bool,
        attn_maps: Dict[str, Any],
        ctx_kv: Optional[Dict[str, Any]] = None,
    ) -> Array:
        for j, (layer, spec) in enumerate(zip(layers, specs)):
            if spec.kind == "res":
                h = layer(h, emb)
            elif spec.kind == "attn":
                layer_kv = ctx_kv.get(f"{prefix}.{j}") if ctx_kv else None
                h, maps = layer(h, t_context, v_context, capture_attn, layer_kv)
                if capture_attn:
                    for d, m in enumerate(maps):
                        if m is None:
                            continue
                        key = f"{prefix}.{j}.t_attn" if self.transformer_depth == 1 else f"{prefix}.{j}.blocks_{d}.t_attn"
                        attn_maps[key] = m
            else:
                h = layer(h)
        return h

    def _prepare(self, timesteps, t_context, v_context, y):
        emb_t = timestep_embedding(timesteps, self.model_channels).astype(self.dtype)
        emb = self.time_embed_2(silu(self.time_embed_0(emb_t)))
        if self.use_label is not None:
            assert y is not None
            emb = emb + self.label_embed_2(silu(self.label_embed_0(y.astype(self.dtype))))
        if t_context is not None:
            t_context = t_context.astype(self.dtype)
        if v_context is not None:
            v_context = v_context.astype(self.dtype)
        return emb, t_context, v_context

    def _run_encoder(self, x, emb, t_context, v_context, capture_attn, attn_maps,
                     ctx_kv=None):
        """Input blocks → list of skip activations (hs), hs[-1] feeding the
        middle block."""
        x = x.astype(self.dtype)
        hs = []
        if self.ctrl_channels > 0:
            h, ctrl_h = (
                x[..., : self.in_channels],
                x[..., self.in_channels : self.in_channels + self.ctrl_channels],
            )
        else:
            h = x
        for i, (layers, specs) in enumerate(zip(self.in_layers, self.plan.input_blocks)):
            h = self._apply_block(
                layers, specs, f"input_blocks.{i}", h, emb, t_context, v_context,
                capture_attn, attn_maps, ctx_kv,
            )
            if self.ctrl_channels > 0 and i == 0:
                for conv in self.ctrl_convs[:-1]:
                    ctrl_h = silu(conv(ctrl_h))
                h = h + self.ctrl_convs[-1](ctrl_h)
            hs.append(h)
        return hs

    def _run_decoder(self, hs, emb, t_context, v_context, capture_attn, attn_maps,
                     ctx_kv=None):
        """Middle block + output blocks consuming the skip stack."""
        plan = self.plan
        hs = list(hs)
        h = self._apply_block(
            self.mid_layers, plan.middle_block, "middle_block", hs[-1], emb,
            t_context, v_context, capture_attn, attn_maps, ctx_kv,
        )
        for i, (layers, specs) in enumerate(zip(self.out_layers_, plan.output_blocks)):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._apply_block(
                layers, specs, f"output_blocks.{i}", h, emb, t_context, v_context,
                capture_attn, attn_maps, ctx_kv,
            )
        h = self.out_norm(h)
        h = silu(h)
        h = self.out_conv(h)
        return h.astype(jnp.float32)

    def __call__(
        self,
        x: Array,
        timesteps: Array,
        t_context: Optional[Array] = None,
        v_context: Optional[Array] = None,
        y: Optional[Array] = None,
        capture_attn: bool = False,
        ctx_kv: Optional[Dict[str, Any]] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """x: (B, H, W, in_channels[+ctrl]); timesteps: (B,) → ((B,H,W,out), attn maps).

        ctx_kv: optional hoisted cross-attn K/V projections of the (constant)
        contexts, from `precompute_context_kv` — samplers compute them once
        instead of 16 layers × 2 projections per scan step."""
        emb, t_context, v_context = self._prepare(timesteps, t_context, v_context, y)
        attn_maps: Dict[str, Array] = {}
        hs = self._run_encoder(x, emb, t_context, v_context, capture_attn, attn_maps, ctx_kv)
        h = self._run_decoder(hs, emb, t_context, v_context, capture_attn, attn_maps, ctx_kv)
        return h, attn_maps

    def forward_cached(
        self,
        x: Array,
        timesteps: Array,
        t_context: Optional[Array] = None,
        v_context: Optional[Array] = None,
        y: Optional[Array] = None,
        ctx_kv: Optional[Dict[str, Any]] = None,
    ) -> Tuple[Array, Tuple[Array, ...]]:
        """Full forward that also returns the encoder skip stack, for
        encoder-propagation sampling ("Faster Diffusion", arXiv 2312.09608:
        encoder features vary little across adjacent noise levels). Pair with
        `decode_cached`, which replays middle+decoder against the cached
        stack at a later step."""
        assert self.ctrl_channels == 0, "encoder propagation: ctrl path unsupported"
        emb, t_context, v_context = self._prepare(timesteps, t_context, v_context, y)
        attn_maps: Dict[str, Array] = {}
        hs = self._run_encoder(x, emb, t_context, v_context, False, attn_maps, ctx_kv)
        h = self._run_decoder(hs, emb, t_context, v_context, False, attn_maps, ctx_kv)
        return h, tuple(hs)

    def decode_cached(
        self,
        hs: Tuple[Array, ...],
        timesteps: Array,
        t_context: Optional[Array] = None,
        v_context: Optional[Array] = None,
        y: Optional[Array] = None,
        ctx_kv: Optional[Dict[str, Any]] = None,
    ) -> Array:
        """Middle + output blocks only, consuming a `forward_cached` skip
        stack with the CURRENT timestep embedding (the approximation of
        encoder propagation — input blocks are skipped entirely)."""
        emb, t_context, v_context = self._prepare(timesteps, t_context, v_context, y)
        return self._run_decoder(hs, emb, t_context, v_context, False, {}, ctx_kv)


def precompute_context_kv(
    unet: UNetModel,
    unet_params,
    t_context: Optional[Array] = None,
    v_context: Optional[Array] = None,
) -> Optional[Dict[str, Any]]:
    """Hoist the cross-attn K/V projections of CONSTANT contexts out of a
    sampling scan.

    During sampling the conditioning contexts are fixed per sample while x
    changes per step, yet the reference recomputes every layer's to_k/to_v
    projection of that constant context on all 50 steps (sgm CrossAttention,
    attention.py:152-153) — and XLA's loop-invariant code motion does not
    hoist matmuls out of `lax.scan` bodies. This computes all of them once;
    pass the result as `ctx_kv` to UNetModel.__call__ /
    forward_cached / decode_cached.

    Bit-exact with the in-layer path: same dtype promotion (fp32 kernels cast
    to the model dtype, contexts already cast by `_prepare`) and the same
    matmul precision as models.layers.Dense.
    """
    if t_context is None and v_context is None:
        return None
    p = unet_params["params"] if "params" in unet_params else unet_params
    dtype = unet.dtype
    prec = matmul_precision(dtype)
    tc = t_context.astype(dtype) if t_context is not None else None
    vc = v_context.astype(dtype) if v_context is not None else None

    def project(attn_p, spec: LayerSpec, ctx: Array) -> Tuple[Array, Array]:
        k_kern = attn_p["to_k"]["Dense_0"]["kernel"].astype(dtype)
        v_kern = attn_p["to_v"]["Dense_0"]["kernel"].astype(dtype)
        b, l = ctx.shape[:2]
        k = jnp.matmul(ctx, k_kern, precision=prec).reshape(b, l, spec.heads, spec.dim_head)
        v = jnp.matmul(ctx, v_kern, precision=prec).reshape(b, l, spec.heads, spec.dim_head)
        return k, v

    out: Dict[str, Any] = {}

    def handle(spec: LayerSpec, param_name: str, key: str) -> None:
        if spec.kind != "attn":
            return
        lp = p[param_name]
        per_depth = []
        for d in range(unet.transformer_depth):
            blk = lp[f"blocks_{d}"]
            entry = {}
            if tc is not None and "t_attn" in blk:
                entry["t"] = project(blk["t_attn"], spec, tc)
            if vc is not None and "v_attn" in blk:
                entry["v"] = project(blk["v_attn"], spec, vc)
            per_depth.append(entry)
        out[key] = per_depth

    plan = unet.plan
    for i, block in enumerate(plan.input_blocks):
        for j, spec in enumerate(block):
            handle(spec, f"input_blocks_{i}_{j}", f"input_blocks.{i}.{j}")
    for j, spec in enumerate(plan.middle_block):
        handle(spec, f"middle_block_{j}", f"middle_block.{j}")
    for i, block in enumerate(plan.output_blocks):
        for j, spec in enumerate(block):
            handle(spec, f"output_blocks_{i}_{j}", f"output_blocks.{i}.{j}")
    return out
