"""DiffusionEngine — the system glue (training + sampling), TPU-native.

Parity: sgm/models/diffusion.py (DiffusionEngine), wrappers.py:23-35
(OpenAIWrapper channel concat), sampling.py:218-420 (EulerEDMSampler with
init-noise search and attend-and-excite).

Design: the engine is a thin immutable struct of modules + schedule configs;
parameters live in an explicit pytree {unet, vae, label_encoder} passed into
pure jitted functions. Sampling is a `lax.scan`; AAE's inner refinement is a
`lax.while_loop` of `jax.grad` steps on the min-local attention loss — the
JAX-native form of the reference's autograd hack (sampling.py:238-252).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .conditioning import Conditioner
from .diffusion import loss as L
from .diffusion import sampling as SP
from .diffusion.denoiser import DiscreteDenoiser
from .diffusion.guiders import VanillaCFG
from .diffusion.schedules import DiscreteSampling, LegacyDDPMDiscretization, append_dims
from .models.label_encoder import LabelEncoder
from .models.unet import UNetModel
from .models.vae import AutoencoderKL, DiagonalGaussian

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DiffusionEngine:
    unet: UNetModel
    vae: AutoencoderKL
    label_encoder: LabelEncoder
    denoiser: DiscreteDenoiser = DiscreteDenoiser()
    discretization: LegacyDDPMDiscretization = LegacyDDPMDiscretization()
    sigma_sampler: DiscreteSampling = DiscreteSampling()
    loss_cfg: L.FullLossConfig = L.FullLossConfig()
    scale_factor: float = 0.18215
    ucg_rate_label: float = 0.1
    mask_multiplier: float = 0.125
    latent_factor: int = 8
    ocr_predictor: Optional[Any] = None  # ParseqPredictor when ocr_enabled
    # set for non-shipped embedder graphs (GeneralConditioner parity,
    # modules.py:105-217); None → the specialized fused Conditioner below
    general_conditioner: Optional[Any] = None

    @property
    def conditioner(self) -> Conditioner:
        return Conditioner(
            self.label_encoder, self.vae,
            scale_factor=self.scale_factor,
            ucg_rate_label=self.ucg_rate_label,
            mask_multiplier=self.mask_multiplier,
        )

    # -- first stage (reference diffusion.py:124-136) ------------------------

    def encode_first_stage(self, params, x: Array, rng: Optional[jax.Array] = None) -> Array:
        moments = self.vae.apply(params["vae"], x, method=AutoencoderKL.encode_moments)
        post = DiagonalGaussian(moments)
        z = post.sample(rng) if rng is not None else post.mode()
        return self.scale_factor * z

    def decode_first_stage(self, params, z: Array) -> Array:
        return self.vae.apply(params["vae"], z / self.scale_factor, method=AutoencoderKL.decode)

    # -- network wrapper (OpenAIWrapper parity) ------------------------------

    def network(self, params, capture_attn: bool = False, method=None, ctx_kv=None):
        """OpenAIWrapper closure (wrappers.py:23-35). `method` selects an
        alternative UNet entry point (e.g. UNetModel.forward_cached for
        encoder propagation); such methods take no capture_attn argument.
        `ctx_kv` carries hoisted cross-attn K/V projections when the cond is
        constant across calls (models/unet.precompute_context_kv)."""
        def net(x: Array, c_noise: Array, cond: Dict[str, Any]):
            xin = x
            if "concat" in cond:
                xin = jnp.concatenate(
                    [x, cond["concat"].astype(x.dtype)], axis=-1
                )
            kwargs = {} if method is not None else {"capture_attn": capture_attn}
            return self.unet.apply(
                params["unet"], xin, c_noise,
                cond.get("t_crossattn"), cond.get("v_crossattn"), cond.get("vector"),
                method=method, ctx_kv=ctx_kv, **kwargs,
            )
        return net

    def _hoisted_kv(self, params, cond: Dict[str, Any]):
        """Cross-attn K/V of a cond dict that stays constant across a scan."""
        from .models.unet import precompute_context_kv

        return precompute_context_kv(
            self.unet, params["unet"],
            cond.get("t_crossattn"), cond.get("v_crossattn"),
        )

    # -- training loss (reference diffusion.py:138-149 + loss.py) -----------

    def loss(self, params, batch: Dict[str, Array], rng: jax.Array):
        rng_enc, rng_cond, rng_loss = jax.random.split(rng, 3)
        x = self.encode_first_stage(params, batch["image"], rng_enc)
        if self.general_conditioner is not None:
            cond = self.general_conditioner(params, batch, rng=rng_cond, train=True)
        else:
            cond = self.conditioner(
                params["label_encoder"], params["vae"], batch, rng=rng_cond, train=True
            )
        network = self.network(params, capture_attn=True)

        ocr_loss_fn = None
        if self.loss_cfg.ocr_enabled and self.ocr_predictor is not None and "parseq" in params:
            def ocr_loss_fn(model_output, b):
                # decode the denoised latent and score the bbox crop with the
                # frozen recognizer (reference loss.py:178-190)
                decoded = self.decode_first_stage(params, model_output)
                return self.ocr_predictor.calc_loss(
                    params["parseq"], decoded, b["r_bbox"], b["parseq_label_ids"]
                )

        return L.full_loss(
            self.loss_cfg, self.denoiser, network, self.sigma_sampler,
            cond, x, batch, rng_loss, ocr_loss_fn=ocr_loss_fn,
        )

    # -- sampling -------------------------------------------------------------

    def conditionings(self, params, batch, rng=None, force_uc_zero_label=True):
        if self.general_conditioner is not None:
            return self.general_conditioner.get_unconditional_conditioning(
                params, batch, rng=rng,
                force_uc_zero_keys=("label_ids",) if force_uc_zero_label else (),
            )
        return self.conditioner.get_unconditional_conditioning(
            params["label_encoder"], params["vae"], batch,
            rng=rng, force_uc_zero_label=force_uc_zero_label,
        )

    def make_denoise_fn(self, params, c, uc, cfg_scale: float, capture_attn: bool = False):
        guider = VanillaCFG(cfg_scale)
        # hoisted loop invariants: the CFG-doubled cond dict and the UNet's
        # cross-attn K/V projections of it are constant across sampling steps
        # — computed once here instead of 50× inside the scan (the reference
        # recomputes both per step, sampling.py:264-322 + attention.py:152)
        c_in = guider.prepare_cond(c, uc)
        network = self.network(
            params, capture_attn=capture_attn, ctx_kv=self._hoisted_kv(params, c_in)
        )

        if not capture_attn:
            def denoise(x, sigma):
                x_in = jnp.concatenate([x, x], axis=0)
                s_in = jnp.concatenate([sigma, sigma], axis=0)
                d, _ = self.denoiser(network, x_in, s_in, c_in)
                return guider(d, sigma)
            return denoise

        def denoise_aux(x, sigma):
            x_in = jnp.concatenate([x, x], axis=0)
            s_in = jnp.concatenate([sigma, sigma], axis=0)
            d, aux = self.denoiser(network, x_in, s_in, c_in)
            # loss consumers read the conditional half (sampling.py:341)
            aux_c = {k: v[v.shape[0] // 2 :] for k, v in aux.items()}
            return guider(d, sigma), aux_c

        return denoise_aux

    def make_denoise_fns_encprop(self, params, c, uc, cfg_scale: float):
        """Key/reuse denoise pair for encoder-propagation sampling (opt-in
        APPROXIMATE mode, arXiv 2312.09608; see
        diffusion/sampling.sample_euler_edm_encprop). The cache is the UNet's
        CFG-doubled encoder skip stack, threaded through the denoiser's aux
        channel on key steps."""
        from .models.unet import UNetModel

        guider = VanillaCFG(cfg_scale)
        c_in = guider.prepare_cond(c, uc)
        ctx_kv = self._hoisted_kv(params, c_in)
        net_full = self.network(params, method=UNetModel.forward_cached, ctx_kv=ctx_kv)

        def denoise_full(x, sigma):
            x_in = jnp.concatenate([x, x], axis=0)
            s_in = jnp.concatenate([sigma, sigma], axis=0)
            d, hs = self.denoiser(net_full, x_in, s_in, c_in)
            return guider(d, sigma), hs

        def denoise_reuse(x, sigma, hs):
            x_in = jnp.concatenate([x, x], axis=0)
            s_in = jnp.concatenate([sigma, sigma], axis=0)

            def net(_xin, c_noise, cond):
                out = self.unet.apply(
                    params["unet"], hs, c_noise,
                    cond.get("t_crossattn"), cond.get("v_crossattn"), cond.get("vector"),
                    method=UNetModel.decode_cached, ctx_kv=ctx_kv,
                )
                return out, None

            d, _ = self.denoiser(net, x_in, s_in, c_in)
            return guider(d, sigma)

        return denoise_full, denoise_reuse

    def get_init_noise(
        self,
        params,
        c,
        uc,
        batch: Dict[str, Array],
        rng: jax.Array,
        shape: Tuple[int, ...],
        cfg_scale: float = 5.0,
        noise_iters: int = 10,
        candidate_batched: bool = False,
    ) -> Array:
        """Init-noise search (sampling.py:264-322): `noise_iters` candidates
        each scored by the min-local attention loss after a 2-step rollout;
        the best randn wins. Vectorized as a scan over candidates.

        candidate_batched=True runs the SAME search with all candidates
        stacked on the batch axis: 2 sequential UNet evals at batch
        `noise_iters*B` instead of `2*noise_iters` evals at batch B. The
        candidates are independent rows through the whole UNet (GroupNorm/
        attention/LayerNorm all normalize per sample), so the math is
        identical up to float reassociation in XLA's reductions; scores can
        differ at ~1e-6, which only matters for near-exact ties (both paths
        keep the FIRST minimum). It trades serial depth for batch width —
        a large latency win at small B (serving single requests), a wash at
        saturated batch. Memory scales with noise_iters*B; keep the default
        sequential path for big-batch offline eval."""
        if noise_iters <= 0:
            return jax.random.normal(rng, shape)

        sigmas = jnp.asarray(self.discretization(2, do_append_zero=True))
        kernel = jnp.asarray(self.loss_cfg.kernel)
        mask, seg_mask = batch["mask"], batch["seg_mask"]

        if candidate_batched:
            k, b = noise_iters, shape[0]
            tile = lambda t: jnp.concatenate([t] * k, axis=0)  # noqa: E731
            denoise = self.make_denoise_fn(
                params, jax.tree.map(tile, c), jax.tree.map(tile, uc),
                cfg_scale, capture_attn=True,
            )
            keys = jax.random.split(rng, k)
            # same per-candidate draws as the sequential scan (same split)
            randn_all = jax.vmap(lambda kk: jax.random.normal(kk, shape))(keys)
            x = SP.init_latent(randn_all.reshape((k * b,) + shape[1:]), sigmas)
            mask_t, seg_mask_t = tile(mask), tile(seg_mask)
            loss = None
            for i in range(2):
                sigma = jnp.full((k * b,), sigmas[i], x.dtype)
                next_sigma = jnp.full((k * b,), sigmas[i + 1], x.dtype)
                denoised, aux = denoise(x, sigma)
                loss = L.min_local_loss(
                    aux, mask_t, seg_mask_t, kernel, self.loss_cfg.min_attn_size
                )
                d = SP.to_d(x, sigma, denoised)
                x = x + append_dims(next_sigma - sigma, x.ndim) * d
            scores = jnp.sum(loss.reshape(k, b), axis=1)
            return randn_all[jnp.argmin(scores)]

        denoise = self.make_denoise_fn(params, c, uc, cfg_scale, capture_attn=True)

        def score(randn):
            x = SP.init_latent(randn, sigmas)
            # a candidate is scored by the LAST rollout step's min-local loss
            # only (reference local_losses[-1], sampling.py:301-318) — the
            # earlier step's loss is intentionally discarded
            for i in range(2):
                sigma = jnp.full((shape[0],), sigmas[i], x.dtype)
                next_sigma = jnp.full((shape[0],), sigmas[i + 1], x.dtype)
                denoised, aux = denoise(x, sigma)
                loss = L.min_local_loss(
                    aux, mask, seg_mask, kernel, self.loss_cfg.min_attn_size
                )
                d = SP.to_d(x, sigma, denoised)
                x = x + append_dims(next_sigma - sigma, x.ndim) * d
            return jnp.sum(loss)

        def step(carry, key):
            best_randn, best_loss = carry
            randn = jax.random.normal(key, shape)
            s = score(randn)
            better = s < best_loss
            best_randn = jnp.where(better, randn, best_randn)
            best_loss = jnp.where(better, s, best_loss)
            return (best_randn, best_loss), None

        keys = jax.random.split(rng, noise_iters)
        init = (jnp.zeros(shape), jnp.asarray(jnp.inf))
        (best, _), _ = jax.lax.scan(step, init, keys)
        return best

    def _aae_update(
        self, params, c, batch, x, sigma, alpha, iter_enabled, thres, max_iter=20,
        ctx_kv=None,
    ):
        """Attend-and-excite (sampling.py:233-252): gradient-descend x on the
        min-local loss through the raw (unguided) network. c is constant
        across the refinement while_loop AND the outer sampling scan, so the
        caller precomputes its K/V projections once (`ctx_kv`)."""
        network = self.network(
            params, capture_attn=True,
            ctx_kv=self._hoisted_kv(params, c) if ctx_kv is None else ctx_kv,
        )
        kernel = jnp.asarray(self.loss_cfg.kernel)
        mask, seg_mask = batch["mask"], batch["seg_mask"]

        sigma_q = self.denoiser.quantize_sigma(sigma)
        sigma_b = append_dims(sigma_q, x.ndim)
        _, _, _c_in, c_noise = self.denoiser.scale(sigma_b)
        c_noise = self.denoiser.quantize_c_noise(c_noise.reshape(sigma.shape))

        def loss_fn(xx):
            # the reference feeds RAW x to the wrapped UNet here (sampling.py
            # :243 model.model(x, c_noise, cond)) — NOT the c_in-scaled input
            # the denoiser would use; the AAE alpha/threshold calibration
            # assumes that loss surface
            _, aux = network(xx, c_noise, c)
            ll = L.min_local_loss(aux, mask, seg_mask, kernel, self.loss_cfg.min_attn_size)
            return jnp.sum(ll)

        grad_fn = jax.value_and_grad(loss_fn)

        # first mandatory update (the torch loop always runs once)
        val, g = grad_fn(x)
        x = x - alpha * g

        def cond_fn(state):
            xx, val, it = state
            return jnp.logical_and(
                iter_enabled, jnp.logical_and(val > thres, it <= max_iter)
            )

        def body_fn(state):
            xx, _, it = state
            val, g = grad_fn(xx)
            return (xx - alpha * g, val, it + 1)

        x, _, _ = jax.lax.while_loop(cond_fn, body_fn, (x, val, jnp.asarray(1)))
        return x

    def sample(
        self,
        params,
        batch: Dict[str, Array],
        rng: jax.Array,
        num_steps: int = 50,
        cfg_scale: float = 5.0,
        noise_iters: int = 10,
        aae_enabled: bool = False,
        detailed: bool = False,
        latent_hw: Optional[Tuple[int, int]] = None,
        return_latents: bool = False,
        encprop_interval: int = 0,
        ckpt_id: Optional[str] = None,
        encprop_pregated: bool = False,
        noise_search_batched: bool = False,
    ):
        """Full text-inpainting sampling (test.py predict() semantics).

        noise_search_batched=True evaluates the init-noise search's
        candidates stacked on the batch axis (exact same math, 2 UNet evals
        instead of 2*noise_iters — see get_init_noise); big latency win at
        small batch, memory scales with noise_iters*B.

        Returns decoded images in [0, 1] (B, H, W, 3); with detailed=True also
        the middle-step attention maps.

        encprop_interval > 1 opts into APPROXIMATE encoder-propagation
        sampling for the main scan (full UNet every k-th step only — arXiv
        2312.09608); ignored when aae_enabled/detailed need per-step
        attention maps. NOT the reference sampler — the request is gated on
        recorded quality evidence (utils/encprop_gate.py): refused when
        `ckpt_id` is known but has no passing report, warned-once when the
        checkpoint identity is unknown. Callers that already gated (e.g.
        JittedPredictor at construction) pass encprop_pregated=True.
        """
        if encprop_interval > 1 and not encprop_pregated and not (
            aae_enabled or detailed
        ):
            from .utils.encprop_gate import gate_encprop

            gate_encprop(ckpt_id, int(encprop_interval),
                         settings={"steps": int(num_steps), "scale": float(cfg_scale)})
        b = batch["image"].shape[0] if "image" in batch else batch["masked"].shape[0]
        if latent_hw is None:
            h, w = batch["masked"].shape[1:3]
            latent_hw = (h // self.latent_factor, w // self.latent_factor)
        shape = (b, latent_hw[0], latent_hw[1], 4)

        rng_cond, rng_noise = jax.random.split(rng)
        c, uc = self.conditionings(params, batch, rng=rng_cond)

        x0 = self.get_init_noise(
            params, c, uc, batch, rng_noise, shape, cfg_scale, noise_iters,
            candidate_batched=noise_search_batched,
        )
        sigmas = jnp.asarray(self.discretization(num_steps, do_append_zero=True))
        x = SP.init_latent(x0, sigmas)

        if not (aae_enabled or detailed):
            if encprop_interval > 1:
                df, dr = self.make_denoise_fns_encprop(params, c, uc, cfg_scale)
                key_mask = jnp.asarray(SP.uniform_key_mask(num_steps, encprop_interval))
                z = SP.sample_euler_edm_encprop(df, dr, x, sigmas, key_mask)
            else:
                denoise = self.make_denoise_fn(params, c, uc, cfg_scale)
                z = SP.sample_euler_edm(denoise, x, sigmas)
            aux_out = {}
        else:
            z, aux_out, per_step = self._sample_guided(
                params, c, uc, batch, x, sigmas, cfg_scale, aae_enabled, detailed
            )
            if per_step is not None:
                # per-step observability (reference sampling.py:336-337,410-418):
                # decoded intermediates of sample 0 for the GIF + min-local losses.
                # Decoding happens once, batched over steps, after the scan —
                # not per-step inside it — so the hot loop stays a pure scan.
                inters = self.decode_first_stage(params, per_step["inter"])
                aux_out["inters"] = jnp.clip((inters + 1.0) / 2.0, 0.0, 1.0)
                aux_out["local_losses"] = per_step["local_loss"]

        if return_latents:
            return z, aux_out
        img = self.decode_first_stage(params, z)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0), aux_out

    def _sample_guided(
        self, params, c, uc, batch, x, sigmas, cfg_scale, aae_enabled, detailed
    ):
        """Euler loop with AAE latent refinement and/or middle-step attention
        map capture (sampling.py:355-420). With aae_enabled additionally emits
        per-step ys: sample-0 denoised latents (GIF frames) and the min-local
        loss of the conditional half (sampling.py:326-345 save_inter/save_loss)."""
        num_sigmas = sigmas.shape[0]
        bsz = x.shape[0]
        denoise = self.make_denoise_fn(params, c, uc, cfg_scale, capture_attn=True)
        kernel = jnp.asarray(self.loss_cfg.kernel)
        # AAE's raw-network kv, hoisted out of the sampling scan (c is
        # constant; computing it inside `step` would re-project per step)
        aae_kv = self._hoisted_kv(params, c) if aae_enabled else None

        scales = np.linspace(1.0, 0.0, num_sigmas)
        alphas = 20.0 * np.sqrt(scales)[:-1]
        iter_lst = set(np.linspace(5, 25, 6, dtype=np.int32).tolist())
        thres_lst = np.linspace(-0.5, -0.8, 6)
        iter_en = np.zeros(num_sigmas - 1, bool)
        thres = np.zeros(num_sigmas - 1, np.float32)
        for pos, i in enumerate(sorted(iter_lst)):
            if i < num_sigmas - 1:
                iter_en[i] = True
                thres[i] = thres_lst[pos]
        mid = (num_sigmas - 1) // 2

        # template for the captured middle-step maps
        map_shapes = self._attn_map_shapes(bsz, (x.shape[1], x.shape[2]), c)

        def step(carry, xs):
            x, saved = carry
            i, alpha, ien, th = xs
            sigma = jnp.full((bsz,), sigmas[i], x.dtype)
            next_sigma = jnp.full((bsz,), sigmas[i + 1], x.dtype)
            if aae_enabled:
                x = self._aae_update(
                    params, c, batch, x, sigma, alpha, ien, th, ctx_kv=aae_kv
                )
            denoised, aux = denoise(x, sigma)
            if detailed:
                is_mid = i == mid
                saved = {
                    k: jnp.where(is_mid, aux[k].astype(jnp.float32), saved[k])
                    for k in saved
                }
            ys = None
            if aae_enabled:
                ys = {
                    "inter": denoised[0].astype(jnp.float32),
                    "local_loss": L.min_local_loss(
                        aux, batch["mask"], batch["seg_mask"], kernel,
                        self.loss_cfg.min_attn_size,
                    ),
                }
            d = SP.to_d(x, sigma, denoised)
            x = x + append_dims(next_sigma - sigma, x.ndim) * d
            return (x, saved), ys

        saved0 = {k: jnp.zeros(s, jnp.float32) for k, s in map_shapes.items()} if detailed else {}
        xs = (
            jnp.arange(num_sigmas - 1),
            jnp.asarray(alphas, jnp.float32),
            jnp.asarray(iter_en),
            jnp.asarray(thres, jnp.float32),
        )
        (x, saved), per_step = jax.lax.scan(step, (x, saved0), xs)
        return x, saved, per_step

    def log_images(
        self,
        params,
        batch: Dict[str, Array],
        rng: jax.Array,
        n: int = 8,
        sample: bool = True,
        num_steps: int = 50,
        cfg_scale: float = 5.0,
    ) -> Dict[str, Array]:
        """Observability dict (reference diffusion.py:280-335): inputs,
        VAE reconstructions, and fresh samples for the first n batch items."""
        small = {k: v[:n] for k, v in batch.items()}
        x = small["image"]
        rng_enc, rng_samp = jax.random.split(rng)
        z = self.encode_first_stage(params, x, rng_enc)
        log = {
            "inputs": x,
            "reconstructions": self.decode_first_stage(params, z),
        }
        if sample:
            imgs, _ = self.sample(
                params, small, rng_samp, num_steps=num_steps,
                cfg_scale=cfg_scale, noise_iters=0,
            )
            log["samples"] = imgs * 2.0 - 1.0
        return log

    def _attn_map_shapes(
        self, b: int, latent_hw: Tuple[int, int], cond
    ) -> Dict[str, Tuple[int, ...]]:
        """Static shapes of the t_attn maps the UNet emits (for scan carries).
        Handles rectangular latents (engine.sample(latent_hw=...))."""
        plan = self.unet.plan
        l = cond["t_crossattn"].shape[1]
        shapes = {}

        # derive sizes by replaying the plan's downsampling structure
        ds_sizes = {}
        cur_h, cur_w = latent_hw
        ds = 1
        ds_sizes[ds] = cur_h * cur_w
        for _ in range(len(self.unet.channel_mult) - 1):
            ds *= 2
            cur_h //= 2
            cur_w //= 2
            ds_sizes[ds] = cur_h * cur_w

        for i, block in enumerate(plan.input_blocks):
            for j, spec in enumerate(block):
                if spec.kind == "attn":
                    n = ds_sizes[spec.ds]
                    shapes[f"input_blocks.{i}.{j}.t_attn"] = (b, spec.heads, n, l)
        for j, spec in enumerate(plan.middle_block):
            if spec.kind == "attn":
                n = ds_sizes[spec.ds]
                shapes[f"middle_block.{j}.t_attn"] = (b, spec.heads, n, l)
        for i, block in enumerate(plan.output_blocks):
            for j, spec in enumerate(block):
                if spec.kind == "attn":
                    n = ds_sizes[spec.ds]
                    shapes[f"output_blocks.{i}.{j}.t_attn"] = (b, spec.heads, n, l)
        return shapes
