"""Jitted end-to-end predict pipeline for test.py / demo.py.

The reference's predict flow (test.py:19-40) is one torch graph; the
TPU-native equivalent must be ONE compiled XLA program — conditioner →
init-noise search → 50-step Euler-EDM scan → VAE decode — or every op
dispatches individually through the device tunnel (150-300 ms per dispatch).
`JittedPredictor` closes over the static sampler settings, strips the batch
to its array fields (static shapes), and reuses the compiled executable
across batches; `n_compiles` counts actual traces so tests can assert the
pipeline compiles exactly once for a fixed shape signature.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# array fields DiffusionEngine.sample consumes; strings (label/txt/name) and
# ragged fields stay host-side
ARRAY_KEYS = ("image", "masked", "mask", "seg", "seg_mask", "label_ids", "r_bbox")


class JittedPredictor:
    """One-compile sampling pipeline with a trace counter."""

    def __init__(
        self,
        engine,
        num_steps: int = 50,
        cfg_scale: float = 5.0,
        noise_iters: int = 10,
        aae_enabled: bool = False,
        detailed: bool = False,
        mesh=None,
        encprop_interval: int = 0,
        ckpt_id: Optional[str] = None,
        min_quality_psnr: Optional[float] = None,
        noise_search_batched: bool = False,
        noise_search_max_rows: int = 128,
    ):
        self.engine = engine
        self.num_steps = int(num_steps)
        self.cfg_scale = float(cfg_scale)
        self.noise_iters = int(noise_iters)
        # exact candidate-batched init-noise search (engine.get_init_noise):
        # 2 UNet evals at batch noise_iters*B instead of 2*noise_iters at B —
        # the latency-oriented choice for small serving batches. The choice is
        # made PER TRACE (each batch-shape signature compiles its own
        # executable): batched only while noise_iters*B stays within
        # `noise_search_max_rows` — beyond that the stacked candidates' UNet
        # batch (2*rows after CFG doubling, plus captured attention maps)
        # outgrows HBM for no latency benefit (the search is a wash at
        # saturated batch; see engine.get_init_noise). The default 128 keeps
        # the measured round-4 serving points (bucket 1 → 10 rows, bucket 8 →
        # 80 rows) batched and drops bucket 16 (160 rows) to the sequential
        # scan, whose memory is independent of noise_iters.
        self.noise_search_batched = bool(noise_search_batched)
        self.noise_search_max_rows = int(noise_search_max_rows)
        self.aae_enabled = bool(aae_enabled)
        self.detailed = bool(detailed)
        self.encprop_interval = int(encprop_interval)
        if self.encprop_interval > 1:
            # approximate sampling is opt-in AND gated on recorded quality
            # evidence for the loaded checkpoint (utils/encprop_gate.py):
            # refuses with a known ckpt_id and no report; warns loudly once
            # when the checkpoint identity is unknown (fresh init)
            from .utils.encprop_gate import DEFAULT_MIN_PSNR, gate_encprop

            gate_encprop(
                ckpt_id,
                self.encprop_interval,
                DEFAULT_MIN_PSNR if min_quality_psnr is None else float(min_quality_psnr),
                # quality evidence must match the sampler configuration it
                # gates — encprop PSNR at 4 steps says nothing about 50
                settings={"steps": self.num_steps, "scale": self.cfg_scale},
            )
        self.mesh = mesh
        self.n_compiles = 0
        # generic embedder graphs read extra array keys (e.g. a
        # ClassEmbedder's class ids) — keep them in the jitted batch
        gc = getattr(engine, "general_conditioner", None)
        extra = tuple(e.input_key for e in gc.embedders) if gc is not None else ()
        self.array_keys = tuple(dict.fromkeys(ARRAY_KEYS + extra))

        def raw(params, arr_batch, rng):
            # runs only while tracing — counts compilations per shape signature
            self.n_compiles += 1
            b = next(iter(arr_batch.values())).shape[0]
            batched = (
                self.noise_search_batched
                and self.noise_iters * b <= self.noise_search_max_rows
            )
            # uint8 wire format (serving): over a tunneled device link the
            # host->device transfer of fp32 image tensors dominates a batched
            # dispatch (~170 MB/group at bucket 16, measured ~6 s of the
            # 19.5 s model call — scripts/serve_bench.py round 5). A uint8
            # `image` opts into device-side preprocessing: normalization,
            # mask binarization, and `masked` synthesis all run INSIDE the
            # compiled program (bit-identical math to InpaintService's host
            # path), and the decoded images return as uint8 (the clip*255
            # serving does on the host anyway) — 7x less wire traffic each
            # way. Float batches (test.py / demo.py) are untouched.
            uint8_in = (
                "image" in arr_batch and arr_batch["image"].dtype == jnp.uint8
            )
            if uint8_in:
                arr_batch = dict(arr_batch)
                img = arr_batch["image"].astype(jnp.float32) / 127.5 - 1.0
                mask = (arr_batch["mask"] > 0).astype(jnp.float32)
                if mask.ndim == img.ndim - 1:
                    mask = mask[..., None]
                arr_batch["image"] = img
                arr_batch["mask"] = mask
                arr_batch["masked"] = img * (1.0 - mask)
            images, aux = engine.sample(
                params,
                arr_batch,
                rng,
                num_steps=self.num_steps,
                cfg_scale=self.cfg_scale,
                noise_iters=self.noise_iters,
                aae_enabled=self.aae_enabled,
                detailed=self.detailed,
                encprop_interval=self.encprop_interval,
                encprop_pregated=True,  # gated once at predictor construction
                noise_search_batched=batched,
            )
            if uint8_in:
                images = (jnp.clip(images, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return images, aux

        if mesh is not None:
            # multi-chip eval (reference scope is single-GPU test.py): batch
            # sharded over the `data` mesh axis, params replicated; GSPMD
            # inserts the collectives exactly as in the train step
            from .parallel.mesh import replicated_sharding, shard_batch_sharding

            rep = replicated_sharding(mesh)
            dat = shard_batch_sharding(mesh)
            self._jitted = jax.jit(raw, in_shardings=(rep, dat, rep))
        else:
            self._jitted = jax.jit(raw)

    def array_batch(self, batch: Dict[str, Any]) -> Dict[str, jax.Array]:
        out = {}
        for k in self.array_keys:
            if k in batch:
                v = batch[k]
                if isinstance(v, np.ndarray) and v.dtype == object:
                    continue
                out[k] = jnp.asarray(v)
        return out

    def __call__(
        self, params, batch: Dict[str, Any], rng: jax.Array
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        arr_batch = self.array_batch(batch)
        if not arr_batch:
            raise ValueError(
                f"batch carries none of the predictor's array keys "
                f"{self.array_keys} — got {sorted(batch)}"
            )
        if "image" in arr_batch and arr_batch["image"].dtype == jnp.uint8:
            # uint8 wire format (serving): validate its contract HERE with a
            # clear message rather than a KeyError inside the jit trace
            if "mask" not in arr_batch:
                raise ValueError(
                    "uint8 wire format: a uint8 'image' requires a 'mask' — "
                    "normalization and `masked` synthesis run on-device from "
                    "(image, mask); send float arrays for the preprocessed "
                    "path"
                )
            if "masked" in arr_batch:
                raise ValueError(
                    "uint8 wire format synthesizes 'masked' on-device from "
                    "image*(1-mask); drop the 'masked' key (or send float "
                    "image/mask/masked for the preprocessed path)"
                )
        if self.mesh is not None:
            n_data = self.mesh.shape.get("data", 1)
            b = next(iter(arr_batch.values())).shape[0]
            if b % n_data != 0:
                raise ValueError(
                    f"eval batch size {b} must be divisible by the data-mesh "
                    f"axis ({n_data} devices) — raise batch_size in the test "
                    f"config or disable eval_data_parallel"
                )
        return self._jitted(params, arr_batch, rng)
