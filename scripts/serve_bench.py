"""Serving benchmark: micro-batcher throughput + latency on the real chip.

The serving stack (udifftext_tpu/serving.py + scripts/serve.py) exists for
throughput economics — coalescing concurrent requests into one fixed-shape
TPU dispatch — so it needs measured numbers, not just correctness tests
(round-3 verdict item 7). Two workloads:

1. saturated: enqueue `--batches x max_batch` requests at once; the
   dispatcher drains full groups back-to-back. Reports samples/s — the
   server's capacity ceiling (compare with bench.py's raw pipeline number:
   the delta is the serving stack's overhead).
2. low-QPS latency: submit requests one at a time at `--qps` (default 0.5);
   each rides a group of 1 padded to the smallest configured bucket. Reports
   p50/p95 end-to-end latency (request-submit -> result), the number an
   interactive caller sees.

The reference analog is the one-request Gradio path
(/root/reference/demo.py:39-116), which recompiles nothing but serves one
request per model call; this stack serves max_batch per call at the same
per-call cost.

Usage:
  python scripts/serve_bench.py [--max-batch 8] [--steps 50]
      [--noise-iters 10] [--batches 4] [--qps 0.5] [--latency-requests 8]

Prints one JSON line with both measurements. Zero-weight params (no
published checkpoints in the image) — compute is identical to real weights.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_service(max_batch: int, steps: int, noise_iters: int, max_delay_ms: float,
                  buckets=None, noise_search_batched: bool = False, dp: int = 1,
                  pipeline_depth: int = 1):
    import jax
    import jax.numpy as jnp

    from bench import cast_params_bf16
    from udifftext_tpu.builders import build_diffusion_engine
    from udifftext_tpu.config import load_config
    from udifftext_tpu.loading import init_engine_params
    from udifftext_tpu.predict import JittedPredictor
    from udifftext_tpu.serving import InpaintService

    model_cfg = load_config("./configs/test/textdesign_sd_2.yaml")
    bundle = build_diffusion_engine(model_cfg["model"]["params"], unet_dtype=jnp.bfloat16)
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: init_engine_params(bundle, jax.random.PRNGKey(0))),
    )
    params["unet"] = cast_params_bf16(params["unet"])

    mesh = None
    if dp > 1:
        from udifftext_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=dp, devices=jax.devices()[:dp])
    predictor = JittedPredictor(
        bundle.engine, num_steps=steps, cfg_scale=5.0, noise_iters=noise_iters,
        noise_search_batched=noise_search_batched, mesh=mesh,
    )
    base_key = jax.random.PRNGKey(0)

    def run(arr_batch, key: int):
        # returns the jax.Array LAZILY (dispatch is async) so a pipelined
        # service can overlap the next group's assembly/transfer with this
        # group's compute; InpaintService materializes in its finalize stage
        images, _ = predictor(params, arr_batch, jax.random.fold_in(base_key, key))
        return images

    def make(delay_ms: float) -> InpaintService:
        # services share `run` (one JittedPredictor -> one executable per
        # bucket); only the coalescing deadline differs
        return InpaintService(run, max_batch=max_batch, max_delay_ms=delay_ms,
                              batch_buckets=buckets, dp=dp,
                              pipeline_depth=pipeline_depth)

    return make(max_delay_ms), make


def _request():
    from udifftext_tpu.serving import InpaintRequest

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (512, 512, 3), np.uint8)
    mask = np.zeros((512, 512), np.uint8)
    mask[128:384, 128:384] = 1
    return InpaintRequest(image=img, mask=mask, text="bench")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--noise-iters", type=int, default=10)
    p.add_argument("--batches", type=int, default=4,
                   help="full groups for the saturated measurement")
    p.add_argument("--qps", type=float, default=0.5)
    p.add_argument("--latency-requests", type=int, default=8)
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel serving degree (shard each dispatched "
                        "batch over this many chips; buckets must divide)")
    p.add_argument("--max-delay-ms", type=float, default=50.0)
    p.add_argument("--buckets", type=lambda s: [int(b) for b in s.split(",")],
                   default=None,
                   help="batch buckets (largest == max-batch), e.g. '1,8' — "
                        "lone latency requests then run at bucket 1")
    p.add_argument("--noise-search-batched", action="store_true",
                   help="candidate-batched (exact) init-noise search")
    p.add_argument("--pipeline", type=int, default=1,
                   help="pipeline depth: >1 overlaps the next group's host "
                        "assembly + wire transfer with the chip's compute "
                        "(InpaintService pipeline_depth)")
    p.add_argument("--saturated-delay-ms", type=float, default=2000.0,
                   help="coalescing deadline for the saturated phase only — "
                        "long enough that the submit loop fills full groups "
                        "(the latency phase keeps --max-delay-ms)")
    args = p.parse_args()

    from udifftext_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()
    service, make_service = build_service(
        args.max_batch, args.steps, args.noise_iters, args.max_delay_ms,
        buckets=args.buckets, noise_search_batched=args.noise_search_batched,
        dp=args.dp, pipeline_depth=args.pipeline,
    )
    req = _request()

    # warmup: compile every bucket's executable once
    t0 = time.perf_counter()
    service.warmup()
    compile_s = time.perf_counter() - t0

    # -- 1. saturated throughput --------------------------------------------
    # Measured on a SEPARATE service (same predictor, same executables) with
    # a long coalescing deadline: the submit loop builds rows at host speed,
    # and a 50 ms deadline dispatches partial groups padded to the full
    # bucket — round-5 measured mean batch 5.5/16, i.e. ~3x padded waste —
    # which measures the deadline, not the server's capacity ceiling.
    sat_service = make_service(args.saturated_delay_ms)
    n = args.batches * args.max_batch
    t0 = time.perf_counter()
    futures = [sat_service.submit(req) for _ in range(n)]
    for f in futures:
        f.result(timeout=1200)
    saturated_dt = time.perf_counter() - t0
    saturated_sps = n / saturated_dt
    sat_stats = sat_service.stats()
    sat_service.shutdown()

    # -- 2. low-QPS end-to-end latency --------------------------------------
    lat = []
    period = 1.0 / args.qps if args.qps > 0 else 0.0
    for _ in range(args.latency_requests):
        t0 = time.perf_counter()
        service.inpaint(req, timeout=1200)
        lat.append(time.perf_counter() - t0)
        if period:
            # pace from completion: a fixed-rate scheduler would queue behind
            # the chip when latency > period and measure queueing, not serving
            time.sleep(max(0.0, period - (time.perf_counter() - t0)))
    stats = service.stats()
    service.shutdown()

    print(json.dumps({
        "metric": "serve_512_50step_samples_per_sec",
        "value": round(saturated_sps, 4),
        "unit": "samples/s",
        "scope": (
            f"InpaintService saturated throughput: {args.batches} full groups "
            f"of max_batch={args.max_batch} through the micro-batcher; full "
            f"predict flow ({args.steps} steps, {args.noise_iters}-iter noise "
            "search, conditioner, fp32 VAE)"
        ),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
        "latency_qps": args.qps,
        "latency_note": (
            f"single request padded to the smallest fitting bucket of "
            f"{list(service.batch_buckets)} (group of 1) — the "
            "interactive-caller number; includes host batch assembly"
        ),
        "buckets": list(service.batch_buckets),
        "noise_search_batched": bool(args.noise_search_batched),
        "pipeline_depth": args.pipeline,
        "compile_s": round(compile_s, 1),
        "batcher_stats": stats,
        "saturated_batcher_stats": sat_stats,
    }))


if __name__ == "__main__":
    main()
