"""HTTP inference server for UDiffText-TPU scene-text inpainting.

Beyond-reference capability: the reference serves only an interactive Gradio
demo (/root/reference/demo.py:119-198). This is a production surface — a
threaded stdlib HTTP server in front of udifftext_tpu.serving.InpaintService,
which micro-batches concurrent requests into one fixed-shape TPU dispatch
(see that module's docstring for the batching/compile model).

Endpoints
---------
POST /v1/inpaint   {"image": <b64 PNG/JPEG>, "mask": <b64 PNG>, "text": "WORD"}
                   -> {"image": <b64 PNG>, "batch_key": int, "row": int,
                       "batch_size": int}   (the replay coordinates)
GET  /healthz      -> 200 "ok" once the pipeline has compiled
GET  /v1/stats     -> batcher counters (requests, batches, mean batch size,
                      queue-wait and model-call p50/p95 latency windows)

Usage
-----
  python scripts/serve.py [--config ./configs/demo.yaml] [--port 8000]
      [--max-batch 8] [--max-delay-ms 50] [--steps N] [--scale S] [--seed 0]
      [--buckets 1,8] [--noise-search-batched] [--dp N]

The model graph, sampler settings, and checkpoint paths come from the demo
run config; --steps/--scale override it. First request latency includes the
one-time XLA compile; POST /healthz-gated warmup runs at startup so the
server only reports healthy once the executable is built.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from udifftext_tpu.serving import InpaintRequest, InpaintService  # noqa: E402


def _b64_image(data_b64: str, mode: str) -> np.ndarray:
    from PIL import Image

    raw = base64.b64decode(data_b64, validate=True)
    return np.asarray(Image.open(io.BytesIO(raw)).convert(mode))


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(service: InpaintService, ready: threading.Event):
    class Handler(BaseHTTPRequestHandler):
        # one response per request; keep the default logging quiet
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, code: int, payload):
            body = (
                payload
                if isinstance(payload, (bytes, bytearray))
                else json.dumps(payload).encode()
            )
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                if ready.is_set():
                    self._reply(200, {"status": "ok"})
                else:
                    self._reply(503, {"status": "compiling"})
            elif self.path == "/v1/stats":
                self._reply(200, service.stats())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/inpaint":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length))
                image = _b64_image(req["image"], "RGB")
                mask = _b64_image(req["mask"], "L")
                result = service.inpaint(
                    InpaintRequest(image=image, mask=mask, text=req["text"]),
                    timeout=float(req.get("timeout", 600.0)),
                )
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — surface model-side failures
                self._reply(500, {"error": str(e)})
                return
            self._reply(
                200,
                {
                    "image": _png_b64(result["image"]),
                    "batch_key": result["batch_key"],
                    "row": result["row"],
                    "batch_size": result["batch_size"],
                },
            )

    return Handler


def serve(service: InpaintService, port: int, ready: threading.Event):
    import signal

    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service, ready))

    def _drain(signum, _frame):
        # graceful termination (SIGTERM from an orchestrator): stop accepting,
        # let in-flight groups finish via service.shutdown()'s queue drain
        print(f"signal {signum}: draining and shutting down")
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    print(f"serving on :{port} (POST /v1/inpaint, GET /healthz, GET /v1/stats)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        service.shutdown()


def build_service(args) -> InpaintService:
    import jax

    from udifftext_tpu.config import load_config
    from udifftext_tpu.predict import JittedPredictor
    from util import init_model, init_sampling

    cfgs = load_config(args.config)
    bundle, params = init_model(cfgs)
    sampler = init_sampling(cfgs)
    steps = args.steps if args.steps is not None else sampler.num_steps
    scale = args.scale if args.scale is not None else sampler.cfg_scale
    encprop = int(cfgs.get("encprop_interval", 0))
    ckpt_id = None
    if encprop > 1:
        from udifftext_tpu.utils.encprop_gate import ckpt_file_id

        ckpt_id = ckpt_file_id(cfgs.get("load_ckpt_path"))
    mesh = None
    if args.dp > 1:
        # data-parallel serving: one jitted program sharded over `dp` chips
        # via a `data` mesh axis — the dispatcher thread is unchanged, GSPMD
        # splits each padded group's batch dim across the mesh
        from udifftext_tpu.parallel.mesh import make_mesh

        devs = jax.devices()
        if len(devs) < args.dp:
            raise SystemExit(
                f"--dp {args.dp} requested but only {len(devs)} device(s) "
                f"visible: {devs}"
            )
        mesh = make_mesh(n_data=args.dp, devices=devs[: args.dp])
    predictor = JittedPredictor(
        bundle.engine,
        num_steps=int(steps),
        cfg_scale=float(scale),
        noise_iters=int(cfgs.get("noise_iters", 10)),
        encprop_interval=encprop,
        ckpt_id=ckpt_id,
        noise_search_batched=args.noise_search_batched,
        mesh=mesh,
    )
    base_key = jax.random.PRNGKey(args.seed)

    def run(arr_batch, key: int):
        # lazy jax.Array: a pipelined service (--pipeline > 1) overlaps the
        # next group's assembly/transfer with this group's compute; the
        # service's finalize stage materializes
        images, _ = predictor(params, arr_batch, jax.random.fold_in(base_key, key))
        return images

    return InpaintService(
        run,
        max_batch=args.max_batch,
        max_delay_ms=args.max_delay_ms,
        size=int(cfgs.get("H", 512)),
        seq_len=int(cfgs.get("seq_len", 12)),
        batch_buckets=args.buckets,
        pipeline_depth=args.pipeline,
        dp=args.dp,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="./configs/demo.yaml")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--buckets", type=lambda s: [int(b) for b in s.split(",")],
                   default=None,
                   help="comma-separated batch buckets, largest == max-batch "
                        "(e.g. '1,8'): pad each group only to the smallest "
                        "bucket that fits it — one extra one-time compile per "
                        "bucket, much lower latency for lone requests")
    p.add_argument("--noise-search-batched", action="store_true",
                   help="run the init-noise search with candidates stacked on "
                        "the batch axis (exact; 2 UNet evals instead of "
                        "2*noise_iters — latency win at small buckets, memory "
                        "scales with noise_iters*bucket)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel serving degree: shard every dispatched "
                        "batch over this many chips (a `data` mesh axis; "
                        "every bucket must be divisible by it)")
    p.add_argument("--max-delay-ms", type=float, default=50.0)
    p.add_argument("--pipeline", type=int, default=1,
                   help="pipeline depth: >1 overlaps the next group's host "
                        "assembly + wire transfer with the chip's compute")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--scale", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    service = build_service(args)
    ready = threading.Event()

    def warmup():
        # compile every bucket's executable before reporting healthy — the
        # same signatures real traffic uses
        try:
            service.warmup()
        except Exception as e:  # noqa: BLE001 — keep /healthz honest, not silent
            print(f"FATAL: warmup compile failed, /healthz stays 503: {e}")
            raise
        ready.set()
        print(f"pipeline compiled for buckets {service.batch_buckets}; serving traffic")

    threading.Thread(target=warmup, daemon=True).start()
    serve(service, args.port, ready)


if __name__ == "__main__":
    main()
