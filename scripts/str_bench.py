"""STR model benchmark: latency + FLOPs + parameter/activation counts.

Parity: src/parseq/bench.py:28-59 (torch.utils.benchmark + fvcore) — here
XLA's own cost analysis supplies FLOPs and the jitted call is timed on
device. Usage: python scripts/str_bench.py [parseq|vitstr|crnn] [batch].
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "parseq"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    x = jnp.zeros((batch, 32, 128, 3), jnp.float32)
    if which == "parseq":
        from udifftext_tpu.models.parseq import PARSeq

        model = PARSeq()
        params = model.init(jax.random.PRNGKey(0), x, 1)
        fn = jax.jit(lambda p, x: model.apply(p, x, 1))
    elif which == "vitstr":
        from udifftext_tpu.models.str_models import ViTSTRSystem

        model = ViTSTRSystem()
        params = model.init(jax.random.PRNGKey(0), x)
        fn = jax.jit(model.apply)
    elif which == "crnn":
        from udifftext_tpu.models.str_models import CRNN

        model = CRNN()
        params = model.init(jax.random.PRNGKey(0), x)
        fn = jax.jit(model.apply)
    else:
        raise SystemExit(f"unknown model {which}")

    n_params = sum(p.size for p in jax.tree.leaves(params))
    comp = fn.lower(params, x).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0)

    np.asarray(jax.tree.leaves(fn(params, x))[0])  # compile+warm
    times = []
    for i in range(5):
        xi = jnp.full_like(x, 0.01 * i)
        t0 = time.perf_counter()
        out = fn(params, xi)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)

    # On-device latency: K-scan inside one jit (the axon relay costs ~24 ms
    # per dispatch + ~12 MB/s result transfer — ROOFLINE.md measurement
    # traps — so per-call wall times above measure the tunnel, not the chip).
    K = 20

    @jax.jit
    def scan_run(x0):
        def body(c, _):
            out = fn(params, c)
            leaf = jax.tree.leaves(out)[0]
            bump = jnp.sum(leaf.astype(jnp.float32)) * 1e-12
            return (c + bump).astype(c.dtype), None

        c, _ = jax.lax.scan(body, x0, None, length=K)
        return jnp.sum(c.astype(jnp.float32))

    float(scan_run(x))
    t0 = time.perf_counter()
    float(scan_run(x))
    dev_ms = (time.perf_counter() - t0) / K * 1e3

    print(f"model: {which}")
    print(f"params: {n_params / 1e6:.3f} M")
    print(f"flops (XLA, batch {batch}): {flops / 1e9:.3f} GFLOPs")
    print(f"median latency: {sorted(times)[len(times) // 2] * 1e3:.2f} ms "
          f"(includes host transfer)")
    print(f"on-device latency: {dev_ms:.2f} ms/call (batch {batch}, "
          f"{batch / dev_ms * 1e3:.1f} images/s)")


if __name__ == "__main__":
    main()
