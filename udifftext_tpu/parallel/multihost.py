"""Multi-host input feeding.

The reference's scope is single-node DDP (configs/train.yaml:17-24) where
every rank owns its batch outright. On a multi-host TPU slice, a jitted step
whose `in_shardings` name a GLOBAL mesh must be fed global `jax.Array`s; each
process only holds its local slice of the batch, so the global arrays are
assembled with `jax.make_array_from_process_local_data` — each process
contributes the shard(s) its addressable devices own, with no cross-host data
movement.

Single-process (incl. the 8-virtual-device CPU test mesh) the same call is a
plain device_put onto the sharding: all mesh devices are addressable, so the
"process-local data" IS the global batch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_global_batch(
    batch: Dict[str, Any], mesh: Mesh, axis: str = "data"
) -> Dict[str, Any]:
    """Per-process host batch → global jax.Arrays batch-sharded over `axis`.

    Array fields must carry this process's slice of the global batch (the
    loader's process-sharded output); the leading dim of the assembled global
    array is `local * process_count`. Non-array fields (strings, ragged) pass
    through untouched.
    """
    sharding = NamedSharding(mesh, P(axis))
    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = v
    return out
