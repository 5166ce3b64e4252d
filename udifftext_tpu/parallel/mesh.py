"""Device mesh and sharding helpers.

The reference distributes via Lightning DDP over NCCL (configs/train.yaml:
17-24) — pure data parallelism with gradient all-reduce. The TPU-native
equivalent: a 1-D `jax.sharding.Mesh` over the `data` axis, batch sharded,
parameters replicated; XLA inserts the all-reduce over ICI. No custom
communication layer exists in either system (SURVEY.md §2c).

A `tensor` axis is provisioned for optional megatron-style sharding of the
UNet channels (not required for parity; mesh axes default to data-only).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_tensor
    devices = np.asarray(devices[: n_data * n_tensor]).reshape(n_data, n_tensor)
    return Mesh(devices, ("data", "tensor"))


def shard_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
