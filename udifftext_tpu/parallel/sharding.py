"""Megatron-style tensor-parallel sharding rules for the UNet transformers.

The reference has no tensor parallelism (Lightning DDP only, SURVEY §2c);
this is TPU-native capability on top of parity: GSPMD weight sharding over
the mesh's `tensor` axis, composed with data parallelism over `data`.

Column-parallel: attention to_q/to_k/to_v and the GEGLU up-projection shard
their output features; row-parallel: to_out and the FF down-projection shard
their input features — the canonical Megatron pairing, so the only `tensor`
collective per block is the all-reduce XLA inserts after each row-parallel
matmul (riding ICI on real hardware).

The rules operate on tree paths, so they apply equally to the raw param tree
and to optimizer-state trees that mirror it (adam mu/nu) — one rule set
shards the whole TrainState.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-substring, which feature axis of the 2-D kernel is sharded)
# proj_in is deliberately NOT column-parallel: its output feeds the block's
# pre-attention LayerNorm, which needs the full feature axis — sharding it
# would force an extra all-gather per transformer block, violating the
# one-collective-per-row-parallel-matmul design above.
_COL_PARALLEL = ("to_q", "to_k", "to_v")
_ROW_PARALLEL = ("to_out",)
# GEGLU: ff/proj column-parallel, ff/out row-parallel (attention.py:97-110)
_FF_COL = ("ff", "proj")
_FF_ROW = ("ff", "out")


def _path_keys(path) -> list:
    return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]


def tp_spec(path, leaf) -> P:
    """PartitionSpec for one leaf under tensor parallelism (replicated when
    no rule matches or the shape doesn't divide)."""
    keys = _path_keys(path)
    if not keys or keys[-1] != "kernel" or getattr(leaf, "ndim", 0) != 2:
        return P()
    joined = set(keys)
    if any(k in joined for k in _COL_PARALLEL):
        return P(None, "tensor")
    if any(k in joined for k in _ROW_PARALLEL):
        return P("tensor", None)
    if _FF_COL[0] in joined and _FF_COL[1] in joined:
        return P(None, "tensor")
    if _FF_ROW[0] in joined and _FF_ROW[1] in joined:
        return P("tensor", None)
    return P()


def state_shardings(mesh: Mesh, state_tree: Any) -> Any:
    """NamedSharding tree for a TrainState-shaped pytree (params, ema, and
    optimizer moments all match the same path rules; scalars replicate).
    Dimensions that don't divide the tensor axis fall back to replication."""
    n_tensor = mesh.shape.get("tensor", 1)

    def rule(path, leaf):
        spec = tp_spec(path, leaf) if n_tensor > 1 else P()
        if spec != P():
            axis = 1 if spec == P(None, "tensor") else 0
            if leaf.shape[axis] % n_tensor != 0:
                spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, state_tree)
