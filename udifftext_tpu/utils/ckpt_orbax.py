"""Native checkpointing via Orbax (replaces Lightning ModelCheckpoint —
train.py:33, pretrain.py:29 in the reference).

Saves/restores the full TrainState pytree (params, opt_state, step, EMA) with
atomic directory swaps and keeps the latest N checkpoints.
"""

from __future__ import annotations

import os
import re
from typing import Any, List, Optional

import jax
import orbax.checkpoint as ocp

# finalized checkpoints ONLY — Orbax's atomic-save leftovers look like
# `step_XXXXXXXX.orbax-checkpoint-tmp-<ts>`; matching them would resume from
# a partial tree after a mid-save crash and mis-count the keep quota
_STEP_RE = re.compile(r"^step_\d+$")


def _finalized(ckpt_dir: str) -> List[str]:
    return sorted(e for e in os.listdir(ckpt_dir) if _STEP_RE.match(e))


def save_checkpoint(ckpt_dir: str, state: Any, step: int, keep: int = 3) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    _prune(ckpt_dir, keep)
    return path


class AsyncCheckpointWriter:
    """Overlap checkpoint disk writes with training.

    ``ocp.StandardCheckpointer`` is an ``AsyncCheckpointer``: ``save`` blocks
    only until the state is snapshotted to host memory (safe even when the
    train step donates its device buffers — the snapshot completes before
    ``save`` returns), then serializes to disk on a background thread.
    ``save_checkpoint`` waits for that write so every call is durable before
    returning; this writer instead defers the wait to the NEXT save (or
    ``close()``), so the train loop never sits on disk I/O between epochs.

    The trade is explicit: after ``save`` returns, the checkpoint is durable
    only once the next ``save``/``close`` completes. Call ``close()`` before
    reading the directory (pruning also happens there, on finalized entries
    only, so a crash mid-write never deletes the last good checkpoint).
    """

    def __init__(self, ckpt_dir: str, keep: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.keep = int(keep)
        self._ckptr = ocp.StandardCheckpointer()
        self._closed = False

    def save(self, state: Any, step: int) -> str:
        if self._closed:
            raise RuntimeError("AsyncCheckpointWriter is closed")
        # finish (and account for) the previous async write before starting
        # a new one — one write in flight keeps memory bounded
        self._ckptr.wait_until_finished()
        _prune(self.ckpt_dir, self.keep)
        path = os.path.join(self.ckpt_dir, f"step_{step:08d}")
        self._ckptr.save(path, state, force=True)
        return path

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._ckptr.wait_until_finished()
        _prune(self.ckpt_dir, self.keep)
        self._ckptr.close()

    def __enter__(self) -> "AsyncCheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _prune(ckpt_dir: str, keep: int):
    entries = _finalized(ckpt_dir)
    for e in entries[:-keep]:
        full = os.path.join(ckpt_dir, e)
        import shutil

        shutil.rmtree(full, ignore_errors=True)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = _finalized(ckpt_dir)
    return os.path.join(ckpt_dir, entries[-1]) if entries else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (an abstract or concrete
    TrainState/pytree)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)
