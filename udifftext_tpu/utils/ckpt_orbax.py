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
