"""Orbax checkpointing: save/restore roundtrip, resume filtering, pruning,
and the async writer (utils/ckpt_orbax.py — replaces the reference's
Lightning ModelCheckpoint, train.py:33)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from udifftext_tpu.utils.ckpt_orbax import (
    AsyncCheckpointWriter,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def _state(v: float):
    return {
        "params": {"w": jnp.full((4, 4), v), "b": jnp.full((4,), v * 2)},
        "step": jnp.asarray(int(v)),
    }


def _assert_state_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a["params"]["w"]), np.asarray(b["params"]["w"]))
    np.testing.assert_array_equal(np.asarray(a["params"]["b"]), np.asarray(b["params"]["b"]))
    assert int(a["step"]) == int(b["step"])


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path / "ckpts")
    s = _state(3.0)
    path = save_checkpoint(d, s, step=7)
    assert path.endswith("step_00000007")
    assert latest_checkpoint(d) == path
    restored = restore_checkpoint(path, _state(0.0))
    _assert_state_equal(restored, s)


def test_latest_ignores_orbax_tmp_dirs(tmp_path):
    """A crash mid-save leaves `step_XXXXXXXX.orbax-checkpoint-tmp-<ts>`
    leftovers; resuming must never pick one (a partial tree)."""
    d = str(tmp_path / "ckpts")
    save_checkpoint(d, _state(1.0), step=1)
    os.makedirs(os.path.join(d, "step_00000002.orbax-checkpoint-tmp-123"))
    assert latest_checkpoint(d).endswith("step_00000001")


def test_latest_on_missing_or_empty_dir(tmp_path):
    assert latest_checkpoint(str(tmp_path / "nope")) is None
    empty = tmp_path / "empty"
    empty.mkdir()
    assert latest_checkpoint(str(empty)) is None


def test_keep_prunes_oldest(tmp_path):
    d = str(tmp_path / "ckpts")
    for step in (1, 2, 3, 4):
        save_checkpoint(d, _state(float(step)), step=step, keep=2)
    entries = sorted(e for e in os.listdir(d) if e.startswith("step_"))
    assert entries == ["step_00000003", "step_00000004"]


def test_async_writer_roundtrip_and_prune(tmp_path):
    """AsyncCheckpointWriter defers the disk-write wait to the next save /
    close; after close() the directory holds exactly `keep` finalized
    checkpoints and the latest restores bit-exactly."""
    d = str(tmp_path / "ckpts")
    with AsyncCheckpointWriter(d, keep=2) as w:
        for step in (1, 2, 3):
            path = w.save(_state(float(step)), step=step)
            assert path.endswith(f"step_{step:08d}")
    entries = sorted(e for e in os.listdir(d) if e.startswith("step_"))
    assert entries == ["step_00000002", "step_00000003"]
    restored = restore_checkpoint(latest_checkpoint(d), _state(0.0))
    _assert_state_equal(restored, _state(3.0))


def test_async_writer_durable_after_close(tmp_path):
    """close() must flush the in-flight write: the last checkpoint is
    restorable immediately after."""
    d = str(tmp_path / "ckpts")
    w = AsyncCheckpointWriter(d, keep=3)
    w.save(_state(9.0), step=9)
    w.close()
    restored = restore_checkpoint(latest_checkpoint(d), _state(0.0))
    _assert_state_equal(restored, _state(9.0))
    with pytest.raises(Exception):
        # a closed writer must not accept further saves
        w.save(_state(10.0), step=10)
