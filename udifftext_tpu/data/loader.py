"""Batching + prefetching loader.

Replaces the reference's `get_dataloader` (dataloader.py:925-932, torch
DataLoader with `eval(target)` dispatch) with a torch-free pipeline: explicit
dataset registry, numpy collation to fixed-shape NHWC batches, `label_ids`
tokenization for the LabelEncoder, and a background-thread prefetcher that
overlaps host augmentation (cv2/PIL) with device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from ..charset import encode_labels
from ..config import load_config
from ..models.parseq import ParseqTokenizer
from . import datasets as D

_PARSEQ_TOKENIZER = ParseqTokenizer()

DATASETS = {
    "LAIONOCRDataset": D.LAIONOCRDataset,
    "TextSegDataset": D.TextSegDataset,
    "SynthTextDataset": D.SynthTextDataset,
    "ICDAR13Dataset": D.ICDAR13Dataset,
    "LabelDataset": D.LabelDataset,
}


def collate(samples: List[Dict[str, Any]], max_len: int = 12) -> Dict[str, Any]:
    """Stack numpy fields; keep strings as lists; add label_ids."""
    batch: Dict[str, Any] = {}
    keys = samples[0].keys()
    for k in keys:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[k] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float)):
            batch[k] = np.asarray(vals)
        else:
            batch[k] = vals
    if "label" in batch:
        batch["label_ids"] = encode_labels(batch["label"], max_len)
        batch["parseq_label_ids"] = _PARSEQ_TOKENIZER.encode(batch["label"])
    if "text" in batch:
        batch["label_ids"] = encode_labels(batch["text"], max_len)
    return batch


class DataLoader:
    """Simple shuffling, drop-last, prefetching loader over an indexable
    dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        max_label_len: int = 12,
        prefetch: int = 2,
        seed: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.max_label_len = max_label_len
        self.prefetch = prefetch
        # Multi-host sharding: every process builds the SAME global order
        # (shared seed) and reads its strided shard — so per-process batches
        # are disjoint and jointly cover the epoch. seed must agree across
        # processes when process_count > 1.
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        if process_count > 1 and seed is None:
            seed = 0
        self.rng = np.random.RandomState(seed)

    def _shard_len(self) -> int:
        # every process gets the SAME shard length (the global order is
        # truncated to a multiple of process_count) — unequal shards would
        # desynchronize the per-process jitted-step counts and hang/mix the
        # collectives across epochs (review round 3)
        return len(self.dataset) // self.process_count

    def __len__(self):
        n = self._shard_len() // self.batch_size
        if not self.drop_last and self._shard_len() % self.batch_size:
            n += 1
        return n

    def _index_batches(self) -> Iterator[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        usable = len(order) // self.process_count * self.process_count
        order = order[:usable][self.process_index :: self.process_count]
        for i in range(0, len(order), self.batch_size):
            idx = order[i : i + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield idx.tolist()

    def _produce(self, q: "queue.Queue"):
        try:
            for idx in self._index_batches():
                samples = [self.dataset[i] for i in idx]
                q.put(collate(samples, self.max_label_len))
        finally:
            q.put(None)

    def __iter__(self):
        if self.prefetch <= 0:
            for idx in self._index_batches():
                yield collate([self.dataset[i] for i in idx], self.max_label_len)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


def get_dataloader(cfgs, datype: str = "train") -> DataLoader:
    """Reference get_dataloader semantics: run-config points at a dataset
    YAML with {target, params}; explicit registry instead of eval()."""
    dataset_cfgs = load_config(cfgs["dataset_cfg_path"])
    target = dataset_cfgs["target"].split(".")[-1]
    if target not in DATASETS:
        raise KeyError(f"unknown dataset target {target}")
    cls = DATASETS[target]
    params = dict(dataset_cfgs.get("params", {}) or {})
    if target == "LabelDataset":
        dataset = cls(**params)
    else:
        dataset = cls(params, datype=datype)

    import jax

    pcount = jax.process_count()
    batch_size = int(cfgs.get("batch_size", 1))
    if pcount > 1:
        # batch_size stays the GLOBAL microbatch (the single-host
        # convention); each process loads its slice of it
        if batch_size % pcount != 0:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the process "
                f"count {pcount}"
            )
        batch_size //= pcount
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=cfgs.get("shuffle", True),
        max_label_len=params.get("seq_len", params.get("max_len", 12)),
        seed=int(cfgs.get("data_seed", 0)) if pcount > 1 else None,
        process_index=jax.process_index(),
        process_count=pcount,
    )
