"""STR evaluation metrics and helpers.

Parity: src/parseq/strhub/models/base.py:97-128 (BaseSystem._eval_step) —
word accuracy, 1 - normalized edit distance, and mean sequence confidence —
and strhub/data/utils.py:26-42 (CharsetAdapter).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np


class CharsetAdapter:
    """Lowercase/uppercase coercion + unsupported-char removal."""

    def __init__(self, target_charset: str):
        self.lowercase_only = target_charset == target_charset.lower()
        self.uppercase_only = target_charset == target_charset.upper()
        self.unsupported = f"[^{re.escape(target_charset)}]"

    def __call__(self, label: str) -> str:
        if self.lowercase_only:
            label = label.lower()
        elif self.uppercase_only:
            label = label.upper()
        return re.sub(self.unsupported, "", label)


def edit_distance(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


@dataclass
class STRResult:
    num_samples: int = 0
    correct: int = 0
    ned: float = 0.0
    confidence: float = 0.0
    label_length: int = 0

    def update(self, pred: str, gt: str, conf: float):
        self.num_samples += 1
        if pred == gt:
            self.correct += 1
        self.ned += edit_distance(pred, gt) / max(len(pred), len(gt), 1)
        self.confidence += conf
        self.label_length += len(pred)

    @property
    def accuracy(self) -> float:
        return 100 * self.correct / max(self.num_samples, 1)

    @property
    def mean_1_minus_ned(self) -> float:
        return 100 * (1 - self.ned / max(self.num_samples, 1))

    @property
    def mean_confidence(self) -> float:
        return 100 * self.confidence / max(self.num_samples, 1)


def evaluate_predictions(
    preds: Sequence[str],
    gts: Sequence[str],
    confidences: Sequence[float],
    charset_test: str = "0123456789abcdefghijklmnopqrstuvwxyz",
) -> STRResult:
    """Accumulate the strhub eval metrics with charset adaptation."""
    adapter = CharsetAdapter(charset_test)
    res = STRResult()
    for p, g, c in zip(preds, gts, confidences):
        res.update(adapter(p), adapter(g), float(c))
    return res


def sequence_confidence(logits: np.ndarray, eos_id: int = 0) -> List[float]:
    """Product of per-step max softmax probs up to (and incl.) EOS."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = []
    for dist in probs:
        p = dist.max(-1)
        ids = dist.argmax(-1)
        conf = 1.0
        for prob, idx in zip(p, ids):
            conf *= float(prob)
            if idx == eos_id:
                break
        out.append(conf)
    return out
