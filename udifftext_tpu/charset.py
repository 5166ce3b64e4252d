"""Character set and label tokenization for the LabelEncoder.

Behavior parity: sgm/modules/encoders/modules.py:1097-1099 and :1149-1158 of
the reference — charset is ``string.printable[:-6]`` (94 visible ASCII chars),
class 0 is the pad/unknown id, so ``num_classes == 95``. A label is encoded as
``charset.find(c) + 1`` per character, right-padded with 0 to ``max_len``.
"""

from __future__ import annotations

import string
from typing import Sequence

import numpy as np

# 94 printable ASCII characters: digits, letters, punctuation (no whitespace
# beyond ' ' — string.printable[:-6] drops '\t\n\r\x0b\x0c' and keeps ' '...
# actually it drops ' \t\n\r\x0b\x0c', i.e. all whitespace).
CHARSET: str = string.printable[:-6]
NUM_CLASSES: int = len(CHARSET) + 1  # +1 for pad id 0
PAD_ID: int = 0

_CHAR_TO_ID = {c: i + 1 for i, c in enumerate(CHARSET)}


def encode_label(label: str, max_len: int) -> np.ndarray:
    """Encode one label into int32 ids, pad id 0, length ``max_len``.

    Characters outside the charset map to 0 (``str.find`` returns -1 ⇒ id 0),
    matching the reference's ``self.character.find(c) + 1``.
    """
    if len(label) > max_len:
        raise ValueError(f"label {label!r} longer than max_len={max_len}")
    ids = np.zeros((max_len,), dtype=np.int32)
    for i, c in enumerate(label):
        ids[i] = _CHAR_TO_ID.get(c, 0)
    return ids


def encode_labels(labels: Sequence[str], max_len: int) -> np.ndarray:
    """Encode a batch of labels → (B, max_len) int32."""
    return np.stack([encode_label(l, max_len) for l in labels], axis=0)


def decode_ids(ids: Sequence[int]) -> str:
    """Inverse of encode_label; stops at the first pad id."""
    chars = []
    for i in ids:
        i = int(i)
        if i == PAD_ID:
            break
        chars.append(CHARSET[i - 1])
    return "".join(chars)
