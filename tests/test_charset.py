import numpy as np
import pytest

from udifftext_tpu import charset


def test_charset_size():
    # string.printable[:-6] → 94 visible chars, +1 pad class
    assert len(charset.CHARSET) == 94
    assert charset.NUM_CLASSES == 95


def test_encode_matches_reference_indexing():
    # reference: index = character.find(c) + 1 (encoders/modules.py:1155)
    ids = charset.encode_label("0aA!", 12)
    assert ids.shape == (12,)
    assert ids[0] == charset.CHARSET.find("0") + 1 == 1
    assert ids[1] == charset.CHARSET.find("a") + 1
    assert ids[2] == charset.CHARSET.find("A") + 1
    assert ids[3] == charset.CHARSET.find("!") + 1
    assert (ids[4:] == 0).all()


def test_encode_decode_roundtrip():
    for s in ["hello", "WORLD42", "a!b@c#"]:
        assert charset.decode_ids(charset.encode_label(s, 12)) == s


def test_too_long_raises():
    with pytest.raises(ValueError):
        charset.encode_label("x" * 13, 12)


def test_batch_encode():
    out = charset.encode_labels(["ab", "c"], 4)
    assert out.shape == (2, 4)
    assert out.dtype == np.int32
