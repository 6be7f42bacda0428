"""Tokenizer parity vs the reference's vendored CLIP tokenizer."""

import numpy as np
import pytest

from anomalyclip_tpu.models.clip.tokenizer import ClipTokenizer, tokenize
from tests.helpers.reference_oracle import (
    load_reference_tokenizer,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

TEXTS = [
    "a photo of a dog.",
    "X X X X X X X X Abuse.",
    "X X X X X X X X RoadAccidents.",
    "X X X X X X X X throwing object.",
    "Fighting",
    "a  photo   with   extra whitespace",
    "punctuation, and; hyphen-ated words!",
    "numbers 123 and 4",
]


@pytest.fixture(scope="module")
def tokenizers():
    ref_mod = load_reference_tokenizer()
    return ClipTokenizer(), ref_mod.SimpleTokenizer()


def test_encode_matches_reference(tokenizers):
    ours, ref = tokenizers
    for text in TEXTS:
        assert ours.encode(text) == ref.encode(text), text


def test_special_tokens(tokenizers):
    ours, ref = tokenizers
    assert ours.sot_token == ref.encoder["<|startoftext|>"] == 49406
    assert ours.eot_token == ref.encoder["<|endoftext|>"] == 49407
    assert len(ours.encoder) == len(ref.encoder) == 49408


def test_tokenize_layout(tokenizers):
    ours, _ = tokenizers
    arr = tokenize(["a photo of a dog.", "Fighting"], tokenizer=ours)
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == ours.sot_token
    # EOT is the max token id, so argmax finds it (model.py:412 relies on this)
    assert arr[0].max() == ours.eot_token
    # zero padding after EOT
    eot_pos = int(np.argmax(arr[0]))
    assert (arr[0, eot_pos + 1 :] == 0).all()


def test_decode_roundtrip(tokenizers):
    ours, _ = tokenizers
    text = "a photo of a dog."
    # BPE decode re-expands word boundaries, so punctuation regains its space.
    assert ours.decode(ours.encode(text)).strip() == "a photo of a dog ."


def test_truncation(tokenizers):
    ours, _ = tokenizers
    long_text = " ".join(["word"] * 200)
    with pytest.raises(RuntimeError):
        tokenize(long_text, tokenizer=ours)
    arr = tokenize(long_text, truncate=True, tokenizer=ours)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == ours.eot_token
