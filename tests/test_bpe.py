"""Optional CLIP-BPE path (textnorm.BpeTokenizer) — exercised only when the
reference vocab artifact is present (read-only reference checkout)."""

import os

import pytest

VOCAB = (
    "/root/reference/server/clip_server/resources/bpe_simple_vocab_16e6.txt.gz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(VOCAB), reason="BPE vocab artifact not available"
)


@pytest.fixture(scope="module")
def bpe():
    from clip_as_service_spark.textnorm import BpeTokenizer

    return BpeTokenizer(VOCAB)


def test_vocab_size(bpe):
    # 256 bytes + 256 </w> + 48894 merges + 2 specials = 49408
    # (reference simple_tokenizer.py:74-82, tokenization.py:80-81)
    assert len(bpe.encoder) == 49408


def test_encode_basics(bpe):
    ids = bpe.encode("hello world!")
    assert len(ids) == 3  # three whole-word vocab hits
    assert all(0 <= i < 49408 for i in ids)
    assert bpe.encode("hello world!") == ids  # deterministic + cached


def test_unknown_word_splits_to_multiple_pieces(bpe):
    ids = bpe.encode("qzxvqt")
    assert len(ids) >= 2


def test_normalization_flows_through(bpe):
    # same pipeline F1-F3 feeds BPE: case/whitespace collapse first
    assert bpe.encode("  HELLO   world! ") == bpe.encode("hello world!")
