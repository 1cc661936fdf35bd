"""Unit tests for the vendored normalization/tokenization (FIXTURES.md §4).

Expected values mirror reference simple_tokenizer.py:58-92 semantics:
double html.unescape, \\s+ collapse, strip, lower + token regex with
contraction splits and \\p{L}/\\p{N} classes.
"""

from clip_as_service_spark.textnorm import (
    basic_clean,
    byte_to_unicode,
    extract_text_from_html,
    normalize,
    tokenize_words,
    whitespace_clean,
)


def test_whitespace_clean():
    assert whitespace_clean("  A  \t\n B  ") == "A B"
    assert whitespace_clean("") == ""
    assert whitespace_clean("   ") == ""


def test_double_unescape():
    # reference unescapes twice (simple_tokenizer.py:60): &amp;amp; → &
    assert basic_clean("café &amp;amp; résumé") == "café & résumé"
    assert basic_clean("&amp;lt;x&amp;gt;") == "<x>"


def test_normalize_combines():
    assert normalize("  A  \t\n &amp;amp; B  ") == "A & B"


def test_tokenize_contractions():
    assert tokenize_words("don't it's we'll") == [
        "don", "'t", "it", "'s", "we", "'ll",
    ]


def test_tokenize_casefold_and_classes():
    assert tokenize_words("MiXeD CaSe 123!") == ["mixed", "case", "1", "2", "3", "!"]


def test_tokenize_special_tokens_survive():
    toks = tokenize_words("<|startoftext|>x<|endoftext|>")
    assert toks == ["<|startoftext|>", "x", "<|endoftext|>"]


def test_tokenize_unicode_letters():
    assert tokenize_words("café résumé") == ["café", "résumé"]
    # CJK letters are \p{L} runs; unicode punctuation is [^\s\p{L}\p{N}]+
    assert tokenize_words("「中文」。") == [
        "「", "中文", "」。",
    ]


def test_empty_and_whitespace_only():
    assert tokenize_words("") == []
    assert tokenize_words("   \t\n ") == []


def test_extract_text_roundtrip():
    assert extract_text_from_html(b"<html><body>hello &amp; x</body></html>") == "hello &amp; x"
    assert extract_text_from_html(b"no wrapper") == "no wrapper"


def test_byte_to_unicode_reversible():
    m = byte_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_ftfy_branch_when_importable():
    """F1's primary branch (reference simple_tokenizer.py:58-61 uses
    ftfy.fix_text first): when ftfy is importable, mojibake must be repaired
    before unescape; when absent, both engine and oracle skip it identically
    (the degradation is itself pinned by the byte-identity tests)."""
    import pytest

    ftfy = pytest.importorskip("ftfy")
    from clip_as_service_spark.textnorm import _HAVE_FTFY, basic_clean

    assert _HAVE_FTFY
    # classic UTF-8-as-latin-1 mojibake; ftfy.fix_text repairs it
    assert basic_clean("Ã©tÃ©") == ftfy.fix_text("Ã©tÃ©")
    assert basic_clean("Ã©tÃ©") == "été"
