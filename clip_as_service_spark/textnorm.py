"""Vendored text normalization + tokenization oracle (pure Python).

Replicates the semantics of the reference CLIP tokenizer preprocessing
pipeline so that extracted/normalized text is byte-identical per url between
the Spark pipeline and this single-node oracle (the graft invariant,
BASELINE.json input_hint):

- ``basic_clean``     — reference server/clip_server/model/simple_tokenizer.py:58-61
                        (ftfy.fix_text, then **double** html.unescape, then strip)
- ``whitespace_clean``— simple_tokenizer.py:64-67 (collapse \\s+ → ' ', strip)
- token regex         — simple_tokenizer.py:89-92 (contractions, \\p{L}+ runs,
                        single \\p{N} digits, punctuation runs; IGNORECASE)
- optional BPE path   — simple_tokenizer.py:94-143 (byte→unicode map :19-43,
                        merge loop :103-130) behind ``BpeTokenizer`` — BM25
                        terms default to word-level tokens (SURVEY.md §7).

Both the Spark pandas-UDFs (functions/text.py) and the numpy oracle
(oracle.py) call *these* functions, so rank-identity is well-defined even
when optional deps (ftfy) are absent: ftfy is gated behind an import-try and
both sides degrade identically.
"""

from __future__ import annotations

import gzip
import html
from functools import lru_cache

import regex as _regex

try:  # optional; absent in this container — both pipeline and oracle degrade identically
    import ftfy as _ftfy

    _HAVE_FTFY = True
except ImportError:  # pragma: no cover
    _ftfy = None
    _HAVE_FTFY = False

# Token pattern per reference simple_tokenizer.py:89-92 (regex module semantics).
TOKEN_PATTERN = (
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
    r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
)
_TOKEN_RE = _regex.compile(TOKEN_PATTERN, _regex.IGNORECASE)
_WS_RE = _regex.compile(r"\s+")


def basic_clean(text: str) -> str:
    """ftfy fix (if available) + double html.unescape + strip.

    The double unescape is deliberate — the reference unescapes twice
    (simple_tokenizer.py:60), so ``&amp;amp;`` → ``&``.
    """
    if _HAVE_FTFY:
        text = _ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def normalize(text: str) -> str:
    """Full normalization F1→F2 (reference simple_tokenizer.py:137 pre-lower)."""
    return whitespace_clean(basic_clean(text))


def tokenize_words(text: str) -> list[str]:
    """normalize → lower → token-regex findall (reference :137-138).

    These word-level tokens are the default BM25 terms (SURVEY.md §7 locked
    decision); the BPE-id path below is the flagged alternative.
    """
    return _TOKEN_RE.findall(normalize(text).lower())


def extract_text_from_html(html_bytes: bytes) -> str:
    """Deterministic text extraction from the fixture html wrapper.

    Fixture html is ``<html><body>TEXT</body></html>`` (FIXTURES.md §1); real
    extraction would plug an HTML parser here. Byte-identity of the result is
    the invariant — the oracle uses this same function.
    """
    s = html_bytes.decode("utf-8", errors="replace")
    start = s.find("<body>")
    end = s.rfind("</body>")
    if start == -1 or end == -1:
        return s
    return s[start + len("<body>") : end]


# ---------------------------------------------------------------------------
# Optional BPE path (reference simple_tokenizer.py:19-43, 94-143)
# ---------------------------------------------------------------------------


@lru_cache()
def byte_to_unicode() -> dict[int, str]:
    """Reversible 256-byte → printable-unicode map (reference :19-43)."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping: dict[int, str] = {b: chr(b) for b in printable}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


class BpeTokenizer:
    """CLIP-style BPE encoder (reference simple_tokenizer.py:70-143).

    Only constructed when a merges file is supplied (the vocab artifact is
    not shipped with this engine); ``tokenize_words`` is the default path.
    """

    def __init__(self, bpe_path: str):
        with gzip.open(bpe_path) as fh:
            lines = fh.read().decode("utf-8").split("\n")
        # same slice as reference :75 — rows 1..(49152-256-2), i.e. the merge table
        merge_lines = lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]
        self.byte_encoder = byte_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.ranks = {m: i for i, m in enumerate(merges)}
        self._cache: dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }

    def _bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word: tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            return token + "</w>"
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            first, second = best
            merged: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for token in tokenize_words(text):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._bpe(mapped).split(" "))
        return ids

    def decode(self, ids: list[int]) -> str:
        """ids → text (reference simple_tokenizer.py:145-152): join vocab
        pieces, invert the byte→unicode map, utf-8 decode with replacement,
        then '</w>' end-of-word markers become spaces."""
        if not hasattr(self, "_decoder"):
            self._decoder = {i: tok for tok, i in self.encoder.items()}
            self._byte_decoder = {c: b for b, c in self.byte_encoder.items()}
        text = "".join(self._decoder[i] for i in ids)
        data = bytearray(self._byte_decoder[c] for c in text)
        return data.decode("utf-8", errors="replace").replace("</w>", " ")


def mini_bpe_path() -> str:
    """Path of the vendored mini merge table (shipped with the package so
    the BPE index mode runs in the bare container; swap in the reference's
    full 16e6 artifact for production vocabularies)."""
    import os

    return os.path.join(
        os.path.dirname(__file__), "resources", "bpe_mini_merges.txt.gz"
    )


_BPE_CACHE: dict[str, BpeTokenizer] = {}


def get_bpe(path: str | None = None) -> BpeTokenizer:
    """Process-level tokenizer memo: each Python worker constructs the merge
    table once, not once per Arrow batch."""
    p = path or mini_bpe_path()
    bpe = _BPE_CACHE.get(p)
    if bpe is None:
        bpe = _BPE_CACHE[p] = BpeTokenizer(p)
    return bpe


def tokenize_bpe_terms(text: str, bpe: BpeTokenizer) -> list[str]:
    """BPE-id index terms, as STRINGS — the posting/dictionary machinery is
    term-type agnostic, so the flagged BPE path (SURVEY.md §7; reference
    simple_tokenizer.py:135-143 feeding tokenization.py:80-104) reuses the
    entire word-term build unchanged."""
    return [str(i) for i in bpe.encode(text)]
