"""Deterministic synthetic fixtures (FIXTURES.md) — no wall-clock, seed=42.

``pages``  — Common-Crawl-style table with the exact BASELINE.json input_hint
             shape: (url:string, warc_ts:timestamp, html:binary, text:string,
             lang:string). Zipfian bag-of-words plus deliberately messy rows
             (double-escaped entities, mixed case, whitespace runs, unicode
             punctuation, contractions, digits, CJK) to exercise the
             reference normalization (simple_tokenizer.py:58-92).
``queries``— the reference query set: fixed literals from reference tests
             (tests/test_search.py:13, tests/test_ranker.py:21-26,44,
             docs/user-guides/retriever.md:129,144, README.md:316) plus
             seeded multi-term vocab draws.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_MESSY_DECOR = [
    "Café &amp;amp; résumé",  # double-escaped entity + accents
    "don't it's we'll they're I'm you've he'd",  # contractions (token regex)
    "  RUNS\t\tof   white\n\nspace  ",
    "「中文文本」。",  # CJK + unicode punctuation
    "MiXeD CaSe ShOuTiNg",
    "numbers 123 456 7",
    "&lt;tag&gt; &amp;quot;quoted&amp;quot;",
    "ellipsis… em—dash ‘curly’ “quotes”",
]

# reference-test literal queries (semantics anchors, FIXTURES.md §2)
REFERENCE_QUERY_LITERALS = [
    "hello, world",
    "goodbye, world",
    "hello, world!",
    "goodbye,!",
    "good world!",
    "good!",
    "world!",
    "she smiled, with pain",
    "smile",
    "First do it",
    "then do it right",
    "then do it better",
]


def _vocabulary(rng: np.random.Generator, size: int = 5000) -> list[str]:
    consonants = list("bcdfghjklmnpqrstvwz")
    vowels = list("aeiou")
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < size:
        n_syll = int(rng.integers(1, 4))
        word = "".join(
            consonants[int(rng.integers(len(consonants)))]
            + vowels[int(rng.integers(len(vowels)))]
            for _ in range(n_syll)
        )
        if word not in seen:
            seen.add(word)
            vocab.append(word)
    # splice in the reference-query vocabulary so anchor queries hit docs
    anchors = [
        "hello", "world", "goodbye", "good", "smile", "smiled", "pain",
        "first", "do", "it", "then", "right", "better", "with", "she",
    ]
    for i, w in enumerate(anchors):
        vocab[i * 7] = w
    return vocab


def make_pages(n: int, seed: int = 42, messy_fraction: float = 0.15) -> list[dict]:
    """N deterministic page rows. Zipf(a=1.3) over a ~5k vocab, 20-400 words."""
    rng = np.random.default_rng(seed)
    vocab = _vocabulary(rng)
    v = len(vocab)
    # Zipfian rank weights (bounded, deterministic)
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = ranks ** -1.3
    probs /= probs.sum()

    rows = []
    for i in range(n):
        n_words = int(rng.integers(20, 401))
        idx = rng.choice(v, size=n_words, p=probs)
        words = [vocab[j] for j in idx]
        text = " ".join(words)
        if rng.random() < messy_fraction:
            decor = _MESSY_DECOR[int(rng.integers(len(_MESSY_DECOR)))]
            pos = int(rng.integers(0, len(words) + 1))
            text = " ".join(words[:pos] + [decor] + words[pos:])
        # degenerate docs are GUARANTEED in web corpora — pin them in every
        # fixture run: empty text, whitespace-only text (zero tokens after
        # normalization), and sub-shingle-length docs (1-2 tokens)
        if i % 61 == 3:
            text = ""
        elif i % 61 == 17:
            text = "  \t\n  "
        elif i % 61 == 31:
            text = words[0]
        elif i % 61 == 47:
            text = " ".join(words[:2])
        lang_draw = rng.random()
        lang = "en" if lang_draw < 0.95 else ("de" if lang_draw < 0.975 else "zh")
        rows.append(
            {
                "url": f"https://host{i % 97}.example.com/path/{i}",
                "warc_ts": EPOCH + timedelta(seconds=i),
                "html": b"<html><body>" + text.encode("utf-8") + b"</body></html>",
                "text": text,
                "lang": lang,
            }
        )
    return rows


def make_queries(n_seeded: int = 40, seed: int = 42) -> list[dict]:
    """Reference literals + seeded 1-6 term queries (head/mid/tail mix)."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocabulary(np.random.default_rng(seed))
    v = len(vocab)
    rows = [
        {"query_id": i, "text": t} for i, t in enumerate(REFERENCE_QUERY_LITERALS)
    ]
    qid = len(rows)
    bands = [(0, 50), (50, 500), (500, v)]  # head / mid / tail Zipf bands
    for _ in range(n_seeded):
        n_terms = int(rng.integers(1, 7))
        terms = []
        for _ in range(n_terms):
            lo, hi = bands[int(rng.integers(3))]
            terms.append(vocab[int(rng.integers(lo, hi))])
        rows.append({"query_id": qid, "text": " ".join(terms)})
        qid += 1
    rows.append({"query_id": qid, "text": "xqzvexistentterm oovmissing"})  # all-OOV
    rows.append({"query_id": qid + 1, "text": "   \t\n "})  # empty after normalization
    return rows


def pages_spark_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """pages fixture as a Spark DataFrame with the input_hint StructType."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), True),
            StructField("html", BinaryType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
        ]
    )
    df = spark.createDataFrame(make_pages(n, seed=seed), schema=schema)
    if partitions:
        df = df.repartition(partitions)
    return df


def pages_spark_distributed(spark, n: int, seed: int = 42, partitions: int = 64):
    """Large-scale pages fixture generated ON THE EXECUTORS (mapInPandas over
    spark.range): per-row rng seeded by (seed, doc index) so content is
    deterministic regardless of partitioning — the bench corpus generator.

    Messy-content decoration is skipped here (throughput benching tokenizes
    the same distribution either way); correctness fixtures use make_pages.
    """
    from pyspark.sql import functions as F

    vocab = _vocabulary(np.random.default_rng(seed))
    v = len(vocab)
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = ranks ** -1.3
    probs /= probs.sum()

    cum_probs = np.cumsum(probs)

    def _gen(batches):
        import pandas as pd

        vocab_arr = np.array(vocab, dtype=object)
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in pdf["id"].astype("int64"):
                rng = np.random.default_rng((seed << 24) ^ int(i))
                n_words = int(rng.integers(20, 401))
                # inverse-CDF sampling: searchsorted over the precomputed
                # cumulative Zipf weights (rng.choice(p=...) rebuilds the
                # cumsum per call — 10× slower)
                idx = np.minimum(
                    np.searchsorted(cum_probs, rng.random(n_words), side="right"),
                    v - 1,
                )
                text = " ".join(vocab_arr[idx])
                lang_draw = rng.random()
                rows["url"].append(f"https://host{i % 97}.example.com/path/{i}")
                rows["warc_ts"].append(EPOCH + timedelta(seconds=int(i)))
                rows["html"].append(b"<html><body>" + text.encode() + b"</body></html>")
                rows["text"].append(text)
                rows["lang"].append(
                    "en" if lang_draw < 0.95 else ("de" if lang_draw < 0.975 else "zh")
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(
            _gen,
            schema="url string, warc_ts timestamp, html binary, text string, lang string",
        )
    )


def queries_spark_df(spark, n_seeded: int = 40, seed: int = 42):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("query_id", IntegerType(), False),
            StructField("text", StringType(), True),
        ]
    )
    return spark.createDataFrame(make_queries(n_seeded, seed=seed), schema=schema)
