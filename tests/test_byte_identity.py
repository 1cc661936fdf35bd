"""The graft invariant (BASELINE.json input_hint): extracted/normalized text
per url is BYTE-IDENTICAL between the Spark pipeline and the vendored
oracle — including the messy rows (double-escaped entities, whitespace runs,
CJK, contractions)."""

from pyspark.sql import functions as F

from clip_as_service_spark import fixtures
from clip_as_service_spark.functions.text import (
    clean_text_udf,
    extract_text_udf,
    tokenize_udf,
    whitespace_clean_col,
)
from clip_as_service_spark.textnorm import (
    extract_text_from_html,
    normalize,
    tokenize_words,
    whitespace_clean,
)

N = 150


def test_extracted_text_byte_identical_per_url(spark):
    pages = fixtures.make_pages(N, messy_fraction=0.5)
    df = fixtures.pages_spark_df(spark, N, seed=42)
    # fixture determinism differs via messy_fraction → regenerate both same way
    rows = {
        r["url"]: (r["extracted"], r["clean"])
        for r in fixtures.pages_spark_df(spark, N)
        .select(
            "url",
            extract_text_udf(F.col("html")).alias("extracted"),
            clean_text_udf(F.col("text")).alias("clean"),
        )
        .collect()
    }
    for p in fixtures.make_pages(N):
        got_extracted, got_clean = rows[p["url"]]
        assert got_extracted == extract_text_from_html(p["html"])  # bytes → str
        assert got_extracted == p["text"]  # fixture html wraps text verbatim
        assert got_clean == normalize(p["text"])  # F1+F2


def test_spark_tokens_equal_oracle_tokens(spark):
    df = fixtures.pages_spark_df(spark, N)
    got = {
        r["url"]: r["toks"]
        for r in df.select("url", tokenize_udf(F.col("text")).alias("toks")).collect()
    }
    for p in fixtures.make_pages(N):
        assert got[p["url"]] == tokenize_words(p["text"])


def test_builtin_whitespace_clean_ascii_parity_and_nbsp_divergence(spark):
    ascii_cases = ["  A  \t\n B  ", "", "   ", "a b", "x\r\ny"]
    nbsp = "a\u00a0b"  # Python \s matches NBSP; Java \s (ASCII) does not
    df = spark.createDataFrame([(c,) for c in ascii_cases + [nbsp]], "s string")
    got = [
        r["c"] for r in df.select(whitespace_clean_col(F.col("s")).alias("c")).collect()
    ]
    # parity on ASCII whitespace
    assert got[: len(ascii_cases)] == [whitespace_clean(c) for c in ascii_cases]
    # documented divergence on unicode whitespace: fast path keeps NBSP,
    # oracle (and the byte-identity UDF) collapses it
    assert got[-1] == nbsp
    assert whitespace_clean(nbsp) == "a b"
    udf_got = (
        spark.createDataFrame([(nbsp,)], "s string")
        .select(clean_text_udf(F.col("s")).alias("c"))
        .collect()[0]["c"]
    )
    assert udf_got == "a b"  # the invariant-bearing path handles unicode ws
