"""Positional phrase search: exact occurrences, overlaps, and validation
short-circuits."""

from __future__ import annotations

from clip_as_service_spark.operators import phrase


def _matches(spark, rows, terms):
    df = spark.createDataFrame(rows, "id long, text string")
    pos = phrase.token_positions(df, "id", "text")
    return {
        (r["id"], r["start_pos"])
        for r in phrase.phrase_positions(pos, terms).collect()
    }


def test_phrase_exact_and_multiple_occurrences(spark):
    rows = [
        (1, "a b c a b c"),       # "a b" at 0 and 3
        (2, "a c b"),             # no "a b"
        (3, "b a b"),             # "a b" at 1
        (4, "a"),                 # shorter than the phrase
    ]
    assert _matches(spark, rows, ["a", "b"]) == {(1, 0), (1, 3), (3, 1)}


def test_phrase_overlapping_matches(spark):
    # "a a a" contains "a a" at 0 AND 1 — overlaps must both count
    assert _matches(spark, [(1, "a a a")], ["a", "a"]) == {(1, 0), (1, 1)}


def test_phrase_three_terms_and_order_sensitivity(spark):
    rows = [(1, "x hash join table y"), (2, "join hash table")]
    assert _matches(spark, rows, ["hash", "join", "table"]) == {(1, 1)}


def test_phrase_empty_and_oov(spark):
    rows = [(1, "a b c")]
    assert _matches(spark, rows, []) == set()
    assert _matches(spark, rows, ["zzz"]) == set()
