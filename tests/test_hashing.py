"""Pure-Python xxhash64 must match Spark's F.xxhash64 bit-for-bit."""

from pyspark.sql import functions as F

from clip_as_service_spark.functions.hashing import term_shard, xxhash64_signed

SAMPLES = [
    "", "a", "ab", "abc", "abcd", "abcde", "hello", "the", "world!",
    "café", "中文文本", "x" * 31, "y" * 32, "z" * 100,
    "<|startoftext|>", "'ll", "7",
]


def test_matches_spark_xxhash64(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert xxhash64_signed(r["s"].encode("utf-8")) == r["h"], r["s"]


def test_term_shard_matches_spark(spark):
    n_shards = 16
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select(
        "s", F.pmod(F.xxhash64("s"), F.lit(n_shards)).cast("int").alias("shard")
    ).collect()
    for r in rows:
        assert term_shard(r["s"], n_shards) == r["shard"], r["s"]
