"""clip_as_service_spark — a PySpark-native fulltext (inverted-index + BM25)
analytics engine with the query/data-processing capabilities of
jina-ai/clip-as-service, re-expressed Spark-first.

The reference (/root/reference, clip-as-service v0.8.4) is a client-server
encode→rank/search loop over nested Documents. This engine carries over its
query semantics — deterministic text normalization/tokenization
(server/clip_server/model/simple_tokenizer.py:58-143), batched per-document
transformation (executors/clip_torch.py:181-212), scored top-k retrieval with
descending sort + stable identity guarantees (executors/helper.py:89-124),
sharded scatter-gather search (docs/user-guides/retriever.md:178-225), and an
index-then-search lifecycle — as idiomatic Spark DataFrame programs:

- ``textnorm``   — vendored normalization/tokenization oracle (pure Python)
- ``functions``  — Spark-side text/scoring/codec functions (built-ins first,
                   Arrow-vectorized pandas UDFs only where semantics demand)
- ``operators``  — tokenize, index build, BM25 top-k search, WAND, dedup,
                   similarity search, text analysis
- ``sources``    — table I/O (parquet layout now, Iceberg-ready interface)
- ``oracle``     — single-node numpy brute-force BM25 judge
- ``fixtures``   — deterministic synthetic pages/queries (FIXTURES.md)
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
