"""Lexical retrieval: BM25 scoring over a document corpus.

The standard keyword-search scorer (Robertson/Sparck Jones; the Lucene
variant of the idf), complementing the embedding tiers in
``functions/similarity.py`` — a training-data pipeline uses lexical
retrieval for targeted corpus slicing (find all docs about X) where
embeddings are overkill or unavailable.

Scale shape: ONE corpus scan. Corpus statistics (N, avg doc length,
per-term document frequencies) come from a single aggregate that is
broadcast back across the corpus — no shuffle of the documents
themselves, no inverted-index materialization needed for scoring (an
index only accelerates candidate selection; at 100 TB add a
``block_col``/index probe in front, the scorer is unchanged). The
per-document score is a FIXED-ORDER sum over the query terms, so results
are bit-deterministic across partitionings and engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag of query ``terms``.

    score(d) = sum_t idf(t) * tf_td*(k1+1) / (tf_td + k1*(1 - b + b*dl/avgdl))
    with the Lucene idf: ln(1 + (N - df_t + 0.5)/(df_t + 0.5)).

    Returns (id_col, score) with score HALF_UP-rounded to 4dp, ordered
    (score DESC, id ASC). Terms are matched as whole whitespace tokens of
    the lowercased text (the same tokenizer every text op in this engine
    uses). Duplicate query terms contribute once per occurrence.
    """
    base = df.select(
        F.col(id_col), _tokens(text_col).alias("_toks")
    ).withColumn("_dl", F.size("_toks").cast("double"))

    aggs = [
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    ]
    for i, t in enumerate(terms):
        aggs.append(
            F.sum(
                F.when(F.array_contains("_toks", t.lower()), F.lit(1)).otherwise(0)
            ).cast("double").alias(f"_df{i}")
        )
    stats = base.agg(*aggs)

    scored = base.crossJoin(F.broadcast(stats))
    score: Column = F.lit(0.0)
    for i, t in enumerate(terms):
        tl = F.lit(t.lower())
        tf = F.size(F.filter("_toks", lambda x: x == tl)).cast("double")  # noqa: B023
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
    return (
        scored.withColumn("_score", score)
        .select(
            id_col,
            (F.floor(F.col("_score") * 10000.0 + 0.5) / 10000.0).alias("score"),
            F.col("_score").alias("_raw"),
        )
        .orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .drop("_raw")
    )


def bm25_topk_exact_py(
    rows: list[tuple[object, str]],
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[object, float]]:
    """Driver-side reference implementation for tests (same math, plain
    Python) — NOT for production data sizes."""
    toks = {i: t.lower().strip().split() for i, t in rows}
    n = float(len(rows))
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {
        t: float(sum(1 for v in toks.values() if t.lower() in v)) for t in terms
    }
    out = []
    for i, _ in rows:
        dl = float(len(toks[i]))
        s = 0.0
        for t in terms:
            tf = float(toks[i].count(t.lower()))
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s = s + idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        out.append((i, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return [(i, math.floor(s * 10000.0 + 0.5) / 10000.0) for i, s in out[:k]]


def write_token_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Materialize an inverted index partitioned BY TOKEN HASH BUCKET — the
    100 TB candidate-selection front for :func:`bm25_topk` (same discipline
    as ``similarity.write_lsh_index``): postings are (token, doc id, term
    frequency) rows laid out so a term lookup becomes parquet partition
    pruning touching ~1/n_buckets of the index. Nothing but (token, id, tf)
    is stored — document text never enters the index."""
    postings = (
        corpus.select(F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("_tb", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)).cast("int"))
    )
    postings.write.mode("overwrite").partitionBy("_tb").parquet(path)
    import json

    # the meta sidecar goes through the SAME Hadoop filesystem as the
    # parquet write — a local open() next to an s3://... or hdfs://... index
    # would fail on the driver and make the index unusable off-box
    _hadoop_write_text(
        corpus.sparkSession, path + "/_index_meta.json",
        json.dumps({"n_buckets": n_buckets}),
    )


def _hadoop_write_text(spark, path: str, text: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _hadoop_read_text(spark, path: str) -> str:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        # drain via Hadoop's own IOUtils.copyBytes into a JDK
        # ByteArrayOutputStream (py4j copies byte[] RETURN values back to
        # Python, while byte[] ARGUMENTS are pass-by-value — a readFully
        # into a Python bytearray would silently stay zeroed). commons-io
        # ships with today's Spark distros but is a transitive dependency,
        # not a contract (r6 ADVICE) — only guaranteed classes here.
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def token_index_lookup(
    spark,
    path: str,
    terms: list[str],
    mode: str = "any",
) -> DataFrame:
    """Doc ids matching the terms via the partitioned inverted index.

    ``mode='any'`` (OR) returns ids with at least one term; ``'all'`` (AND)
    intersects via a postings count. The scan carries an ``_tb IN (...)``
    predicate over the partition column, so only the probed term buckets'
    files are read (assert-tested via inputFiles)."""
    import json

    # driver-side XXH64 (bit-identical to F.xxhash64 on strings — parity
    # pinned in tests/test_table_properties.py): hashing a handful of term
    # literals through createDataFrame().collect() cost ~1s of driver
    # latency per lookup, ~10x the pruned scan itself (same fix as the CDC
    # point-lookup path, cdc/lake.py::bucket_of)
    from palimpzest_spark.cdc.lake import bucket_of

    lows = sorted({t.lower() for t in terms})
    idx = spark.read.parquet(path)
    n_buckets = json.loads(_hadoop_read_text(spark, path + "/_index_meta.json"))[
        "n_buckets"
    ]
    buckets = sorted({bucket_of(t, n_buckets) for t in lows})
    hits = idx.filter(F.col("_tb").isin(buckets)).filter(F.col("tok").isin(lows))
    if mode == "any":
        return hits.select("id").distinct()
    if mode == "all":
        return (
            hits.groupBy("id")
            .agg(F.countDistinct("tok").alias("_k"))
            .filter(F.col("_k") == len(lows))
            .select("id")
        )
    raise ValueError(f"unknown mode: {mode}")
