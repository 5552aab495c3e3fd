"""Sequence-packing gates: conservation, capacity, determinism, quality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from palimpzest_spark.functions.packing import pack_sequences

BUDGET = 1000


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic skewed token lengths incl. oversized outliers
    return spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (
            (F.pmod(F.xxhash64("id"), F.lit(400)) + 1)
            + F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(97)) == 0, 1500).otherwise(0)
        ).cast("long").alias("n_tokens"),
    )


def test_every_doc_packed_exactly_once(spark, docs):
    out = pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert len(ids) == 5000 and len(set(ids)) == 5000


def test_no_bin_over_budget_except_singletons(spark, docs):
    out = pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    bins = out.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    bad = bins.filter((F.col("tot") > BUDGET) & (F.col("n") > 1)).count()
    assert bad == 0, "multi-doc bin exceeds the token budget"
    # oversized docs exist in the fixture and must land in singleton bins
    single_over = bins.filter((F.col("tot") > BUDGET) & (F.col("n") == 1)).count()
    assert single_over > 0


def test_deterministic_across_partitionings(spark, docs):
    a = pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    b = pack_sequences(docs.repartition(17), "doc_id", "n_tokens", BUDGET, n_groups=8)
    pa = sorted((r["doc_id"], r["bin_id"]) for r in a.collect())
    pb = sorted((r["doc_id"], r["bin_id"]) for r in b.collect())
    assert pa == pb


def test_packing_quality_utilization(spark, docs):
    out = pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    total_tokens = out.agg(F.sum("n_tokens")).collect()[0][0]
    n_bins = out.select("bin_id").distinct().count()
    # FFD with many bins per group: mean fill well above the 50% naive bound
    assert total_tokens / (n_bins * BUDGET) > 0.8, (
        f"utilization {total_tokens / (n_bins * BUDGET):.2f} too low"
    )


def test_string_doc_ids_preserved(spark, docs):
    """ADVICE r2: string ids must flow through untouched — the old long-cast
    nulled them, collapsing every row onto one sort key."""
    sdocs = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"), "n_tokens"
    )
    out = pack_sequences(sdocs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    assert dict(out.dtypes)["doc_id"] == "string"
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert len(ids) == 5000 and len(set(ids)) == 5000
    assert all(i is not None and i.startswith("doc-") for i in ids)
    over = out.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
    ).filter((F.col("tot") > BUDGET) & (F.col("n") > 1)).count()
    assert over == 0
