"""Unit gates for range_join (chunked equi-join formulation vs the naive
nested-loop ground truth, incl. chunk-boundary and end-inclusivity cases)
and deterministic sampling (cross-run stability, partitioning invariance,
statistical sanity). Oracle parity for the driver queries lives in
test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from palimpzest_spark.functions.sampling import (
    bernoulli_sample,
    deterministic_topk_sample,
    hash_threshold,
    stratified_sample,
    weighted_mixture,
)
from palimpzest_spark.operators.join import range_join

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def pts_and_ivals(spark):
    # points at awkward offsets incl. exact chunk boundaries (chunk=600s=10min)
    pts = spark.createDataFrame(
        [(i, _ts(m)) for i, m in enumerate([0, 5, 9.999, 10, 17, 30, 59, 60, 61, 120])],
        "pid long, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [
            (0, _ts(0), _ts(10)),     # aligned to chunks
            (1, _ts(5), _ts(15)),     # straddles a chunk boundary
            (2, _ts(9), _ts(9.5)),    # sub-chunk sliver
            (3, _ts(59), _ts(61)),    # straddles the hour
            (4, _ts(200), _ts(210)),  # matches nothing
        ],
        "wid long, ws timestamp, we timestamp",
    )
    return pts, ivals


def _pairs(df):
    return sorted((r["pid"], r["wid"]) for r in df.select("pid", "wid").collect())


@pytest.mark.parametrize("inclusive", [False, True])
def test_range_join_equals_naive_nested_loop(spark, pts_and_ivals, inclusive):
    pts, ivals = pts_and_ivals
    got = range_join(pts, ivals, "ts", "ws", "we", chunk_seconds=600,
                     end_inclusive=inclusive)
    upper = F.col("ts") <= F.col("we") if inclusive else F.col("ts") < F.col("we")
    want = pts.crossJoin(ivals).filter((F.col("ts") >= F.col("ws")) & upper)
    assert _pairs(got) == _pairs(want)
    assert len(_pairs(got)) > 0


def test_range_join_no_duplicate_pairs_when_interval_spans_chunks(spark, pts_and_ivals):
    pts, ivals = pts_and_ivals
    # tiny chunks force every interval across many chunks: each qualifying
    # (point, interval) pair must still appear exactly once
    got = _pairs(range_join(pts, ivals, "ts", "ws", "we", chunk_seconds=60))
    assert len(got) == len(set(got))
    want = _pairs(
        pts.crossJoin(ivals).filter((F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we")))
    )
    assert got == want


def test_hash_threshold_bounds():
    assert hash_threshold(0.0) == "00000000"
    # 1.0 sorts above EVERY 8-hex-digit bucket: a 100% sample keeps the
    # bucket-0xffffffff rows that a clamped 'ffffffff' + strict < dropped
    assert hash_threshold(1.0) == "g"
    assert "ffffffff" < hash_threshold(1.0)
    assert hash_threshold(0.2) == "33333333"
    with pytest.raises(ValueError):
        hash_threshold(1.5)


def test_bernoulli_deterministic_and_partitioning_invariant(spark):
    df1 = spark.range(0, 20000).withColumnRenamed("id", "k")
    df64 = df1.repartition(64)
    a = sorted(r["k"] for r in bernoulli_sample(df1, "k", 0.1).collect())
    b = sorted(r["k"] for r in bernoulli_sample(df64, "k", 0.1).collect())
    assert a == b, "sample must not depend on partition layout"
    # statistical sanity: 10% of 20k, ±5 sigma of binomial
    assert abs(len(a) - 2000) < 5 * (20000 * 0.1 * 0.9) ** 0.5
    # salted sample is a different (near-independent) draw
    c = set(r["k"] for r in bernoulli_sample(df1, "k", 0.1, salt="x").collect())
    assert set(a) != c


def test_stratified_rates_per_stratum(spark):
    df = spark.range(0, 30000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("s")
    )
    out = stratified_sample(df, "k", "s", {"0": 1.0, "1": 0.2}).groupBy("s").count()
    counts = {r["s"]: r["count"] for r in out.collect()}
    assert counts.get("0", 0) >= 9990  # ~100% (short of the ffffffff edge)
    assert abs(counts.get("1", 0) - 2000) < 5 * (10000 * 0.2 * 0.8) ** 0.5
    assert "2" not in counts  # default fraction 0


def test_topk_exact_k_and_uniformity(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    got = [r["k"] for r in deterministic_topk_sample(df, "k", 100).collect()]
    assert len(got) == len(set(got)) == 100
    again = [r["k"] for r in deterministic_topk_sample(df.repartition(32), "k", 100).collect()]
    assert got == again
    # uniform over the range: mean of a 100-sample from [0,10000) within 5 sigma
    mean = sum(got) / len(got)
    assert abs(mean - 5000) < 5 * (10000 / 12**0.5) / 10


def test_weighted_mixture_tags_and_rates(spark):
    a = spark.range(0, 10000).withColumnRenamed("id", "k")
    b = spark.range(10000, 20000).withColumnRenamed("id", "k")
    out = weighted_mixture([(a, 0.5), (b, 0.1)], "k").groupBy("mix_source").count()
    counts = {r["mix_source"]: r["count"] for r in out.collect()}
    assert abs(counts[0] - 5000) < 5 * (10000 * 0.25) ** 0.5
    assert abs(counts[1] - 1000) < 5 * (10000 * 0.1 * 0.9) ** 0.5
