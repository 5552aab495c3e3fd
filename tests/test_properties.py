"""Hypothesis property tests for core engine invariants.

Each property runs real Spark jobs, so example counts are deliberately
small — the value is randomized STRUCTURE (graph shapes, token
distributions, batch splits), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=0, max_size=60
    )
)
def test_connected_components_match_union_find(spark, edges):
    from palimpzest_spark.functions.graph import connected_components

    from tests.test_graph import _uf_components

    if not edges:
        return
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    expect = _uf_components(edges)
    for algo in ("minlabel", "star"):
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, algorithm=algo, max_iter=50).collect()
        }
        assert got == expect, algo


@settings(**_SETTINGS)
@given(
    tokens=st.lists(st.integers(1, 200), min_size=1, max_size=60),
    budget=st.integers(16, 160),
)
def test_packing_invariants(spark, tokens, budget):
    """Every doc exactly once; no bin over budget unless it is a single
    oversized doc; bin stats consistent."""
    from palimpzest_spark.functions.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], ["doc_id", "n_tokens"]
    )
    out = pack_sequences(df, "doc_id", "n_tokens", budget=budget, n_groups=1).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(tokens)))
    by_bin: dict[int, list] = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for rows in by_bin.values():
        total = sum(r["n_tokens"] for r in rows)
        assert all(r["bin_tokens"] == total for r in rows)
        assert all(r["bin_docs"] == len(rows) for r in rows)
        if total > budget:
            assert len(rows) == 1  # oversized docs get singleton bins

@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(split=st.integers(1, 5), seed=st.integers(0, 10_000))
def test_lww_replay_final_state_independent_of_batch_split(
    spark, tmp_path_factory, split, seed
):
    """Exactly-once + LWW: the final table state must not depend on how the
    same feed files are grouped into microbatches."""
    import pandas as pd

    from palimpzest_spark.cdc import feedgen
    from palimpzest_spark.cdc.lake import SnapshotLakeTable
    from palimpzest_spark.cdc.merge import bootstrap
    from palimpzest_spark.cdc.runner import replay_batches

    def run(files_per_batch: int) -> pd.DataFrame:
        d = str(tmp_path_factory.mktemp("lww"))
        base = feedgen.gen_base_table(
            f"{d}/base", n_convs=15, max_turns=5, seed=seed
        )
        feedgen.gen_change_feed(
            f"{d}/feed", n_events=300, n_convs=15, max_turns=5, n_files=5, seed=seed
        )
        table = SnapshotLakeTable(f"{d}/lake", n_buckets=4)
        bootstrap(spark, table, base)
        replay_batches(spark, table, f"{d}/feed", files_per_batch=files_per_batch)
        return (
            table.read(spark)
            .select("conv_id", "turn_idx", "role", "text")
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )

    one = run(5)  # all files in one batch
    other = run(split)
    pd.testing.assert_frame_equal(one.reset_index(drop=True), other.reset_index(drop=True))


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10_000), frac=st.floats(0.1, 0.9))
def test_ts_range_read_equals_full_filter(spark, tmp_path_factory, seed, frac):
    """Zone-map pruned time-range reads must equal the unpruned filter for
    arbitrary replay seeds and range widths, before and after a forced
    ts-sorted rewrite."""
    import datetime

    from palimpzest_spark.cdc import feedgen
    from palimpzest_spark.cdc.lake import SnapshotLakeTable
    from palimpzest_spark.cdc.merge import bootstrap
    from palimpzest_spark.cdc.runner import replay_batches

    d = str(tmp_path_factory.mktemp("zm"))
    base = feedgen.gen_base_table(f"{d}/base", n_convs=15, max_turns=5, seed=seed)
    feedgen.gen_change_feed(
        f"{d}/feed", n_events=400, n_convs=15, max_turns=5, n_files=2, seed=seed
    )
    table = SnapshotLakeTable(f"{d}/lake", n_buckets=4)
    bootstrap(spark, table, base)
    replay_batches(spark, table, f"{d}/feed", files_per_batch=1)

    full = table.read(spark)
    lo, hi = full.agg(F.min("ts"), F.max("ts")).first()
    if lo is None:
        return
    us = datetime.timedelta(microseconds=1)
    epoch = datetime.datetime(1970, 1, 1, tzinfo=lo.tzinfo)
    lo_us = (lo - epoch) // us
    hi_us = lo_us + int(((hi - epoch) // us - lo_us) * frac)

    def check():
        got = sorted(map(tuple, table.read_ts_range(spark, lo_us, hi_us).collect()))
        want = sorted(
            map(
                tuple,
                full.filter(
                    (F.col("ts") >= F.timestamp_micros(F.lit(lo_us)))
                    & (F.col("ts") <= F.timestamp_micros(F.lit(hi_us)))
                ).collect(),
            )
        )
        assert got == want

    check()
    table.compact(spark, buckets=list(range(4)))
    check()
