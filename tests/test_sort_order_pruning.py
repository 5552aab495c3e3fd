"""Key zone maps + sort-order file skipping for point lookups.

The CDC read paths prune at three granularities: bucket hash (read_conv),
per-file ts zone maps (read_ts_range), and — new in round 5 — per-file
conv_id zone maps (``cv_min``/``cv_max`` from parquet footer statistics).
Key pruning is safe under merge-on-read because conv_id is the LWW fold
KEY: a file holding none of the requested keys contributes nothing to
their fold, so base and delta files are both skippable (unlike ts pruning,
which must read delta-carrying buckets whole). ``sort_order="key"``
(Iceberg SortOrder analog) clusters compaction output on (conv_id,
turn_idx) so BASE files get narrow key ranges and point lookups skip them;
the default "ts" order keeps time-sliced bases for read_ts_range.

Reference: palimpzest has no lake read path; the discipline follows the
public Iceberg sort-order/data-skipping design (cited in cdc/lake.py).
"""

from __future__ import annotations

import json as _json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palimpzest_spark.cdc import feedgen
from palimpzest_spark.cdc import lake as lake_mod
from palimpzest_spark.cdc.lake import SnapshotLakeTable
from palimpzest_spark.cdc.merge import bootstrap
from palimpzest_spark.cdc.runner import replay_batches


def _write_feed(path: str, rows: list[tuple]) -> None:
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "op": pa.array(cols[0], pa.string()),
                "conv_id": pa.array(cols[1], pa.string()),
                "turn_idx": pa.array(cols[2], pa.int64()),
                "payload": pa.array(cols[3], pa.string()),
                "ts": pa.array(
                    [feedgen.BASE_EPOCH + t for t in cols[4]], pa.timestamp("s")
                ).cast(pa.timestamp("us")),
                "event_seq": pa.array(cols[5], pa.int64()),
                "partition": pa.array(cols[6], pa.int32()),
                "offset": pa.array(cols[7], pa.int64()),
            }
        ),
        path,
    )


def _ev(op, conv, turn, text, ts_s, seq, part=0, off=0):
    payload = None if op == "D" else _json.dumps(
        {"conv_id": conv, "turn_idx": turn, "role": "user", "text": text,
         "tool": None}
    )
    return (op, conv, turn, payload, ts_s, seq, part, off)


def _conv(i: int) -> str:
    return f"conv-{i:08d}"


@pytest.fixture()
def one_bucket_table(spark, tmp_path):
    """A single-bucket table (so all pruning below is SUB-bucket) built from
    two insert batches over disjoint conversation sets."""
    d = tmp_path / "t"
    d.mkdir()
    # base much bigger than each batch so plan_compaction picks merge-on-read
    # (delta files), not inline copy-on-write
    base = feedgen.gen_base_table(str(d / "base"), n_convs=200, max_turns=2, seed=7)
    feed = d / "feed"
    feed.mkdir()
    # batch 0: convs 100-119; batch 1: convs 200-219 — disjoint key ranges
    _write_feed(
        str(feed / "feed-00000.parquet"),
        [_ev("I", _conv(100 + i), 0, f"a{i}", 1_000 + i, i, 0, i) for i in range(20)],
    )
    _write_feed(
        str(feed / "feed-00001.parquet"),
        [_ev("I", _conv(200 + i), 0, f"b{i}", 2_000 + i, 100 + i, 0, 100 + i)
         for i in range(20)],
    )
    table = SnapshotLakeTable(str(d / "lake"), n_buckets=1, sort_order="key")
    bootstrap(spark, table, base)
    replay_batches(spark, table, str(feed), files_per_batch=1)
    return table


def test_delta_files_pruned_by_key_zone_map(spark, one_bucket_table):
    """A point lookup for a batch-1 conversation skips batch-0's delta file
    (each delta file's cv_* map covers only its own batch's convs) — this
    works under ANY sort order, with no compaction."""
    t = one_bucket_table
    snap = t.snapshot()
    assert snap["deltas"]["0"], "fixture should be merge-on-read"
    paths, skipped = t._conv_prune(snap, [0], [_conv(205)])
    assert skipped >= 1, "batch-0 delta file should be zone-map skipped"
    out = t.read_conv(spark, [_conv(205)]).collect()
    assert [(r["conv_id"], r["text"]) for r in out] == [(_conv(205), "b5")]


def test_key_sorted_compaction_prunes_base_files(spark, one_bucket_table, monkeypatch):
    """After a key-sorted compaction split into several files, a point
    lookup reads a strict subset of the bucket's base files, and results
    match the unpruned full read."""
    t = one_bucket_table
    monkeypatch.setattr(lake_mod, "COMPACT_MIN_RECORDS_PER_FILE", 12)
    t.compact(spark)
    snap = t.snapshot()
    base_files = snap["files"]["0"]
    assert not snap["deltas"]["0"] and len(base_files) >= 2
    # every base file now carries a key zone map, ranges non-overlapping-ish
    for rel in base_files:
        st = snap["filestats"][rel]
        assert "cv_min" in st and "cv_max" in st
    probe = _conv(205)
    paths, skipped = t._conv_prune(snap, [0], [probe])
    assert skipped >= 1 and len(paths) < len(base_files)
    got = t.read_conv(spark, [probe]).collect()
    assert [(r["conv_id"], r["text"]) for r in got] == [(probe, "b5")]
    # full-table read agrees with per-conv lookups for every conversation
    full = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(spark).collect()
    }
    for cid in (_conv(104), _conv(212)):
        rows = t.read_conv(spark, [cid]).collect()
        assert {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows} == {
            k: v for k, v in full.items() if k[0] == cid
        }


def test_point_lookup_tombstone_not_resurrected(spark, tmp_path):
    """read_conv pushes the key filter BELOW the LWW fold (scan-level
    pushdown); the tombstone filter must stay above it — a delete arriving
    in a delta file must suppress the base row, and an out-of-order older
    update must not resurrect it."""
    d = tmp_path / "t"
    d.mkdir()
    base = feedgen.gen_base_table(str(d / "base"), n_convs=60, max_turns=2, seed=3)
    feed = d / "feed"
    feed.mkdir()
    victim = _conv(7)  # exists in the base table
    _write_feed(
        str(feed / "feed-00000.parquet"),
        [_ev("D", victim, 0, "", 5_000_000, 500)]
        + [_ev("I", _conv(300 + i), 0, f"n{i}", 5_100_000 + i, 600 + i, 0, i + 1)
           for i in range(10)],
    )
    _write_feed(
        str(feed / "feed-00001.parquet"),
        [_ev("U", victim, 0, "zombie", 4_000_000, 400)],  # older than the delete
    )
    t = SnapshotLakeTable(str(d / "lake"), n_buckets=2)
    bootstrap(spark, t, base)
    replay_batches(spark, t, str(feed), files_per_batch=1)
    assert t.has_deltas(), "fixture should exercise the merge-on-read fold"
    rows = t.read_conv(spark, [victim]).collect()
    assert all(r["turn_idx"] != 0 for r in rows), "deleted turn resurrected"
    live = t.read_conv(spark, [_conv(305)]).collect()
    assert [(r["conv_id"], r["text"]) for r in live] == [(_conv(305), "n5")]


def test_fold_skipped_when_scan_has_no_delta_files(spark, tmp_path):
    """A point lookup whose scan keeps only base files (its bucket is
    compacted / its deltas zone-map-pruned) must not pay the LWW-fold
    shuffle, even while OTHER buckets of the table still carry deltas;
    a lookup that does scan a delta file still folds."""
    from pyspark.sql import functions as F

    d = tmp_path / "t"
    d.mkdir()
    base = feedgen.gen_base_table(str(d / "base"), n_convs=120, max_turns=2, seed=11)
    t = SnapshotLakeTable(str(d / "lake"), n_buckets=2)
    bootstrap(spark, t, base)
    # find two base convs hashing to different buckets
    ids = [_conv(i) for i in range(120)]
    df = spark.createDataFrame([(c,) for c in ids], "conv_id string").select(
        "conv_id", F.pmod(F.xxhash64("conv_id"), F.lit(2)).cast("int").alias("b")
    )
    by_bucket = {r["b"]: r["conv_id"] for r in df.collect()}
    dirty, clean = by_bucket[0], by_bucket[1]
    # one update batch touching ONLY the bucket-0 conv
    feed = d / "feed"
    feed.mkdir()
    _write_feed(
        str(feed / "feed-00000.parquet"),
        [_ev("U", dirty, 0, "updated", 9_000_000, 900)],
    )
    replay_batches(spark, t, str(feed), files_per_batch=1)
    snap = t.snapshot()
    assert snap["deltas"].get("0") and not snap["deltas"].get("1")

    def _plan(df):
        return df._jdf.queryExecution().analyzed().toString()

    q_clean = t.read_conv(spark, [clean])
    assert "max_by" not in _plan(q_clean), "delta-free lookup paid the fold"
    assert q_clean.count() > 0
    q_dirty = t.read_conv(spark, [dirty])
    assert "max_by" in _plan(q_dirty), "delta-scanning lookup must fold"
    assert [r["text"] for r in q_dirty.collect() if r["turn_idx"] == 0] == ["updated"]


def test_fully_pruned_lookup_returns_public_schema(spark, one_bucket_table):
    """An absent-key lookup whose files are ALL zone-map-pruned (and the
    empty-ids / empty-range branches) must return the same PUBLIC schema as
    every non-empty read — not the stored schema with engine meta columns —
    or downstream unionByName/fixed-schema sinks break exactly and only
    when pruning removes every file."""
    t = one_bucket_table
    present = t.read_conv(spark, [_conv(205)])
    assert present.count() == 1
    # "zzz..." sorts above every cv_max in the table → every file pruned
    absent = t.read_conv(spark, ["zzz-absent"])
    assert absent.columns == present.columns
    assert absent.count() == 0
    assert present.unionByName(absent).count() == 1  # must not raise
    assert t.read_conv(spark, []).columns == present.columns
    # empty ts-range branch: far future, no file overlaps
    rng = t.read_ts_range(spark, 10**15, 10**15 + 1)
    assert rng.columns == present.columns and rng.count() == 0


def test_sort_order_persists_and_alters(tmp_path):
    t = SnapshotLakeTable(str(tmp_path / "lake"), n_buckets=2, sort_order="key")
    t.commit(
        {"files": {}, "deltas": {}, "filestats": {},
         "schema": None, "summary": {"last_batch_id": -1, "offsets": {}}}
    )
    # persisted-wins: a reader opening with the default still sees "key"
    r = SnapshotLakeTable(str(tmp_path / "lake"))
    assert r.sort_order == "key"
    assert r._sort_cols() == ("_bucket", "conv_id", "turn_idx")
    v = r.alter_sort_order("ts")  # metadata-only commit
    assert r.snapshot(v).get("sort_order") == "ts"
    assert SnapshotLakeTable(str(tmp_path / "lake")).sort_order == "ts"
    assert r.alter_sort_order("ts") == v  # no-op, no new version
    with pytest.raises(ValueError):
        r.alter_sort_order("zorder")


def test_conv_prune_is_conservative():
    """Unit boundaries: exact-min/max hits kept, gaps skipped, files with
    no zone map always kept."""
    t = SnapshotLakeTable.__new__(SnapshotLakeTable)  # no disk needed
    snap = {
        "files": {"0": ["f-lo", "f-mid", "f-nostats"]},
        "deltas": {"0": ["d-hi"]},
        "filestats": {
            "f-lo": {"cv_min": "conv-a", "cv_max": "conv-f"},
            "f-mid": {"cv_min": "conv-g", "cv_max": "conv-m"},
            "f-nostats": {"bytes": 1},
            "d-hi": {"cv_min": "conv-n", "cv_max": "conv-z"},
        },
    }
    paths, skipped = t._conv_prune(snap, [0], ["conv-f"])  # == f-lo's max
    assert paths == ["f-lo", "f-nostats"] and skipped == 2
    paths, _ = t._conv_prune(snap, [0], ["conv-g"])  # == f-mid's min
    assert paths == ["f-mid", "f-nostats"]
    paths, _ = t._conv_prune(snap, [0], ["conv-fzz"])  # between f-lo and f-mid
    assert paths == ["f-nostats"]
    paths, skipped = t._conv_prune(snap, [0], ["conv-q", "conv-b"])
    assert set(paths) == {"f-lo", "f-nostats", "d-hi"} and skipped == 1
