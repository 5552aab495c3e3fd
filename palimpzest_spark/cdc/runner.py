"""Replay drivers: batch-mode (bench) and Structured Streaming (resumable).

Streaming path (the production shape): ``readStream`` over the feed directory
→ ``foreachBatch(merge_batch)`` with a checkpoint location. Exactly-once =
source offsets in the streaming checkpoint + the batch-id idempotence gate in
the snapshot commit (``merge.py`` step 1) — a batch replayed after a kill is
skipped, which is the standard foreachBatch idempotent-sink contract.

Batch path: the same merge_batch applied to explicit file groups — used by
the throughput bench (no streaming scheduler overhead in the measurement).

Also exposes a ``spark-submit`` CLI:

    spark-submit --py-files palimpzest_spark.zip -m ... cdc/runner.py \
        --feed DIR --table DIR [--stream --checkpoint DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from palimpzest_spark.cdc.lake import SnapshotLakeTable
from palimpzest_spark.cdc.merge import bootstrap, merge_batch

FEED_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_seq", T.LongType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _metrics_path(table: SnapshotLakeTable) -> str:
    return os.path.join(table.root, "metrics.jsonl")


def _emit(table: SnapshotLakeTable, m: dict[str, Any]) -> None:
    with open(_metrics_path(table), "a") as f:
        f.write(json.dumps(m) + "\n")


def _apply_quarantine(batch, rules, dead_letter_dir, batch_id):
    """Split a microbatch through the data-quality gates; violating change
    events go to the dead-letter sink (append-mode parquet, labeled with
    the offending rules and the batch id) instead of poisoning the merge.
    Returns (clean_batch, quarantined_count)."""
    from pyspark.sql import functions as F

    from palimpzest_spark.functions.quality import quarantine

    clean, bad = quarantine(batch, rules)
    bad = bad.persist()
    n_bad = bad.count()
    if n_bad and dead_letter_dir:
        (
            bad.withColumn("_violated", F.array_join("_violated", ";"))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(dead_letter_dir)
        )
    bad.unpersist()
    return clean, n_bad


def replay_batches(
    spark: SparkSession,
    table: SnapshotLakeTable,
    feed_dir: str,
    files_per_batch: int = 4,
    start_batch_id: int = 0,
    max_batches: int | None = None,
    skip_files: int = 0,
    quarantine_rules: list | None = None,
    dead_letter_dir: str | None = None,
    writer_id: str | None = None,
) -> list[dict[str, Any]]:
    """Batch-mode replay: feed files grouped in order → merge_batch each.
    ``skip_files`` drops the first N feed files (tail-only replay: the
    scaling harness replays a feed prefix into its template once, then
    measures only the remaining steady-tail files). ``quarantine_rules``
    (functions/quality rule tuples over the feed envelope) splits
    violating events to ``dead_letter_dir`` before each merge.
    ``writer_id`` namespaces the idempotence watermark so multiple
    concurrent replays (one per feed shard) can share one table — each
    writer's batch ids advance independently and commit races are
    serialized by the snapshot CAS (merge_batch re-plans and retries)."""
    files = sorted(glob.glob(os.path.join(feed_dir, "feed-*.parquet")))[skip_files:]
    groups = [files[i : i + files_per_batch] for i in range(0, len(files), files_per_batch)]
    out = []
    for i, group in enumerate(groups):
        if max_batches is not None and i >= max_batches:
            break
        batch = spark.read.schema(FEED_SCHEMA).parquet(*group)
        bid = start_batch_id + i
        n_bad = 0
        if quarantine_rules:
            batch, n_bad = _apply_quarantine(
                batch, quarantine_rules, dead_letter_dir, bid
            )
        m = merge_batch(spark, table, batch, batch_id=bid, writer_id=writer_id)
        m["quarantined"] = n_bad
        _emit(table, m)
        out.append(m)
    return out


def replay_stream(
    spark: SparkSession,
    table: SnapshotLakeTable,
    feed_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    max_batches: int | None = None,
    quarantine_rules: list | None = None,
    dead_letter_dir: str | None = None,
    writer_id: str | None = None,
) -> list[dict[str, Any]]:
    """Structured Streaming replay with checkpoint resume.

    ``max_batches`` stops the query after N microbatches (the kill/resume
    test); a later call with the same checkpoint continues from the next
    unprocessed file and converges to the same final state.
    ``quarantine_rules`` gates each microbatch inside foreachBatch, same
    contract as replay_batches. ``writer_id`` namespaces the idempotence
    watermark exactly as in ``replay_batches`` — one streaming query per
    feed shard, N shards sharing one table. (Each shard needs its OWN
    checkpoint dir: the checkpoint tracks that query's source offsets,
    while exactly-once against the TABLE rides the per-writer txn
    watermark + commit CAS, the Iceberg/Delta idempotent-sink contract.)
    """
    metrics: list[dict[str, Any]] = []
    reader = spark.readStream.schema(FEED_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)

    def apply(batch_df, batch_id: int) -> None:
        n_bad = 0
        if quarantine_rules:
            batch_df, n_bad = _apply_quarantine(
                batch_df, quarantine_rules, dead_letter_dir, batch_id
            )
        m = merge_batch(spark, table, batch_df, batch_id, writer_id=writer_id)
        m["quarantined"] = n_bad
        _emit(table, m)
        metrics.append(m)

    q = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        while q.isActive:
            if max_batches is not None and len(metrics) >= max_batches:
                q.stop()  # simulated kill mid-stream
                break
            time.sleep(0.2)
        q.awaitTermination(600)
    finally:
        if q.isActive:
            q.stop()
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser(description="CDC replay: change feed -> lake table")
    ap.add_argument("--feed", help="change-feed directory (omit for --maintenance-only)")
    ap.add_argument("--table", required=True)
    ap.add_argument("--maintenance", choices=["compact", "expire", "both"],
                    help="table maintenance instead of (or after) a replay: "
                         "compact = fold merge-on-read deltas into bases; "
                         "expire = drop old snapshots + GC unreferenced files")
    ap.add_argument("--keep-last", type=int, default=5,
                    help="snapshots retained by --maintenance expire")
    ap.add_argument("--rebucket", type=int, default=0,
                    help="evolve the table to this hash-bucket count "
                         "(full rewrite; lake.rebucket — run as the table "
                         "outgrows its bucket size, e.g. from "
                         "suggest_n_buckets on current table bytes)")
    ap.add_argument("--base", help="base conversations parquet to bootstrap from")
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--checkpoint")
    ap.add_argument("--buckets", type=int, default=16,
                    help="0 = auto-size from the base table bytes "
                         "(lake.suggest_n_buckets, ~256MB/bucket)")
    ap.add_argument("--files-per-batch", type=int, default=4)
    ap.add_argument("--quarantine-rules",
                    help="JSON file of quality-rule tuples over the feed "
                         "envelope, e.g. [[\"not_null\", \"conv_id\"], "
                         "[\"accepted_values\", \"op\", [\"I\",\"U\",\"D\"]]]; "
                         "violating events skip the merge")
    ap.add_argument("--dead-letter",
                    help="parquet dir receiving quarantined events "
                         "(labeled with rule names + batch id)")
    ap.add_argument("--writer-id",
                    help="namespace for the idempotence watermark (per-writer "
                         "txn map) — pass a distinct id per concurrent feed "
                         "shard writing the same table")
    args = ap.parse_args()

    rules = None
    if args.quarantine_rules:
        with open(args.quarantine_rules) as f:
            rules = [tuple(r) for r in json.load(f)]

    from palimpzest_spark.session import get_spark

    spark = get_spark(app_name="cdc_replay")
    n_buckets = args.buckets
    if n_buckets == 0:
        from palimpzest_spark.cdc.lake import suggest_n_buckets

        est = os.path.getsize(args.base) * 3 if args.base else 1 << 30
        n_buckets = suggest_n_buckets(est)
    table = SnapshotLakeTable(args.table, n_buckets=n_buckets)
    if args.base and table.current_version() == 0:
        bootstrap(spark, table, args.base)
    out: dict = {}
    if args.feed:
        if args.stream:
            if not args.checkpoint:
                ap.error("--stream requires --checkpoint")
            ms = replay_stream(
                spark, table, args.feed, args.checkpoint,
                quarantine_rules=rules, dead_letter_dir=args.dead_letter,
                writer_id=args.writer_id,
            )
        else:
            ms = replay_batches(
                spark, table, args.feed, args.files_per_batch,
                quarantine_rules=rules, dead_letter_dir=args.dead_letter,
                writer_id=args.writer_id,
            )
        total = sum(m["events"] for m in ms)
        secs = sum(m["elapsed_sec"] for m in ms)
        out.update({"batches": len(ms), "events": total, "elapsed_sec": round(secs, 3),
                    "events_per_sec": round(total / secs, 1) if secs else None})
        if rules:
            out["quarantined"] = sum(m.get("quarantined", 0) for m in ms)
    elif not args.maintenance and not args.rebucket:
        ap.error("nothing to do: pass --feed, --maintenance, and/or --rebucket")
    if args.rebucket:
        out["rebucketed_to_version"] = table.rebucket(spark, args.rebucket)
        out["n_buckets"] = table.n_buckets
    # advisory: when the table has outgrown its bucket count (avg base file
    # drifting past the 128-512 MB sweet spot), surface the suggested count —
    # driver-side manifest arithmetic, no job; apply with --rebucket N
    from palimpzest_spark.cdc.lake import suggest_n_buckets as _suggest

    tbytes = sum(
        int(s.get("bytes", 0)) for s in table.snapshot()["filestats"].values()
    )
    sug = _suggest(tbytes)
    if sug > table.n_buckets * 2:
        out["rebucket_suggested"] = sug
    # inverse envelope check (BENCH/BASELINE.md "bucket-count operating
    # envelope"): per-batch merge cost has a term linear in touched buckets
    # (file + footer + manifest + task each), so microbatches must carry
    # enough rows per bucket to amortize it — surface a warning when the
    # feed's batch size is ~2 orders under the bucket count
    if args.feed and out.get("batches"):
        rows_per_bucket = out["events"] / max(out["batches"], 1) / table.n_buckets
        if rows_per_bucket < 10:
            out["bucket_envelope_warning"] = (
                f"~{rows_per_bucket:.1f} events/bucket/batch — per-bucket "
                f"file overhead dominates; use bigger microbatches "
                f"(--files-per-batch / trigger interval) or fewer buckets "
                f"for this table size"
            )
    if args.maintenance in ("compact", "both"):
        v = table.compact(spark)
        out["compacted_to_version"] = v
    if args.maintenance in ("expire", "both"):
        from palimpzest_spark.cdc.timetravel import expire_snapshots

        out["expire"] = expire_snapshots(table, keep_last=args.keep_last)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
