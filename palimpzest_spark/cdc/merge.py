"""Merge-apply: one change-feed microbatch → the lake table (north rule core).

Per batch:

1. **Idempotence gate** — the snapshot summary records the last committed
   batch id; a replayed batch (checkpoint recovery) is skipped outright, so
   at-least-once delivery from the stream becomes exactly-once in the table.
2. **Arrow schema reconciliation** (``reconcile.py``) — exact, distributed
   inference of the batch's payload schema, widened against the table schema
   (new columns, int32→int64, …). The table schema only ever grows/widens.
3. **Vectorized decode + normalize** — ``from_json`` with the reconciled
   schema (JVM-side) + the pandas/Arrow text-normalization UDF. No per-row
   Python anywhere.
4. **In-batch LWW dedup** — ``groupBy(conv_id, turn_idx).agg(max_by(row,
   (ts, event_seq)))``. Deliberately an *aggregate*, not a window
   ``row_number``: Catalyst's hash aggregate does map-side partial combine,
   so a hot conv_id collapses to ≤ one row per mapper before the shuffle —
   the window formulation would ship every hot-key row to a single
   partition. This is the skew-immune formulation of LWW.
5. **Version-guarded MERGE, per-bucket CoW/MoR** — for buckets where the
   batch rivals the base size, union with the bucket's current rows and take
   the LWW max again (compact-inline / copy-on-write); for buckets where the
   batch is a sliver of the base, append the LWW-deduped slice as a DELTA
   file (merge-on-read) and let readers/compaction fold it — so per-batch
   write cost is O(batch), not O(table) (``lake.plan_compaction``). Either
   way a row only changes if the incoming version ``(ts, event_seq)`` is
   newer, so replays converge (idempotent MERGE). Deletes are kept as
   tombstones so an out-of-order update arriving in a *later* batch can
   never resurrect a deleted row. With an Iceberg catalog on the classpath
   this becomes ``MERGE INTO ... WHEN MATCHED AND (s.ts, s.event_seq) >
   (t.ts, t.event_seq) THEN UPDATE ...`` (CoW) / v2 equality-deletes (MoR);
   the surrounding pipeline is identical.
6. **Salted write repartition** — the rewrite shuffles on ``(_bucket,
   salt)`` rather than ``_bucket`` alone: a hot conv_id concentrates a
   bucket, and one-task-per-bucket would serialize it. Salting fans each
   bucket across ``write_salt`` tasks (files per bucket simply multiply —
   the snapshot tracks lists).
7. **Lineage + metrics** — per-source-partition event counts and max
   offsets, recorded in the snapshot summary and returned to the caller.
"""

from __future__ import annotations

import os
import time
from typing import Any

_DEBUG = os.environ.get("PZ_CDC_DEBUG", "") == "1"

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from palimpzest_spark.cdc.lake import META_COLS, SnapshotLakeTable
from palimpzest_spark.cdc.reconcile import (
    align_to,
    infer_payload_schema,
    reconcile_public_schema,
)
from palimpzest_spark.cdc.transform import normalize_text_udf

KEY_COLS = ("conv_id", "turn_idx")


def _public_schema(table: SnapshotLakeTable) -> T.StructType | None:
    full = table.schema()
    if full is None:
        return None
    return T.StructType([f for f in full.fields if f.name not in META_COLS])


def _full_schema(public: T.StructType) -> T.StructType:
    return T.StructType(
        list(public.fields)
        + [
            T.StructField("_bucket", T.IntegerType(), False),
            T.StructField("_ts", T.TimestampType(), True),
            T.StructField("_event_seq", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), False),
        ]
    )


def _lww(df: DataFrame, cols: list[str]) -> DataFrame:
    """Last-writer-wins reduce per key via max_by (map-side combinable)."""
    return (
        df.groupBy(*KEY_COLS)
        .agg(
            F.max_by(
                F.struct(*[c for c in cols if c not in KEY_COLS]),
                F.struct(F.col("_ts"), F.col("_event_seq")),
            ).alias("_r")
        )
        .select(*KEY_COLS, "_r.*")
    )


def bootstrap(
    spark: SparkSession,
    table: SnapshotLakeTable,
    base_parquet: str,
) -> dict[str, Any]:
    """Load the base conversations table as snapshot v1 (version seq=-1,
    so every feed event outranks base rows at equal ts)."""
    base = spark.read.parquet(base_parquet)
    public = T.StructType([T.StructField(f.name, f.dataType, True) for f in base.schema.fields])
    full = _full_schema(public)
    df = (
        base.withColumn("_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(table.n_buckets)).cast("int"))
        .withColumn("_ts", F.col("ts"))
        .withColumn("_event_seq", F.lit(-1).cast("long"))
        .withColumn("_deleted", F.lit(False))
    )
    n = df.count()
    table.write_buckets(
        align_to(df, full).repartition(table.n_buckets, "_bucket"),
        list(range(table.n_buckets)),
        full.jsonValue(),
        {"last_batch_id": -1, "offsets": {}, "rows_bootstrapped": n},
    )
    return {"rows": n}


def merge_batch(
    spark: SparkSession,
    table: SnapshotLakeTable,
    batch: DataFrame,
    batch_id: int,
    write_salt: int = 4,
) -> dict[str, Any]:
    """Apply one microbatch. Returns metrics (also folded into the snapshot)."""
    t0 = time.perf_counter()
    if batch_id <= table.last_batch_id():
        return {"batch_id": batch_id, "skipped": True, "events": 0, "elapsed_sec": 0.0}

    # (7a)+(2) ONE pre-pass job computes lineage AND the schema-fit check.
    # Grouping is (partition, bucket) — not partition alone: a per-partition
    # collect_set(bucket) funnels the whole batch through one final-agg task
    # (measured: a serial 3-4s). 128 tiny groups keep the combine map-side
    # and the final exchange trivial.
    #
    # Schema resolution is two-tier and always exact: the fused probe parses
    # each payload ONCE into map<string,string> (JVM, codegen) and counts
    # rows that provably do NOT fit the table's current schema — unknown
    # keys, or a non-string field whose raw value fails try-cast to its
    # current type. anomalies == 0 ⇒ the known schema decodes this batch
    # losslessly and the Python/Arrow inference pass is SKIPPED (steady
    # state); any anomaly (first batch, new column, widening, type drift)
    # pays the exact Arrow inference (reconcile.py). A previous design ran
    # the probe as its own job with get_json_object per checked field —
    # that re-parsed every payload ~5x and cost as much CPU as the merge
    # itself; the fused single-parse probe rides the lineage scan.
    bucket_expr = F.pmod(F.xxhash64("conv_id"), F.lit(table.n_buckets)).cast("int")
    table_public_pre = _public_schema(table)

    pre_cols = [
        F.col("partition"),
        bucket_expr.alias("_b"),
        F.col("offset"),
        F.col("payload"),
    ]
    anomaly_expr = None
    if table_public_pre is not None:
        known = {f.name: f.dataType for f in table_public_pre.fields}
        pre_cols.append(F.from_json("payload", "map<string,string>").alias("_m"))
        known_arr = F.array(*[F.lit(k) for k in sorted(known)])
        bads = [
            F.col("_m").isNull(),
            F.size(F.array_except(F.map_keys(F.col("_m")), known_arr)) > 0,
        ]
        for name, dt in known.items():
            if isinstance(dt, (T.StringType, T.NullType)):
                continue  # everything casts to string — cannot drift
            v = F.col("_m").getItem(name)
            # try_cast, NOT cast: under Spark 4's default ANSI mode a plain
            # cast on a drifted value (e.g. turn_idx beyond int32, malformed
            # number) throws CAST_INVALID_INPUT and poison-pills the batch in
            # replay_stream's retry loop; try_cast yields NULL, which is
            # exactly the "does not fit current schema" anomaly signal that
            # routes the batch to exact Arrow inference.
            bads.append(v.isNotNull() & v.try_cast(dt).isNull())
        anom = F.col("payload").isNotNull()
        from functools import reduce

        anomaly_expr = (anom & reduce(lambda a, b: a | b, bads)).cast("long")

    pre = batch.select(*pre_cols)
    aggs = [F.count(F.lit(1)).alias("events"), F.max("offset").alias("max_offset")]
    if anomaly_expr is not None:
        pre = pre.withColumn("_anom", anomaly_expr)
        aggs.append(F.sum("_anom").alias("anomalies"))
    lineage_cells = pre.groupBy("partition", "_b").agg(*aggs).collect()

    # driver-side fold of the 128-cell grid into per-source-partition lineage
    per_part: dict[int, dict[str, int]] = {}
    buckets_seen: set[int] = set()
    n_anomalies = 0
    for r in lineage_cells:
        p = per_part.setdefault(r["partition"], {"events": 0, "max_offset": -1})
        p["events"] += r["events"]
        p["max_offset"] = max(p["max_offset"], r["max_offset"])
        buckets_seen.add(r["_b"])
        if anomaly_expr is not None:
            n_anomalies += int(r["anomalies"] or 0)
    lineage_rows = [
        {"partition": k, "events": v["events"], "max_offset": v["max_offset"]}
        for k, v in per_part.items()
    ]
    n_events = sum(r["events"] for r in lineage_rows)
    if n_events == 0:
        return {"batch_id": batch_id, "skipped": False, "events": 0, "elapsed_sec": 0.0}
    affected = sorted(buckets_seen)
    if table_public_pre is not None and n_anomalies == 0:
        payload_schema: T.StructType | None = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in table_public_pre.fields]
        )
    else:
        payload_schema = infer_payload_schema(batch)
    if _DEBUG:
        print(f"[merge {batch_id}] lineage+infer (concurrent) {time.perf_counter() - t0:.1f}s")

    table_public = _public_schema(table)
    public = reconcile_public_schema(table_public, payload_schema)
    full = _full_schema(public)

    # (3) vectorized decode: JVM-side from_json with the reconciled schema;
    # envelope is authoritative for the key (delete rows carry no payload)
    decoded = batch
    if payload_schema is not None:
        decoded = decoded.withColumn("_p", F.from_json("payload", payload_schema))
    value_cols = []
    turn_t = next(f.dataType for f in public.fields if f.name == "turn_idx")
    for f in public.fields:
        if f.name == "conv_id":
            value_cols.append(F.col("conv_id").cast("string").alias("conv_id"))
        elif f.name == "turn_idx":
            value_cols.append(F.col("turn_idx").cast(turn_t).alias("turn_idx"))
        elif payload_schema is not None and f.name in payload_schema.fieldNames():
            col = F.col(f"_p.{f.name}").cast(f.dataType)
            if f.name == "text":
                col = normalize_text_udf(col)  # pandas/Arrow UDF, never per-row
            value_cols.append(col.alias(f.name))
        else:
            value_cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    upserts = decoded.select(
        *value_cols,
        F.pmod(F.xxhash64("conv_id"), F.lit(table.n_buckets)).cast("int").alias("_bucket"),
        F.col("ts").alias("_ts"),
        F.col("event_seq").alias("_event_seq"),
        (F.col("op") == "D").alias("_deleted"),
    )

    # (4)+(5) Per-bucket write strategy (merge-on-read vs compact-inline),
    # decided from the pre-pass lineage grid + the manifest, zero extra I/O.
    # A bucket whose pending rows (batch + accumulated deltas) rival its base
    # gets COMPACTED INLINE: one max_by aggregate over (base ∪ deltas ∪ batch)
    # both dedups and applies the version guard — the copy-on-write plan, one
    # shuffle. A bucket where the batch is a sliver of the base gets a DELTA
    # APPEND: the batch slice is LWW-deduped and written as a new delta file,
    # cost O(batch slice); the fold happens at read/compaction (lake.lww_fold,
    # same aggregate — max_by associativity makes the two paths equal). This
    # keeps per-batch write cost tracking the BATCH, not the table: with
    # Zipf-skewed feeds every batch touches ~every bucket, so the old
    # rewrite-all-affected-buckets plan was O(table) per batch at 10^10 rows.
    # (A real Iceberg sink maps cow→copy-on-write MERGE, mor→v2 merge-on-read
    # positional/equality deletes; cdc/iceberg.py.)
    batch_rows_by_bucket: dict[int, int] = {}
    for r in lineage_cells:
        batch_rows_by_bucket[r["_b"]] = batch_rows_by_bucket.get(r["_b"], 0) + r["events"]
    cow, mor = table.plan_compaction(batch_rows_by_bucket)

    # (7b) fold lineage into the snapshot summary
    lineage = {
        str(r["partition"]): {"events": r["events"], "max_offset": r["max_offset"]}
        for r in lineage_rows
    }
    prev = table.snapshot()["summary"]
    offsets = dict(prev.get("offsets", {}))
    for p, info in lineage.items():
        offsets[p] = max(int(offsets.get(p, -1)), int(info["max_offset"]))

    # (6) skew-immune write: AQE REBALANCE on _bucket. Unlike a fixed-width
    # hash repartition (lumpy: few distinct buckets hashed into many
    # partitions) or manual salting (fixed fan-out even for cold buckets),
    # REBALANCE sizes write tasks to the advisory partition size — a hot
    # bucket is SPLIT across tasks (optimizeSkewsInRebalancePartitions,
    # default on) and a tiny batch coalesces to a few tasks. Write width
    # therefore tracks data volume and the parquet encode saturates all
    # cores at any batch size. (``write_salt`` retained for API compat; the
    # skew fan-out is adaptive now.)
    if _DEBUG:
        print(f"[merge {batch_id}] plan-built cow={len(cow)} mor={len(mor)} "
              f"{time.perf_counter() - t0:.1f}s")
    cols = [f.name for f in full.fields]
    cow_files: dict = {}
    mor_files: dict = {}
    stats: dict = {}
    if cow:
        existing = table.read_raw(spark, cow)
        part = align_to(upserts.filter(F.col("_bucket").isin(cow)), full)
        merged_in = part if existing is None else align_to(existing, full).unionByName(part)
        _, cow_files, s = table.write_files(
            _lww(merged_in, cols).hint("rebalance", "_bucket"), cow
        )
        stats.update(s)
    if mor:
        part = align_to(upserts.filter(F.col("_bucket").isin(mor)), full)
        _, mor_files, s = table.write_files(
            _lww(part, cols).hint("rebalance", "_bucket"), mor
        )
        stats.update(s)
    table.commit_merge(
        cow,
        cow_files,
        mor_files,
        stats,
        full.jsonValue(),
        {
            "last_batch_id": batch_id,
            "offsets": offsets,
            "batch_lineage": lineage,
            "batch_events": n_events,
        },
    )
    elapsed = time.perf_counter() - t0
    if _DEBUG:
        print(f"[merge {batch_id}] write+commit done {elapsed:.1f}s ({n_events} ev)")
    return {
        "batch_id": batch_id,
        "skipped": False,
        "events": n_events,
        "affected_buckets": len(affected),
        "compacted_buckets": len(cow),
        "delta_buckets": len(mor),
        "lineage": lineage,
        "elapsed_sec": elapsed,
        "events_per_sec": n_events / elapsed if elapsed > 0 else 0.0,
    }
