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


def _anomaly_expr(table_public: T.StructType):
    """Rows that provably do NOT fit the table's current schema — unknown
    keys, or a non-string field whose raw value fails try_cast. Built over a
    single map<string,string> parse aliased ``_m``."""
    known = {f.name: f.dataType for f in table_public.fields}
    known_arr = F.array(*[F.lit(k) for k in sorted(known)])
    bads = [
        F.col("_m").isNull(),
        F.size(F.array_except(F.map_keys(F.col("_m")), known_arr)) > 0,
    ]
    for name, dt in known.items():
        if isinstance(dt, (T.StringType, T.NullType)):
            continue  # everything casts to string — cannot drift
        v = F.col("_m").getItem(name)
        # try_cast, NOT cast: under Spark 4's default ANSI mode a plain cast
        # on a drifted value throws CAST_INVALID_INPUT and poison-pills the
        # batch; try_cast yields NULL = the anomaly signal.
        bads.append(v.isNotNull() & v.try_cast(dt).isNull())
    from functools import reduce

    return (F.col("payload").isNotNull() & reduce(lambda a, b: a | b, bads)).cast("long")


def _value_cols(public: T.StructType, payload_schema: T.StructType | None) -> list:
    # try_cast throughout: under ANSI a misfitting value must surface as the
    # anomaly/widening signal (fused path aborts, two-pass widens), never as
    # a job-killing CAST_OVERFLOW inside the merge action
    cols = []
    turn_t = next(f.dataType for f in public.fields if f.name == "turn_idx")
    for f in public.fields:
        if f.name == "conv_id":
            cols.append(F.col("conv_id").cast("string").alias("conv_id"))
        elif f.name == "turn_idx":
            cols.append(F.col("turn_idx").try_cast(turn_t).alias("turn_idx"))
        elif payload_schema is not None and f.name in payload_schema.fieldNames():
            col = F.col(f"_p.{f.name}").try_cast(f.dataType)
            if f.name == "text":
                col = normalize_text_udf(col)  # pandas/Arrow UDF, never per-row
            cols.append(col.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return cols


def _fold_summary(table: SnapshotLakeTable, batch_id: int, lineage: dict,
                  n_events: int, n_parts: int, fused_clean: bool = False) -> dict:
    prev = table.snapshot()["summary"]
    offsets = dict(prev.get("offsets", {}))
    for p, info in lineage.items():
        offsets[p] = max(int(offsets.get(p, -1)), int(info["max_offset"]))
    return {
        "last_batch_id": batch_id,
        "offsets": offsets,
        "batch_lineage": lineage,
        "batch_events": n_events,
        "n_source_partitions": max(int(prev.get("n_source_partitions", 0)), n_parts),
        "fused_clean": fused_clean,
    }


def merge_batch(
    spark: SparkSession,
    table: SnapshotLakeTable,
    batch: DataFrame,
    batch_id: int,
    write_salt: int = 4,
) -> dict[str, Any]:
    """Apply one microbatch. Returns metrics (also folded into the snapshot).

    Two execution paths:
    - **fused single-job** (steady state): when the table schema + source
      geometry are known from previous batches, the schema probe, lineage
      metrics, decode, LWW fold and write run as ONE observed action
      (``_merge_fused`` — Dataset.observe/CollectMetrics rides the write
      scan). If the observed anomaly count is non-zero (schema evolution)
      the optimistic write is aborted file-level (never committed) and the
      batch falls back to the two-pass path. Measured: the separate pre-pass
      job was ~25% of steady-state batch wall clock.
    - **two-pass** (bootstrap / first batch / evolution): pre-pass job for
      lineage + exact probe, Arrow inference when needed, then the merge
      write (``_merge_twopass``).
    """
    t0 = time.perf_counter()
    if batch_id <= table.last_batch_id():
        return {"batch_id": batch_id, "skipped": True, "events": 0, "elapsed_sec": 0.0}

    prev = table.snapshot()["summary"]
    public = _public_schema(table)
    n_parts = int(prev.get("n_source_partitions", 0) or 0)
    est_events = int(prev.get("batch_events", 0) or 0)
    if public is not None and n_parts > 0 and est_events > 0:
        out = _merge_fused(spark, table, batch, batch_id, public, n_parts, est_events, t0)
        if out is not None:
            return out
        if _DEBUG:
            print(f"[merge {batch_id}] fused path aborted (schema anomaly) "
                  f"{time.perf_counter() - t0:.1f}s — falling back to two-pass")
    return _merge_twopass(spark, table, batch, batch_id, t0)


def _merge_fused(
    spark: SparkSession,
    table: SnapshotLakeTable,
    batch: DataFrame,
    batch_id: int,
    public: T.StructType,
    n_parts: int,
    est_events: int,
    t0: float,
) -> dict[str, Any] | None:
    """Steady-state merge as ONE observed action (two when cow+mor mix).

    The batch scan computes, in a single stage: the map-parse anomaly probe,
    the struct decode with the KNOWN schema, text normalization, bucketing —
    with lineage/probe metrics collected by a CollectMetrics node during the
    SAME job (count, anomaly sum, per-source-partition event counts and
    high-water offsets in ``n_parts`` fixed slots). Returns None if the
    anomaly count is non-zero or a partition id outside the known slots
    appears — after aborting the uncommitted files — so the caller reruns
    the exact two-pass path.

    The CoW/MoR split is decided from the batch's TRUE per-bucket row counts
    (a conv_id-only count job — one string column, no JSON parse), so only
    buckets the batch actually touches are ever written; untouched buckets
    carry forward by manifest reference alone. Per-batch write cost is
    therefore O(batch + touched-bucket bases elected for compaction), never
    O(table).
    """
    from pyspark.sql import Observation

    payload_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in public.fields]
    )
    full = _full_schema(public)
    cols = [f.name for f in full.fields]
    turn_t0 = next(f.dataType for f in public.fields if f.name == "turn_idx")

    # ONE cheap pre-job: exact per-bucket batch counts (conv_id column only
    # — the CoW/MoR plan input) with a STRIDED anomaly sample riding along
    # (every 64th event_seq parses its payload; CASE short-circuits the
    # parse for the rest). Strided sampling catches schema evolution
    # wherever its onset falls in the batch for ~n/64 parses, so an
    # evolution batch bails here in ~0.3s instead of paying a full
    # optimistic write that the exact observe gate below would throw away
    # (measured: that wasted write was ~half the evolution batch's wall
    # clock). A lone anomalous row the stride misses is still caught
    # exactly by the observed metrics.
    sampled = F.pmod(F.xxhash64("event_seq"), F.lit(64)) == 0
    pre = batch.withColumn(
        "_m", F.when(sampled, F.from_json("payload", "map<string,string>"))
    ).select(
        F.pmod(F.xxhash64("conv_id"), F.lit(table.n_buckets)).cast("int").alias("_b"),
        F.when(
            sampled,
            _anomaly_expr(public)
            + (
                F.col("turn_idx").isNotNull()
                & F.col("turn_idx").try_cast(turn_t0).isNull()
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("_sa"),
    )
    grid = (
        pre.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_sa").alias("sa"))
        .collect()
    )
    batch_rows_by_bucket = {int(r["_b"]): int(r["n"]) for r in grid}
    if sum(int(r["sa"] or 0) for r in grid) > 0:
        return None
    t_sample = time.perf_counter()

    decoded = batch.withColumn(
        "_m", F.from_json("payload", "map<string,string>")
    ).withColumn("_anom", _anomaly_expr(public))
    # Decode from the ALREADY-PARSED map when every payload field is atomic
    # (the steady-state transcript schema: strings + ints) — getItem +
    # try_cast per field, halving the JSON-parse CPU of this job. try_cast
    # mirrors from_json's per-field null-on-mismatch. A nested field (a
    # producer emitting real JSON objects) falls back to the typed parse.
    _ATOMIC = (
        T.StringType, T.LongType, T.IntegerType, T.ShortType, T.ByteType,
        T.DoubleType, T.FloatType, T.BooleanType,
    )
    if all(isinstance(f.dataType, _ATOMIC) for f in payload_schema.fields):
        decoded = decoded.withColumn(
            "_p",
            F.struct(
                *[
                    F.col("_m").getItem(f.name).try_cast(f.dataType).alias(f.name)
                    for f in payload_schema.fields
                ]
            ),
        )
    else:
        decoded = decoded.withColumn("_p", F.from_json("payload", payload_schema))
    obs = Observation()
    turn_t = next(f.dataType for f in public.fields if f.name == "turn_idx")
    # ENVELOPE anomaly: a delete (payload-less) whose turn_idx needs widening
    # is invisible to the payload probe — catching it here prevents the
    # optimistic decode from null-ing its key (and routes to two-pass, which
    # widens from the envelope's observed max)
    env_anom = (F.col("turn_idx").isNotNull() & F.col("turn_idx").try_cast(turn_t).isNull())
    metrics = [
        F.count(F.lit(1)).alias("events"),
        (F.sum("_anom") + F.sum(env_anom.cast("long"))).alias("anomalies"),
        F.max("partition").alias("max_part"),
    ]
    for p in range(n_parts):
        is_p = F.col("partition") == p
        metrics.append(F.sum(is_p.cast("long")).alias(f"ev_{p}"))
        metrics.append(F.max(F.when(is_p, F.col("offset"))).alias(f"off_{p}"))
    decoded = decoded.observe(obs, *metrics)

    upserts = decoded.select(
        *_value_cols(public, payload_schema),
        F.pmod(F.xxhash64("conv_id"), F.lit(table.n_buckets)).cast("int").alias("_bucket"),
        F.col("ts").alias("_ts"),
        F.col("event_seq").alias("_event_seq"),
        (F.col("op") == "D").alias("_deleted"),
    )

    # CoW/MoR split from the pre-job's TRUE per-bucket counts: only buckets
    # the batch actually touches are planned (the earlier uniform-estimate
    # design cow-rewrote every bucket of the table for a small or skewed
    # batch — O(table) writes for an O(batch) change, the exact write
    # amplification the MoR design exists to kill).
    cow, mor = table.plan_compaction(batch_rows_by_bucket)

    out_rels: list[str] = []
    cow_files: dict = {}
    mor_files: dict = {}
    stats: dict = {}
    t_cow = t_mor = t_plan = time.perf_counter()
    try:
        if cow:
            existing = table.read_raw(spark, cow)
            part = align_to(upserts.filter(F.col("_bucket").isin(cow)), full)
            merged_in = part if existing is None else align_to(existing, full).unionByName(part)
            rel, cow_files, s = table.write_files(
                _lww(merged_in, cols).hint("rebalance", "_bucket"), cow
            )
            out_rels.append(rel)
            stats.update(s)
            t_cow = time.perf_counter()
        if mor:
            part = align_to(upserts.filter(F.col("_bucket").isin(mor)), full)
            rel, mor_files, s = table.write_files(
                _lww(part, cols).hint("rebalance", "_bucket"), mor
            )
            out_rels.append(rel)
            stats.update(s)
            t_mor = time.perf_counter()
        # NEVER call the blocking obs.get py4j method unguarded: it waits on
        # a listener-bus notification with no timeout, and inside foreachBatch
        # a concurrent q.stop() (the kill/resume path) deadlocks against the
        # blocked callback thread. Metrics land ~instantly after the action,
        # so poll the non-blocking getRowOrEmpty briefly; if they never
        # arrive (dropped listener event), recompute exactly with a dedicated
        # job — correct either way, bounded always.
        m = None
        jo = getattr(obs, "_jo", None)
        deadline = time.time() + 2.0
        while jo is not None and time.time() < deadline:
            if jo.getRowOrEmpty().isDefined():
                m = obs.get
                break
            time.sleep(0.05)
        if m is None:
            m = decoded.agg(*metrics).collect()[0].asDict()
        n_events = int(m["events"] or 0)
        anomalies = int(m["anomalies"] or 0)
        max_part = -1 if m["max_part"] is None else int(m["max_part"])
        if anomalies > 0 or max_part >= n_parts:
            for rel in out_rels:
                table.abort_files(rel)
            return None
    except Exception:
        for rel in out_rels:
            table.abort_files(rel)
        raise
    if _DEBUG:
        t_now = time.perf_counter()
        print(f"[merge {batch_id}] fused phases: sample={t_sample - t0:.1f}s "
              f"cow_write={max(t_cow - t_plan, 0):.1f}s "
              f"mor_write={max(t_mor - max(t_cow, t_plan), 0):.1f}s "
              f"obs={t_now - max(t_mor, t_cow, t_plan):.1f}s total={t_now - t0:.1f}s "
              f"(cow={len(cow)} mor={len(mor)})")
    if n_events == 0:
        for rel in out_rels:
            table.abort_files(rel)
        return {"batch_id": batch_id, "skipped": False, "events": 0, "elapsed_sec": 0.0}

    lineage = {
        str(p): {"events": int(m[f"ev_{p}"] or 0), "max_offset": int(m[f"off_{p}"] if m[f"off_{p}"] is not None else -1)}
        for p in range(n_parts)
        if int(m[f"ev_{p}"] or 0) > 0
    }
    table.commit_merge(
        cow, cow_files, mor_files, stats, full.jsonValue(),
        _fold_summary(table, batch_id, lineage, n_events, n_parts, fused_clean=True),
    )
    elapsed = time.perf_counter() - t0
    if _DEBUG:
        print(f"[merge {batch_id}] fused commit done {elapsed:.1f}s ({n_events} ev)")
    return {
        "batch_id": batch_id,
        "skipped": False,
        "events": n_events,
        "affected_buckets": len(cow) + len(mor),
        "compacted_buckets": len(cow),
        "delta_buckets": len(mor),
        "fused": True,
        "lineage": lineage,
        "elapsed_sec": elapsed,
        "events_per_sec": n_events / elapsed if elapsed > 0 else 0.0,
    }


def _merge_twopass(
    spark: SparkSession,
    table: SnapshotLakeTable,
    batch: DataFrame,
    batch_id: int,
    t0: float,
) -> dict[str, Any]:
    """Apply one microbatch (exact path — bootstrap / evolution batches)."""
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

    pre_cols.append(F.col("turn_idx").alias("_turn"))
    pre = batch.select(*pre_cols)
    aggs = [
        F.count(F.lit(1)).alias("events"),
        F.max("offset").alias("max_offset"),
        F.max("_turn").alias("max_turn"),
    ]
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
    # envelope-driven widening: the feed envelope's turn_idx is authoritative
    # for the key; a payload-less delete can carry a value beyond the
    # reconciled type's range (invisible to payload inference) — widen from
    # the pre-pass's observed max so the key cast can never overflow
    max_turn = max((int(r["max_turn"]) for r in lineage_cells
                    if r["max_turn"] is not None), default=0)
    turn_f = next(f for f in public.fields if f.name == "turn_idx")
    if isinstance(turn_f.dataType, (T.ByteType, T.ShortType, T.IntegerType)) and (
        max_turn > 2**31 - 1
    ):
        public = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name == "turn_idx" else f.dataType,
                              True, metadata=f.metadata)
                for f in public.fields
            ]
        )
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

    # (7b) fold lineage into the snapshot summary; n_source_partitions is
    # recorded so subsequent steady-state batches can take the fused
    # single-job path (its observe slots need the source geometry up front)
    lineage = {
        str(r["partition"]): {"events": r["events"], "max_offset": r["max_offset"]}
        for r in lineage_rows
    }
    n_parts = max((r["partition"] for r in lineage_rows), default=-1) + 1

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
        _fold_summary(table, batch_id, lineage, n_events, n_parts),
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
