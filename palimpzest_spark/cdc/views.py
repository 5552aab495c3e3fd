"""Incrementally-maintained materialized views over the CDC lake table.

The standard downstream pattern: a denormalized per-conversation rollup
(turn counts, last activity, role mix) kept current as batches merge,
WITHOUT rescanning the whole table. Maintenance is driven by the lake's
change-data-feed (``timetravel.table_changes``): the CDF names exactly the
conversations whose rows changed between two snapshots, those
conversations' aggregates are recomputed from their (bucket-pruned) live
rows, and the results upsert into the view. Per-refresh cost is
O(changed conversations), not O(table) — the same amortization argument
as the merge itself, so the view keeps up at 10^10-row scale.

The view itself is a tiny :class:`SnapshotLakeTable`-independent parquet
directory keyed by conv_id with last-refresh bookkeeping (the source
snapshot version it reflects), so refreshes are idempotent and resumable:
re-running a refresh for the same version span rewrites the same rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palimpzest_spark.cdc.lake import SnapshotLakeTable
from palimpzest_spark.cdc.timetravel import table_changes


def _rollup(rows: DataFrame) -> DataFrame:
    """Per-conversation aggregate over live transcript rows."""
    return rows.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.max("ts").alias("last_ts"),
        F.sort_array(F.collect_set("role")).alias("roles"),
    )


class ConversationRollupView:
    """Materialized per-conversation rollup with CDF-driven refresh."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._meta = os.path.join(path, "_view_meta.json")

    def _load_meta(self) -> dict:
        if not os.path.exists(self._meta):
            return {"version": 0, "data_dir": "data"}
        with open(self._meta) as f:
            meta = json.load(f)
        meta.setdefault("data_dir", "data")  # pre-versioned layouts
        return meta

    def _commit_meta(self, version: int, data_dir: str) -> None:
        """Single-file atomic commit: the data dir a reader resolves flips
        only when this rename lands (same write-then-rename discipline as
        the lake's snapshot commits — a crash mid-refresh leaves the old
        version fully readable)."""
        tmp = self._meta + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "data_dir": data_dir}, f)
        os.replace(tmp, self._meta)

    def reflected_version(self) -> int:
        return self._load_meta()["version"]

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, self._load_meta()["data_dir"]))

    def full_build(self, spark: SparkSession, table: SnapshotLakeTable) -> int:
        """Initial materialization: one full scan (bootstrap only)."""
        v = table.current_version()
        out = _rollup(table.read(spark))
        data_dir = f"data_v{v}"
        out.write.mode("overwrite").parquet(os.path.join(self.path, data_dir))
        self._commit_meta(v, data_dir)
        return v

    def refresh(self, spark: SparkSession, table: SnapshotLakeTable) -> dict:
        """Incremental refresh to the table's current snapshot.

        1. CDF between the reflected and current versions names the
           changed conversations (net row-level insert/update/delete).
        2. ONLY those conversations' live rows are re-read — their hash
           buckets' files (file pruning) semi-joined against the changed
           set, which stays distributed end to end: nothing but bucket
           ints is ever collected, so a batch touching millions of
           conversations still refreshes without a driver-side list.
        3. The view upserts via anti-join + union: unchanged conversations
           carry forward, changed ones are replaced, fully-deleted ones
           drop out.
        Idempotent: re-running the same span recomputes the same rows.
        """
        v_from = self.reflected_version()
        v_to = table.current_version()
        if v_to <= v_from:
            return {"refreshed": False, "version": v_from, "changed_convs": 0}
        changes = table_changes(table, spark, v_from, v_to)
        changed = changes.select("conv_id").distinct().persist()
        n_changed = changed.count()
        if not n_changed:
            changed.unpersist()
            self._commit_meta(v_to, self._load_meta()["data_dir"])
            return {"refreshed": True, "version": v_to, "changed_convs": 0}

        # Only BUCKET ids reach the driver (bounded by n_buckets); the
        # changed-conversation set itself stays distributed — a batch can
        # touch millions of conversations and nothing but their buckets'
        # files is scanned, nothing but bucket ints is collected.
        buckets = sorted(
            r["b"]
            for r in changed.select(
                F.pmod(F.xxhash64("conv_id"), F.lit(table.n_buckets))
                .cast("int")
                .alias("b")
            ).distinct().collect()
        )
        from palimpzest_spark.cdc.lake import META_COLS, lww_fold

        raw = table.read_raw(spark, buckets=buckets)
        live = lww_fold(raw).filter(~F.col("_deleted")) if raw is not None else None
        if live is None:
            fresh = self.read(spark).limit(0)
        else:
            public = [c for c in live.columns if c not in META_COLS]
            fresh = _rollup(live.select(*public).join(changed, "conv_id", "left_semi"))
        prev_dir = self._load_meta()["data_dir"]
        old = self.read(spark).join(changed, "conv_id", "left_anti")
        out = old.unionByName(fresh)
        # Write the next version into its OWN directory, then flip the
        # pointer with one atomic metadata rename — readers of the previous
        # version are never left pointing at a half-deleted directory, and a
        # crash anywhere here leaves the old version intact and the view
        # self-healing (the orphaned data_v{N} dir is simply overwritten on
        # the next successful refresh to that version).
        next_dir = f"data_v{v_to}"
        out.write.mode("overwrite").parquet(os.path.join(self.path, next_dir))
        changed.unpersist()
        self._commit_meta(v_to, next_dir)
        if prev_dir != next_dir:
            import shutil

            shutil.rmtree(os.path.join(self.path, prev_dir), ignore_errors=True)
        return {"refreshed": True, "version": v_to, "changed_convs": n_changed}
