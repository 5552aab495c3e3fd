"""SnapshotLakeTable — a minimal Iceberg-style table format over parquet.

Why this exists: the north rule targets Iceberg ``MERGE INTO``, but this
sandbox image ships no Iceberg runtime jar. The engine therefore talks to a
tiny table-format abstraction with Iceberg's load-bearing properties:

- **atomic snapshot commits**: a snapshot is an immutable JSON manifest
  (data-file list + schema + summary); commit = write ``v{N}.json`` then
  atomically rename a version-hint file. Readers resolve the hint, never see
  partial state. (Iceberg: metadata.json + snapshot log.)
- **bucket partitioning + file pruning**: data files are hash-bucketed on
  ``conv_id`` (``pmod(xxhash64(conv_id), n_buckets)``); a MERGE rewrites only
  the buckets its batch touches and carries every other file forward —
  copy-on-write at file granularity, like Iceberg's partition-scoped
  overwrite. At 10^10 rows the bucket count is raised so each file stays
  ~128-512 MB; the merge cost is O(touched buckets), not O(table).
- **exactly-once via commit metadata**: the snapshot summary records the last
  committed streaming batch id (and per-source-partition offsets); replaying
  an already-committed batch is a no-op. (Iceberg: snapshot summary props —
  the standard foreachBatch idempotence pattern.)

On a real cluster with the Iceberg jar, ``merge.py`` swaps this for
``MERGE INTO`` SQL; the surrounding pipeline is unchanged.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VERSION_HINT = "version-hint.txt"

# engine-internal columns stored in the table alongside the public schema:
# LWW version + tombstone flag (kept so out-of-order events arriving in later
# batches can never resurrect a deleted row).
META_COLS = ("_bucket", "_ts", "_event_seq", "_deleted")


class SnapshotLakeTable:
    def __init__(self, root: str, n_buckets: int = 16):
        self.root = root
        self.n_buckets = n_buckets
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------

    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, VERSION_HINT)

    def current_version(self) -> int:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {
                "version": 0,
                "files": {},
                "schema": None,
                "summary": {"last_batch_id": -1, "offsets": {}},
            }
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            return json.load(f)

    def commit(self, snap: dict) -> int:
        """Atomically publish a new snapshot (write-then-rename)."""
        new_v = self.current_version() + 1
        snap = dict(snap, version=new_v, committed_at=time.time())
        path = os.path.join(self.meta_dir, f"v{new_v}.json")
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(snap, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)
        hint_tmp = self._hint_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(hint_tmp, "w") as f:
            f.write(str(new_v))
            f.flush()
            os.fsync(f.fileno())
        os.rename(hint_tmp, self._hint_path())
        return new_v

    def last_batch_id(self) -> int:
        return int(self.snapshot()["summary"].get("last_batch_id", -1))

    # -- reads ---------------------------------------------------------------

    def schema(self) -> T.StructType | None:
        s = self.snapshot().get("schema")
        return T.StructType.fromJson(s) if s else None

    def read_buckets(self, spark: SparkSession, buckets: list[int]) -> DataFrame | None:
        """Scan only the data files of the given buckets (file pruning)."""
        snap = self.snapshot()
        paths = [
            os.path.join(self.root, p)
            for b in buckets
            for p in snap["files"].get(str(b), [])
        ]
        if not paths:
            return None
        return spark.read.schema(self.schema()).parquet(*paths)

    def read(self, spark: SparkSession, include_meta: bool = False) -> DataFrame:
        """Current table state (public view: tombstones filtered, meta hidden)."""
        snap = self.snapshot()
        all_paths = [os.path.join(self.root, p) for ps in snap["files"].values() for p in ps]
        if not all_paths:
            schema = self.schema() or T.StructType([])
            return spark.createDataFrame([], schema)
        df = spark.read.schema(self.schema()).parquet(*all_paths)
        if include_meta:
            return df
        public = [c for c in df.columns if c not in META_COLS]
        return df.filter(~F.col("_deleted")).select(*public)

    # -- writes ---------------------------------------------------------------

    def write_files(self, df: DataFrame, buckets: list[int]) -> tuple[str, dict]:
        """Materialize ``df`` (must contain ``_bucket``) as uncommitted data
        files, laid out per bucket. Returns ``(out_rel, files_by_bucket)``.
        Nothing is visible to readers until :meth:`commit_files` — the
        write/commit split lets an optimistic merge validate the batch (e.g.
        the schema-anomaly observation) AFTER the files exist and abort
        without a trace (Iceberg's uncommitted-snapshot discipline)."""
        prev = self.snapshot()
        out_rel = os.path.join("data", f"w{prev['version'] + 1}-{uuid.uuid4().hex[:8]}")
        out_abs = os.path.join(self.root, out_rel)
        # partition the write by a *copy* of the bucket column: partitionBy
        # strips its column from the files, and we need _bucket readable when
        # scanning leaf files directly (no basePath reconstruction).
        (
            df.withColumn("_bp", F.col("_bucket"))
            .write.mode("overwrite")
            .partitionBy("_bp")
            .parquet(out_abs)
        )
        new_files: dict[str, list[str]] = {str(b): [] for b in buckets}
        for bdir in os.listdir(out_abs):
            if not bdir.startswith("_bp="):
                continue
            b = bdir.split("=", 1)[1]
            for fn in os.listdir(os.path.join(out_abs, bdir)):
                if fn.endswith(".parquet"):
                    new_files.setdefault(b, []).append(os.path.join(out_rel, bdir, fn))
        return out_rel, new_files

    def abort_files(self, out_rel: str) -> None:
        """Discard an uncommitted write (never referenced by any snapshot)."""
        import shutil

        shutil.rmtree(os.path.join(self.root, out_rel), ignore_errors=True)

    def commit_files(
        self, buckets: list[int], new_files: dict, schema_json: dict, summary: dict
    ) -> int:
        prev = self.snapshot()
        files = {
            b: ps for b, ps in prev["files"].items() if int(b) not in set(buckets)
        }
        files.update(new_files)
        return self.commit({"files": files, "schema": schema_json, "summary": summary})

    def write_buckets(
        self,
        df: DataFrame,
        buckets: list[int],
        schema_json: dict,
        summary: dict,
    ) -> int:
        """Write + commit in one step (bootstrap / non-optimistic callers)."""
        _out_rel, new_files = self.write_files(df, buckets)
        return self.commit_files(buckets, new_files, schema_json, summary)
