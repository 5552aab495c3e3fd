"""Manifest-metadata microbench: commit cost at the 10^10-row geometry.

The north rule targets 10^10 change events (~5 TB of transcript text →
``suggest_n_buckets`` picks ~16k buckets at 256 MB/bucket, each holding a
handful of time-sliced base files). At that geometry a FULL manifest
rewrite per commit — the pre-round-5 format — serializes the entire file
inventory every batch: ~25 MB of JSON, ~0.2 s of driver-side dump time and
an fsync of the whole thing, none of which shrinks with executor count or
batch size (it is O(table), a per-commit serial floor). The log-structured
delta records (``lake.CHECKPOINT_INTERVAL``) cut this to O(files touched
by the commit).

This bench measures exactly that, with no Spark and no data files (commit
is pure metadata): a steady-state merge loop at a parameterized bucket
count, each commit appending one delta file per touched bucket and
inline-compacting the policy's share of overflow buckets, run in two arms —

- ``delta``: the shipped format (checkpoint every ``CHECKPOINT_INTERVAL``);
- ``full``: the legacy format, forced by setting the interval to 0.

Reported per arm: median/percentile per-commit wall seconds, bytes written
per commit (metadata write amplification), and a fresh-process cold-open
materialization time (the delta arm replays ≤ interval records; the full
arm reads one big file). Run:

    python -m palimpzest_spark.cdc.metabench --buckets 16384 --commits 30
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import tempfile
import time

from palimpzest_spark.cdc import lake as lake_mod
from palimpzest_spark.cdc.lake import SnapshotLakeTable


def _steady_state_table(root: str, n_buckets: int, files_per_bucket: int) -> SnapshotLakeTable:
    """Bootstrap a table whose manifest matches the steady-state geometry:
    ``files_per_bucket`` time-sliced base files per bucket, with zone-map
    stats, plus a partially-filled delta list — all synthetic relpaths
    (commit never stats data files)."""
    t = SnapshotLakeTable(root, n_buckets=n_buckets)
    files: dict[str, list[str]] = {}
    fs: dict[str, dict] = {}
    for b in range(n_buckets):
        ps = [
            f"data/w0-bootstrap/_bp={b}/part-{i:05d}-{b:08x}.parquet"
            for i in range(files_per_bucket)
        ]
        files[str(b)] = ps
        for i, p in enumerate(ps):
            fs[p] = {
                "bytes": 256 << 20,
                "rows": 600_000,
                "ts_min": 1_700_000_000_000_000 + i * 10**9,
                "ts_max": 1_700_000_000_000_000 + (i + 1) * 10**9,
            }
    t.commit(
        {
            "files": files,
            "deltas": {},
            "filestats": fs,
            "schema": {"type": "struct", "fields": []},
            "summary": {"last_batch_id": 0, "offsets": {}},
        }
    )
    return t


def _run_arm(
    n_buckets: int,
    files_per_bucket: int,
    commits: int,
    checkpoint_interval: int,
    touch_frac: float = 1.0,
) -> dict:
    root = tempfile.mkdtemp(prefix="pz-metabench-")
    saved = lake_mod.CHECKPOINT_INTERVAL
    lake_mod.CHECKPOINT_INTERVAL = checkpoint_interval
    try:
        t = _steady_state_table(root, n_buckets, files_per_bucket)
        commit_s: list[float] = []
        commit_bytes: list[int] = []
        for i in range(1, commits + 1):
            prev = t.snapshot()
            files = dict(prev["files"])
            deltas = dict(prev["deltas"])
            fs = dict(prev["filestats"])
            # each touched bucket receives one delta file (multi-GB
            # microbatch at ≥1 MB/bucket — the documented operating
            # envelope). touch_frac=1.0 is the worst case for the delta
            # format (a batch whose keys hit every bucket); smaller
            # fractions model the steady state where a microbatch's
            # conv_ids land in a subset of buckets.
            touched = max(1, int(n_buckets * touch_frac))
            t_lo = (i * touched) % n_buckets
            for j in range(touched):
                b = (t_lo + j) % n_buckets
                p = f"data/w{i}-merge/_bp={b}/part-00000-{i:04x}{b:08x}.parquet"
                deltas[str(b)] = deltas.get(str(b), []) + [p]
                fs[p] = {"bytes": 4 << 20, "rows": 9_000}
            # the compaction policy's amortized share: delta-file cap 8 →
            # ~1/8 of the touched share folds base∪deltas into a fresh base
            n_comp = max(1, touched // 8)
            lo = (i * n_comp) % n_buckets
            for b in range(lo, lo + n_comp):
                k = str(b % n_buckets)
                for p in files.get(k, []) + deltas.get(k, []):
                    fs.pop(p, None)
                nb = [
                    f"data/c{i}/_bp={k}/part-{j:05d}-{i:04x}.parquet"
                    for j in range(files_per_bucket)
                ]
                files[k] = nb
                deltas[k] = []
                for j, p in enumerate(nb):
                    fs[p] = {
                        "bytes": 256 << 20,
                        "rows": 600_000,
                        "ts_min": 1_700_000_000_000_000 + j * 10**9,
                        "ts_max": 1_700_000_000_000_000 + (j + 1) * 10**9,
                    }
            t0 = time.perf_counter()
            v = t.commit(
                {
                    "files": files,
                    "deltas": deltas,
                    "filestats": fs,
                    "schema": prev["schema"],
                    "summary": {"last_batch_id": i, "offsets": {}},
                },
                expect_version=prev["version"],
            )
            commit_s.append(time.perf_counter() - t0)
            commit_bytes.append(
                os.path.getsize(os.path.join(t.meta_dir, f"v{v}.json"))
            )
        # cold open: a fresh process materializing the current snapshot
        t1 = time.perf_counter()
        t_cold = SnapshotLakeTable(root)
        snap = t_cold.snapshot()
        cold_s = time.perf_counter() - t1
        meta_dir_bytes = sum(
            os.path.getsize(os.path.join(t.meta_dir, f))
            for f in os.listdir(t.meta_dir)
            if f.endswith(".json")
        )
        return {
            "commit_s_median": round(statistics.median(commit_s), 4),
            "commit_s_p90": round(sorted(commit_s)[int(len(commit_s) * 0.9)], 4),
            "commit_bytes_median": int(statistics.median(commit_bytes)),
            "commit_bytes_total": sum(commit_bytes),
            "cold_open_s": round(cold_s, 4),
            "meta_dir_bytes": meta_dir_bytes,
            "final_version": snap["version"],
            "n_manifest_files": len(
                [f for f in os.listdir(t.meta_dir) if f.endswith(".json")]
            ),
        }
    finally:
        lake_mod.CHECKPOINT_INTERVAL = saved
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--buckets", type=int, default=16384)
    ap.add_argument("--files-per-bucket", type=int, default=6)
    ap.add_argument("--commits", type=int, default=30)
    ap.add_argument(
        "--touch-frac", type=float, default=1.0,
        help="fraction of buckets each commit touches (1.0 = worst case "
        "for the delta format; steady-state microbatches touch a subset)",
    )
    args = ap.parse_args()

    out = {
        "geometry": {
            "n_buckets": args.buckets,
            "files_per_bucket": args.files_per_bucket,
            "commits": args.commits,
            "touch_frac": args.touch_frac,
        },
        "full": _run_arm(
            args.buckets, args.files_per_bucket, args.commits, 0,
            args.touch_frac,
        ),
        "delta": _run_arm(
            args.buckets, args.files_per_bucket, args.commits,
            lake_mod.CHECKPOINT_INTERVAL, args.touch_frac,
        ),
    }
    f, d = out["full"], out["delta"]
    out["speedup_commit"] = round(
        f["commit_s_median"] / max(d["commit_s_median"], 1e-9), 2
    )
    out["bytes_ratio"] = round(
        f["commit_bytes_total"] / max(d["commit_bytes_total"], 1), 2
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
