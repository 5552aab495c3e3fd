"""Multi-writer contention bench: what does sharing one table COST?

Two arms, identical in every respect — two OS-level Spark drivers on
disjoint pinned CPU halves, each replaying its own disjoint-key change feed
under its own ``writer_id`` — except the table they write:

- **separate**: each writer gets its own clone of the bootstrapped template
  (zero commit contention; the control arm);
- **shared**: both writers ingest ONE clone (every commit races the other
  writer's; losers rebase driver-side or re-plan).

The ratio shared/separate therefore isolates the optimistic-commit cost
with JVM count, core budget, feeds, and code held constant. In the steady
MoR regime (template primed so every measured batch takes the delta-append
path) rebases are driver-side manifest re-derivations — milliseconds against
multi-second Spark jobs — so the claim under test is "ratio ≈ 1.0, races
recovered by rebase, not re-plan". Reported per round: aggregate events/sec
per arm (total events / barrier-to-last-exit wall), rebase + full-re-plan
counts from the shared arm, and the measured steal fraction (same
/proc/stat discipline as ``bench.py``); arm order alternates per round so
co-tenant drift lands on both sides.

Run: ``python -m palimpzest_spark.cdc.mwbench`` → one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time
from typing import Any

from palimpzest_spark.cdc import feedgen
from palimpzest_spark.cdc.bench import (
    CACHE_ROOT,
    _WORK_ROOT,
    _steal_jiffies,
    clone_table,
    ensure_fixture,
)

_CHILD = """
import json, os, sys, time
(cores, cpu_offset, feed_dir, table_dir, template_dir, writer_id,
 ready_file, go_file, n_buckets, fpb) = sys.argv[1:11]
cores, cpu_offset = int(cores), int(cpu_offset)
n_buckets, fpb = int(n_buckets), int(fpb)
# disjoint CPU halves per writer: the two JVMs never share a core, so the
# ONLY cross-writer coupling left in the shared arm is the commit protocol
os.sched_setaffinity(0, set(range(cpu_offset, cpu_offset + cores)))
import shutil, tempfile
from palimpzest_spark.session import get_spark
from palimpzest_spark.cdc.bench import clone_table
from palimpzest_spark.cdc.lake import SnapshotLakeTable
from palimpzest_spark.cdc.runner import replay_batches

spark = get_spark(app_name=f"mw-{writer_id}", master=f"local[{cores}]",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
# warmup: full replay of the same feed into a throwaway clone, so codegen/
# C2/parquet codecs are hot when the barrier releases (both arms equally)
warm = tempfile.mkdtemp(prefix="pz_mw_warm_",
                        dir=os.path.dirname(template_dir.rstrip("/")))
os.rmdir(warm); clone_table(template_dir, warm)
replay_batches(spark, SnapshotLakeTable(warm, n_buckets=n_buckets), feed_dir,
               files_per_batch=fpb, writer_id=writer_id)
shutil.rmtree(warm, ignore_errors=True)
open(ready_file, "w").close()
while not os.path.exists(go_file):
    time.sleep(0.02)
table = SnapshotLakeTable(table_dir, n_buckets=n_buckets)
t0 = time.time()
ms = replay_batches(spark, table, feed_dir, files_per_batch=fpb,
                    writer_id=writer_id)
t1 = time.time()
print("RESULT:" + json.dumps({
    "events": sum(m["events"] for m in ms),
    "batches": len(ms),
    "skipped": sum(1 for m in ms if m.get("skipped")),
    "replans": sum(m.get("commit_retries", 0) for m in ms),
    "rebases": sum(m.get("commit_rebases", 0) for m in ms),
    "compact_sec": round(sum(m.get("compact_sec", 0.0) for m in ms), 2),
    "compactions": sum(1 for m in ms if m.get("compact_sec", 0.0) > 0),
    "t0": t0, "t1": t1,
}), flush=True)
spark.stop()
"""


def ensure_renamed_fixture(prefix: str, seed: int, **kw: Any) -> dict[str, str]:
    """A change feed whose conv_ids live in a disjoint ``prefix`` key space
    (two shards of one binlog never share keys — cross-writer LWW ties can't
    arise, so the merged table state is commit-order independent)."""
    import pandas as pd

    key = "mw_{p}_s{s}_".format(p=prefix.strip("-"), s=seed) + "_".join(
        f"{k}{v}" for k, v in sorted(kw.items())
    )
    root = os.path.join(CACHE_ROOT, key)
    done = os.path.join(root, "_DONE")
    feed_dir = os.path.join(root, "feed")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        feedgen.gen_change_feed(feed_dir, seed=seed, **kw)
        for p in sorted(glob.glob(os.path.join(feed_dir, "feed-*.parquet"))):
            df = pd.read_parquet(p)
            df["conv_id"] = df["conv_id"].str.replace("conv-", prefix, regex=False)
            df.to_parquet(p, index=False)
        open(done, "w").close()
    return {"feed_dir": feed_dir}


def _run_arm(
    shared: bool,
    template: str,
    feeds: dict[str, str],
    cores_per_writer: int,
    n_buckets: int,
    fpb: int,
) -> dict[str, Any]:
    """One arm = two concurrent writer processes; returns aggregate metrics."""
    work = tempfile.mkdtemp(prefix="pz_mw_arm_", dir=_WORK_ROOT)
    try:
        tables: dict[str, str] = {}
        if shared:
            t = os.path.join(work, "lake")
            clone_table(template, t)
            tables = {w: t for w in feeds}
        else:
            for w in feeds:
                t = os.path.join(work, f"lake_{w}")
                clone_table(template, t)
                tables[w] = t
        go = os.path.join(work, "go")
        env = dict(os.environ)
        # children must import this package regardless of the parent's cwd
        import palimpzest_spark as _pkg

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        procs: dict[str, subprocess.Popen] = {}
        logs: dict[str, str] = {}
        # child output goes to a FILE, not a PIPE: a Spark child can emit
        # more than the ~64KB pipe buffer before the barrier (JVM/log4j
        # noise during the warmup replay) and would deadlock on write while
        # the parent waits for its ready file — a file sink cannot fill up
        for i, (w, feed) in enumerate(sorted(feeds.items())):
            logs[w] = os.path.join(work, f"log_{w}.txt")
            with open(logs[w], "w") as logf:
                procs[w] = subprocess.Popen(
                    [sys.executable, "-u", "-c", _CHILD,
                     str(cores_per_writer), str(i * cores_per_writer), feed,
                     tables[w], template, w,
                     os.path.join(work, f"ready_{w}"), go,
                     str(n_buckets), str(fpb)],
                    env=env, stdout=logf, stderr=subprocess.STDOUT, text=True,
                )

        def _tail(w: str) -> str:
            try:
                with open(logs[w]) as f:
                    return f.read()[-4000:]
            except OSError:
                return "<no output>"

        deadline = time.monotonic() + 900.0
        while not all(
            os.path.exists(os.path.join(work, f"ready_{w}")) for w in feeds
        ):
            time.sleep(0.05)
            for w, p in procs.items():
                if p.poll() is not None:
                    raise RuntimeError(f"writer {w} died pre-barrier:\n{_tail(w)}")
            if time.monotonic() > deadline:
                for p in procs.values():
                    p.kill()
                raise RuntimeError(
                    "writers never reached the start barrier within 900s:\n"
                    + "\n".join(f"--- {w}:\n{_tail(w)}" for w in feeds)
                )
        cores = max(len(os.sched_getaffinity(0)), 1)
        s0, w0 = _steal_jiffies(), time.monotonic()
        open(go, "w").close()
        res: dict[str, dict] = {}
        for w, p in procs.items():
            p.wait(timeout=1800)
            if p.returncode != 0:
                raise RuntimeError(f"writer {w} failed:\n{_tail(w)}")
            # scan the WHOLE log for the RESULT line — a noisy JVM/py4j
            # shutdown after it can easily exceed any fixed tail window,
            # and losing the line wastes a multi-minute two-JVM round
            with open(logs[w]) as f:
                lines = [ln for ln in f if ln.startswith("RESULT:")]
            if not lines:
                raise RuntimeError(f"writer {w} exited 0 without a RESULT line:\n{_tail(w)}")
            res[w] = json.loads(lines[-1][7:])
        wall = time.monotonic() - w0
        steal = (_steal_jiffies() - s0) / max(wall * 100.0 * cores, 1e-9)
        span = max(r["t1"] for r in res.values()) - min(r["t0"] for r in res.values())
        total = sum(r["events"] for r in res.values())
        assert all(r["skipped"] == 0 for r in res.values()), res
        return {
            "events_per_sec": total / span if span else 0.0,
            "events": total,
            "span_sec": round(span, 2),
            "steal_frac": round(steal, 4),
            "replans": sum(r["replans"] for r in res.values()),
            "rebases": sum(r["rebases"] for r in res.values()),
            "compact_sec": round(sum(r["compact_sec"] for r in res.values()), 2),
            "compactions": sum(r["compactions"] for r in res.values()),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_multiwriter_bench(
    n_events: int = 240_000,
    n_convs: int = 20_000,
    n_files: int = 12,
    files_per_batch: int = 1,
    n_buckets: int = 16,
    rounds: int = 3,
    max_steal: float = 0.05,
    spark: Any = None,
) -> dict[str, Any]:
    """See module docstring. The template is bootstrapped from writer A's
    base and PRIMED with one disjoint-key batch so its summary carries
    steady-state geometry — every measured batch then takes the O(batch)
    MoR delta path (the regime where two writers on a 10^10-row table
    actually coexist; bootstrap-transient CoW contention is a different,
    rarer animal and is covered by the process test instead)."""
    geo = dict(n_convs=n_convs, max_turns=10, n_files=n_files)
    fix_a = ensure_fixture(n_events=n_events, evolve_at=0.1, **geo)
    fix_b = ensure_renamed_fixture(
        "convB-", seed=43, n_events=n_events, evolve_at=0.1, **geo
    )
    prime = ensure_renamed_fixture(
        "convP-", seed=44, n_events=max(n_events // n_files, 1),
        n_convs=n_convs, max_turns=10, n_files=1,
    )
    feeds = {"A": fix_a["feed_dir"], "B": fix_b["feed_dir"]}

    from palimpzest_spark.cdc.lake import SnapshotLakeTable
    from palimpzest_spark.cdc.merge import bootstrap
    from palimpzest_spark.cdc.runner import replay_batches
    from palimpzest_spark.session import get_spark

    cpus = max(len(os.sched_getaffinity(0)), 2)
    template = tempfile.mkdtemp(prefix="pz_mw_tmpl_", dir=_WORK_ROOT)
    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="mw-template", master=f"local[{cpus}]",
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    try:
        table = SnapshotLakeTable(template, n_buckets=n_buckets)
        bootstrap(spark, table, fix_a["base"])
        replay_batches(spark, table, prime["feed_dir"], files_per_batch=1,
                       writer_id="prime")
    finally:
        if own_session:
            spark.stop()

    rows: list[dict[str, Any]] = []
    try:
        for rnd in range(max(rounds, 1)):
            order = ("separate", "shared") if rnd % 2 == 0 else ("shared", "separate")
            row: dict[str, Any] = {}
            for arm in order:
                row[arm] = _run_arm(
                    arm == "shared", template, feeds, cpus // 2, n_buckets,
                    files_per_batch,
                )
            rows.append(row)
    finally:
        shutil.rmtree(template, ignore_errors=True)

    clean = [
        r for r in rows
        if r["separate"]["steal_frac"] <= max_steal
        and r["shared"]["steal_frac"] <= max_steal
    ] or rows
    sep = statistics.median(r["separate"]["events_per_sec"] for r in clean)
    shr = statistics.median(r["shared"]["events_per_sec"] for r in clean)
    # the headline is the median of PER-ROUND ratios over clean rounds: the
    # two arms of one round share a host-weather window, so their ratio
    # cancels noise that a cross-round median-of-medians would keep
    ratios = [
        r["shared"]["events_per_sec"] / r["separate"]["events_per_sec"]
        for r in clean if r["separate"]["events_per_sec"]
    ]
    return {
        "metric": "cdc_multiwriter_contention_ratio",
        "separate_events_per_sec": round(sep, 1),
        "shared_events_per_sec": round(shr, 1),
        "contention_ratio": round(statistics.median(ratios), 3) if ratios else None,
        "round_ratios": [round(x, 3) for x in ratios],
        "shared_rebases": sum(r["shared"]["rebases"] for r in rows),
        "shared_replans": sum(r["shared"]["replans"] for r in rows),
        "n_clean_rounds": len(
            [r for r in rows
             if r["separate"]["steal_frac"] <= max_steal
             and r["shared"]["steal_frac"] <= max_steal]
        ),
        "rounds": [
            {arm: {k: (round(v, 1) if k == "events_per_sec" else v)
                   for k, v in r[arm].items()}
             for arm in ("separate", "shared")}
            for r in rows
        ],
        "writers": 2,
        "cores_per_writer": max(len(os.sched_getaffinity(0)), 2) // 2,
    }


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Two-writer shared-table contention bench (one JSON line)"
    )
    ap.add_argument("--events", type=int, default=240_000,
                    help="events per writer")
    ap.add_argument("--convs", type=int, default=20_000)
    ap.add_argument("--files", type=int, default=12)
    ap.add_argument("--fpb", type=int, default=1)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--max-steal", type=float, default=0.05)
    args = ap.parse_args(argv)
    out = run_multiwriter_bench(
        n_events=args.events, n_convs=args.convs, n_files=args.files,
        files_per_batch=args.fpb, n_buckets=args.buckets,
        rounds=args.rounds, max_steal=args.max_steal,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
