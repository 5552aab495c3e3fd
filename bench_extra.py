#!/usr/bin/env python
"""Round-6 measurement harness (bench.py is FROZEN for the driver; all extra
measurement lives here — guide §1.4/§1.5).

Times individual queries with the noop sink (median of N warm trials after an
untimed warm pass), labels jobs, tags each trial with its /proc/stat steal
fraction, and optionally dumps .explain("formatted") per query.

Usage:
  python bench_extra.py [--sf DIR] [--trials 3] [--explain-dir plans/r06] q1 q2 ...
  (no query names = the bench.py HEADLINE list)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _steal_jiffies() -> int:
    try:
        allowed = {f"cpu{c}" for c in os.sched_getaffinity(0)}
        total = 0
        with open("/proc/stat") as f:
            for line in f:
                parts = line.split()
                if parts and parts[0] in allowed and len(parts) > 8:
                    total += int(parts[8])
        return total
    except OSError:
        return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="", help="explain file suffix, e.g. _before/_after")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from palimpzest_spark.plans.queries import QUERIES
    from palimpzest_spark.session import get_spark

    names = args.queries
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in QUERIES]

    spark = get_spark(app_name="bench_extra", master=f"local[{args.cpus}]")
    cores = max(len(os.sched_getaffinity(0)), 1)
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(txt)
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples, steals = [], []
        for t in range(args.trials):
            spark.sparkContext.setJobDescription(f"timed:{name}#{t}")
            s0, t0 = _steal_jiffies(), time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            samples.append(round(wall, 3))
            steals.append(round((_steal_jiffies() - s0) / max(wall * 100.0 * cores, 1e-9), 4))
        spark.sparkContext.setJobDescription(None)
        clean = [s for s, st in zip(samples, steals) if st <= 0.05] or samples
        clean.sort()
        out[name] = {
            "median_clean": clean[len(clean) // 2],
            "samples": samples,
            "steal": steals,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
