"""Physical-layout helpers shared across operators (guide §2.5/§6).

``fan_out``: scale-adaptive repartition after a low-parallelism scan. Parquet
split assignment is by compressed bytes and collapses to ROW-GROUP
granularity, so a small single-row-group file is ONE scan task no matter how
small ``spark.sql.files.maxPartitionBytes`` is — capping every downstream
per-row stage at that parallelism (at sf1.0 the 5.7 MB documents table ran
whole pipelines on 2 of 32 cores). One cheap round-robin repartition of the
narrow projection restores full fan-out.

Adaptive, not constant-tuned: the target is ``defaultParallelism`` (derived
from the session's core/executor count) and the repartition is SKIPPED when
the scan already fans out to at least half of it — a real 100 TB input
arrives in thousands of splits, so this is a no-op there and never adds a
shuffle of heavyweight payloads at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# Default size floor: below ~1 MB of (column-pruned, optimizer-estimated)
# input even one core finishes LIGHT downstream work in well under a second,
# so the repartition round-trip costs more than it saves (measured:
# text_repetition_stats at sf0.1 ran 0.86s unfanned vs 1.18s fanned).
# Operators whose per-byte CPU is heavy (interpreted shingling + per-gram
# hashing: ~10x the cost of a line explode) pass a lower floor — for them
# the fan-out already pays at a few hundred KB (measured: minhash at sf0.1
# 1.8s fanned vs 3.7s unfanned). Absolute byte counts, not tuned to a core
# count — any input where the choice matters is orders of magnitude bigger.
_MIN_FAN_BYTES = 1 << 20


def fan_out(
    df: DataFrame, min_bytes: int = _MIN_FAN_BYTES, per_task_bytes: int | None = None
) -> DataFrame:
    """``per_task_bytes`` (opt-in, for ARROW-kernel consumers): cap the
    fan-out width so every task carries at least that much input. A Python
    worker round trip costs ~5-10ms per task regardless of batch size, so
    fanning a small input to default.parallelism (4x cores) drowns the
    kernel in fixed overhead — at sf0.1 the dedup gram kernel ran 128
    ~20-doc tasks for ~1s of pure worker cost vs ~0.35s capped. JVM-side
    consumers (regex/explode stages) keep the uncapped width: their
    per-task cost is microseconds and extra slices only help stragglers.
    At real scale the estimate is huge and the cap is inactive."""
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        if est < min_bytes:
            return df
        target = df.sparkSession.sparkContext.defaultParallelism
        if per_task_bytes:
            target = min(target, max(est // per_task_bytes, 1))
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (unusual plan shapes)
        return df
    if cur * 2 >= target:
        return df
    return df.repartition(target)
