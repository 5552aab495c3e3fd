"""Distinct operator.

Reference: ``DistinctOp`` (``query/operators/distinct.py:8-62``) keeps a
seen-set of ``hash(json(projection onto distinct_cols)))`` — first occurrence
wins, state unbounded.

Spark-first: ``dropDuplicates(cols)`` — a hash aggregate with partial
map-side dedup, spill-safe, shuffle only on the distinct columns. (Streaming
variant: ``dropDuplicatesWithinWatermark``; its dual — last-writer-wins — is
the CDC engine's in-batch dedup, ``cdc/merge.py``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def distinct_records(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    return df.dropDuplicates(cols) if cols else df.distinct()
