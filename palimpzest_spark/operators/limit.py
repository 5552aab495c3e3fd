"""Limit operator.

Reference: ``LimitScanOp`` (``query/operators/limit.py:8-55``) is a
pass-through; the *executor* stops the pipeline after ``limit`` outputs
(``single_threaded_execution_strategy.py:96-98``).

Spark-first: ``df.limit(n)`` — Catalyst's CollectLimit short-circuits the
scan the same way, distributed. For deterministic results (oracle compare)
pair with an ``orderBy``: Spark's bare limit, like the reference's, is
arrival-order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def limit_records(df: DataFrame, n: int, order_by: list[Column] | None = None) -> DataFrame:
    if order_by:
        df = df.orderBy(*order_by)
    return df.limit(n)
