"""Project operator.

Reference: ``ProjectOp`` (``query/operators/project.py:8-53``) keeps the
listed columns. Spark-first: ``df.select`` — Catalyst column pruning then
narrows the parquet ReadSchema to exactly these columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def project_records(df: DataFrame, cols: list[str]) -> DataFrame:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise KeyError(f"project: unknown columns {missing}")
    return df.select(*cols)
