"""Filter operators.

Reference: ``FilteredScan`` → ``NonLLMFilter`` (``query/operators/filter.py:
125-162``): a Python predicate per record sets ``_passed_operator``; the
executor drops failures.

Spark-first: a relational predicate is a ``Column`` expression — Catalyst
pushes it into the parquet scan (check ``PushedFilters`` in
``.explain("formatted")``), which the reference could never do. Opaque
predicates run as an Arrow-vectorized pandas UDF returning a boolean Series
(batch-at-a-time, never per-row).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def filter_records(
    df: DataFrame,
    predicate: Column | str | Callable[[pd.DataFrame], pd.Series],
    depends_on: list[str] | None = None,
) -> DataFrame:
    """Filter by a Column expr / SQL string (fast path, pushdown-eligible) or
    a vectorized pandas predicate (slow path, Arrow-batched)."""
    if isinstance(predicate, (Column, str)):
        return df.filter(predicate)

    cols = [c for c in (depends_on or df.columns) if c in df.columns]

    @F.pandas_udf(T.BooleanType())
    def _pred(batch: pd.DataFrame) -> pd.Series:
        return predicate(batch).astype(bool)

    return df.filter(_pred(F.struct(*[F.col(c) for c in cols])))
