"""Convert (map / flat_map) operators.

Reference semantics: ``ConvertScan`` → ``NonLLMConvert``
(``query/operators/convert.py:198-259``): a UDF receives the record's fields
and returns a dict of *new* fields (one-to-one) or a list of dicts
(one-to-many fan-out, each child tagged with ``_cardinality_idx`` —
``convert.py:59-88``). Output schema = input schema ∪ generated fields.

Spark-first design: the user function is an **Arrow-vectorized pandas UDF**
(batch in, batch out — never per-row Python, per BASELINE.json north_star).

- one-to-one → the UDF returns a ``StructType`` column; we splat it with
  ``select("*", "out.*")``. Catalyst prunes the UDF's inputs to exactly the
  columns it declares (``depends_on`` in the reference, ``optimizer.py:344-370``).
- one-to-many → the UDF returns ``ArrayType(StructType)``; ``posexplode``
  supplies the cardinality index natively (no Python loop).

Relational (column-expression) converts should NOT go through a UDF at all —
``map_expr`` keeps them JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from palimpzest_spark import lineage


def map_expr(df: DataFrame, exprs: dict[str, Column], track_lineage: bool = False) -> DataFrame:
    """One-to-one convert expressed in pure column expressions (fast path).

    This is what the reference's NonLLMConvert becomes when the UDF is
    actually relational — stays inside WholeStageCodegen, no Arrow crossing.
    """
    out = df
    for name, col in exprs.items():
        out = out.withColumn(name, col)
    if track_lineage and lineage.ROW_ID in df.columns:
        out = lineage.derive_child_id(out, "map")
    return out


def map_records(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_fields: T.StructType,
    depends_on: list[str] | None = None,
    track_lineage: bool = False,
) -> DataFrame:
    """One-to-one convert via a vectorized pandas UDF.

    ``fn``: pandas DataFrame (the ``depends_on`` columns) -> pandas DataFrame
    with exactly ``output_fields`` columns. Generated fields are appended to
    the input schema, mirroring ``convert.py:224-259``.
    """
    cols = depends_on or df.columns
    cols = [c for c in cols if c in df.columns]

    @F.pandas_udf(output_fields)
    def _convert(batch: pd.DataFrame) -> pd.DataFrame:
        out = fn(batch)
        return out[[f.name for f in output_fields.fields]]

    out = df.withColumn("__out", _convert(F.struct(*[F.col(c) for c in cols])))
    keep = [c for c in df.columns if c not in {f.name for f in output_fields.fields}]
    out = out.select(*keep, "__out.*")
    if track_lineage and lineage.ROW_ID in df.columns:
        out = lineage.derive_child_id(out, "map")
    return out


def flat_map_records(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.Series],
    output_fields: T.StructType,
    depends_on: list[str] | None = None,
    keep_input_fields: bool = True,
    track_lineage: bool = False,
) -> DataFrame:
    """One-to-many convert: UDF emits a list<struct> per row, then posexplode.

    ``fn``: pandas DataFrame -> pandas Series of list[dict] (one list per input
    row; empty list = row produces nothing). The explode position becomes
    ``_cardinality_idx``, matching the reference's fan-out tagging
    (``convert.py:59-88``).
    """
    cols = depends_on or df.columns
    cols = [c for c in cols if c in df.columns]

    @F.pandas_udf(T.ArrayType(output_fields))
    def _fanout(batch: pd.DataFrame) -> pd.Series:
        return fn(batch)

    arr = df.withColumn("__fan", _fanout(F.struct(*[F.col(c) for c in cols])))
    base = [c for c in df.columns if keep_input_fields and c != lineage.CARDINALITY_IDX]
    exploded = arr.select(
        *base, F.posexplode("__fan").alias(lineage.CARDINALITY_IDX, "__child")
    )
    new_names = {f.name for f in output_fields.fields}
    keep = [c for c in exploded.columns if c not in new_names and c != "__child"]
    out = exploded.select(*keep, "__child.*")
    if track_lineage and lineage.ROW_ID in df.columns:
        out = lineage.derive_child_id(out, "flat_map")
    return out
