"""Aggregate operators.

Reference:
- scalar aggs ``Count/Sum/Average/Min/Max`` over a single field, whole-table,
  with un-parseable values silently skipped
  (``query/operators/aggregate.py:192-528``, numeric whitelist 202-209);
- ``ApplyGroupByOp`` (``aggregate.py:33-189``): hash group-by with an
  init/merge/final state machine, agg funcs ``count, average, sum, min, max,
  list, set``; output columns named ``f"{func}({field})"``
  (``core/elements/groupbysig.py:55-59``).

Spark-first: ``df.agg`` / ``df.groupBy().agg`` — Catalyst's hash aggregate
gives the partial(map-side)/final split the reference hand-rolled, for free,
and spills when groups don't fit. ``list`` → ``collect_list``, ``set`` →
``collect_set`` (order-insensitive, as in the reference's set semantics).
"Silently skip unparseable" → ``try_cast`` to double (nulls are ignored by
Spark aggs), matching ``aggregate.py:214-221``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALAR_FUNCS = {
    "count": F.count,
    "sum": F.sum,
    "average": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "list": F.collect_list,
    "set": F.collect_set,
}

_NUMERIC_ONLY = {"sum", "average", "avg"}


def _agg_col(func: str, col_name: str) -> Column:
    try:
        f = _SCALAR_FUNCS[func]
    except KeyError:
        raise ValueError(f"unsupported agg func {func!r}; one of {sorted(_SCALAR_FUNCS)}")
    col: Column = F.col(col_name)
    if func in _NUMERIC_ONLY:
        # skip-unparseable semantics (aggregate.py:214-221): cast failures
        # become NULL and Spark aggs ignore NULLs.
        col = col.cast("string").try_cast("double")
    return f(col)


def scalar_agg(df: DataFrame, func: str, col_name: str, alias: str | None = None) -> DataFrame:
    """Whole-table single-field aggregate (Dataset.count/sum/average/min/max,
    ``dataset.py:550-573``)."""
    out_name = alias or f"{func}({col_name})"
    return df.agg(_agg_col(func, col_name).alias(out_name))


@dataclass
class GroupBySig:
    """Mirror of the reference's GroupBySig (``groupbysig.py:21-75``):
    group-by fields + parallel lists of (agg func, agg field)."""

    group_by_fields: list[str]
    agg_funcs: list[str]
    agg_fields: list[str]
    aliases: list[str] | None = field(default=None)

    def output_names(self) -> list[str]:
        if self.aliases:
            return list(self.aliases)
        # reference naming contract, groupbysig.py:55-59
        return [f"{f}({c})" for f, c in zip(self.agg_funcs, self.agg_fields)]


def group_by_agg(df: DataFrame, sig: GroupBySig) -> DataFrame:
    aggs = [
        _agg_col(func, col).alias(name)
        for func, col, name in zip(sig.agg_funcs, sig.agg_fields, sig.output_names())
    ]
    return df.groupBy(*sig.group_by_fields).agg(*aggs)
