"""Join operators.

Reference: ``RelationalJoin`` (``query/operators/join.py:179-286``) is a
nested-loop equi-join over all pairs with a ThreadPool(64); output schema is
left fields + right fields, with colliding right-side names renamed
``{name}_right`` and unmatched outer rows null-filled
(``core/lib/schemas.py:163-166``, ``core/elements/records.py:252-261``).

Spark-first: ``df.join`` — Catalyst picks broadcast-hash / shuffle-hash /
sort-merge (the reference has only nested-loop). We reproduce the reference's
output-naming contract explicitly because Spark otherwise keeps ambiguous
duplicate names. Semi/anti (absent in the reference, free in Spark) are
exposed too.

Scale notes: callers can pass ``broadcast_right=True`` for dimension tables
(drops the shuffle entirely); AQE skew-join handles hot keys at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOW_MAP = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full_outer",
    "full": "full_outer",
    "semi": "left_semi",
    "anti": "left_anti",
}


def relational_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    broadcast_right: bool = False,
    right_suffix: str = "_right",
) -> DataFrame:
    """Equi-join with the reference's ``*_right`` renaming contract.

    Every right-side column whose name collides with a left-side column
    (including the join keys, as in ``records.py:252-256``) is emitted as
    ``{name}{right_suffix}``. Unmatched rows in outer joins are null-filled,
    which ``df.join`` already guarantees.
    """
    spark_how = _HOW_MAP[how]
    lcols = set(left.columns)
    renames = {c: c + right_suffix for c in right.columns if c in lcols}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    if broadcast_right:
        r = F.broadcast(r)

    cond = None
    for k in on:
        rk = renames.get(k, k)
        clause = left[k].eqNullSafe(r[rk]) if spark_how == "full_outer" else (left[k] == r[rk])
        cond = clause if cond is None else (cond & clause)

    joined = left.join(r, cond, spark_how)
    if spark_how in ("left_semi", "left_anti"):
        return joined
    return joined
