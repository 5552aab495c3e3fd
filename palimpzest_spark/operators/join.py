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
        # plain == for EVERY join type, full_outer included: standard SQL
        # key equality never matches NULLs (each null-key row surfaces as
        # an unmatched null-filled row). eqNullSafe here would cross-join
        # the two sides' null-key rows — on realistically null-heavy keys
        # that's a quadratic blowup, and it diverges from the DuckDB
        # oracle's `ON b.k = u.k`.
        clause = left[k] == r[rk]
        cond = clause if cond is None else (cond & clause)

    joined = left.join(r, cond, spark_how)
    if spark_how in ("left_semi", "left_anti"):
        return joined
    return joined


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    right_suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the latest
    ``right_ts`` ≤ ``left_ts`` (``backward``; ``forward`` = earliest ≥),
    matching on equality keys ``on``.

    Absent in both the reference (SURVEY §2.3 "missing join types") and core
    Spark. Implemented as union + window rather than a range join: tag both
    sides, union on the key columns, sort each key group by time, and carry
    the most recent right row forward with ``last(..., ignorenulls=True)``.
    ONE shuffle of (keys, ts, right-payload) — a range-condition join would
    be a cross-product-per-key (O(n·m)); this is O((n+m) log (n+m)) and
    skew-splittable by AQE like any window sort.
    """
    from pyspark.sql import Window

    lcols = set(left.columns)
    rrenames = {c: c + right_suffix for c in right.columns if c in lcols and c not in on}
    r = right
    for old, new in rrenames.items():
        r = r.withColumnRenamed(old, new)
    rts = rrenames.get(right_ts, right_ts)

    rpayload = [c for c in r.columns if c not in on]
    # left_ts travels as _t and is re-aliased on output — including it in the
    # payload too would select `ts` twice (ambiguous reference)
    lpayload = [c for c in left.columns if c not in on and c != left_ts]

    # right payload travels as ONE struct so the carried values always come
    # from the same right row (per-column last(ignorenulls) would stitch
    # together different rows when a right column is legitimately null)
    rstruct_t = F.struct(*[F.col(c) for c in rpayload])
    lt = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lpayload],
        F.lit(None).cast(
            r.select(rstruct_t.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    rt = r.select(
        *on,
        F.col(rts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpayload],
        rstruct_t.alias("_r"),
    )
    unioned = lt.unionByName(rt)

    # deterministic tie resolution: two right rows sharing (key, right_ts)
    # must always yield the SAME winner or repeated runs (and the oracle
    # compare) see different attached payloads — the struct itself is the
    # final sort key (lexicographic over its fields). Maps are not
    # orderable in Spark; a map-typed right payload falls back to the
    # ts-only order (documented nondeterminism under exact duplicates).
    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    rstruct_dt = r.select(rstruct_t.alias("_r")).schema["_r"].dataType
    tiebreak = [F.asc_nulls_first("_r")] if _orderable(rstruct_dt) else []

    if direction == "backward":
        # right rows sort before left rows at equal _t so an exact-ts match
        # is visible to the left row (ties: ts_right == ts_left matches)
        w = (
            Window.partitionBy(*on)
            .orderBy(F.asc("_t"), F.asc("_is_left"), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.desc("_t"), F.asc("_is_left"), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    carried = unioned.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_is_left") == 1)
        .select(
            *on,
            F.col("_t").alias(left_ts),
            *[F.col(c) for c in lpayload],
            *[F.col(f"_r.{c}").alias(c) for c in rpayload],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    chunk_seconds: int,
    end_inclusive: bool = False,
) -> DataFrame:
    """Interval/range join: left rows whose timestamp ``left_point`` falls in
    ``[right_start, right_end)`` (``right_end`` inclusive when
    ``end_inclusive``). Absent in the reference (SURVEY.md §2.3 "missing
    join types"); in Spark the naive formulation is a BroadcastNestedLoopJoin
    (O(|L|·|R|), only viable when one side broadcasts).

    Scale path — chunked equi-join: both sides map onto fixed time chunks of
    ``chunk_seconds`` (left: the point's chunk; right: every chunk the
    interval overlaps, via ``explode(sequence(...))``), equi-join on the
    chunk id, then the exact range predicate. Each point lives in EXACTLY one
    chunk, so no dedup is needed; an interval of length ≤ chunk_seconds
    lands in ≤ 2 chunks, so the shuffled right side is ≤ 2×|R|. Both sides
    shuffle by chunk id — a plain hash-partitioned equi-join that survives
    large×large inputs where the nested-loop plan cannot; AQE splits
    dense-chunk skew. Pick ``chunk_seconds`` ≈ the max interval length.
    """
    lc = F.floor(F.unix_timestamp(F.col(left_point)) / F.lit(chunk_seconds))
    rc_lo = F.floor(F.unix_timestamp(F.col(right_start)) / F.lit(chunk_seconds))
    rc_hi = F.floor(F.unix_timestamp(F.col(right_end)) / F.lit(chunk_seconds))
    l = left.withColumn("_chunk", lc.cast("long"))
    r = right.withColumn("_chunk", F.explode(F.sequence(rc_lo.cast("long"), rc_hi.cast("long"))))
    upper = (
        F.col(left_point) <= F.col(right_end)
        if end_inclusive
        else F.col(left_point) < F.col(right_end)
    )
    return (
        l.join(r, on="_chunk", how="inner")
        .filter((F.col(left_point) >= F.col(right_start)) & upper)
        .drop("_chunk")
    )
