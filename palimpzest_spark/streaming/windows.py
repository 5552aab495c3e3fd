"""Structured Streaming layer: watermarked window aggregates + custom
stateful operators.

The reference has no streaming at all (SURVEY.md §2.6); its nearest analogue
is the join's retain-inputs buffer and the queue-pipelined executor. This
module provides the standard streaming surface the target engine needs
beyond the CDC path (which lives in ``cdc/runner.py``):

- tumbling / sliding windowed aggregation with late-data handling
  (``withWatermark`` bounds state; late rows beyond the watermark drop);
- session windows (``session_window`` — gap-based, stateful);
- a custom stateful operator via ``applyInPandasWithState`` (running
  per-key max with version guard — the streaming twin of the CDC LWW rule).

Everything here is source-agnostic: tests drive it with a file source +
``availableNow`` trigger so a finite directory behaves like a stream.
Event-time columns are cast to TIMESTAMP (LTZ): parquet sources surface
TIMESTAMP_NTZ, which watermarks reject; the session timezone is UTC so the
cast is a no-op on the values.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_from_directory(
    spark: SparkSession, path: str, schema: T.StructType, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling window count+sum with a watermark: state for a window is
    dropped once the watermark passes its end — bounded state at any scale."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), key_col, "n")
    )


def session_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based session windows (stateful; closes when the watermark moves
    past last-event + gap)."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


# --- custom stateful operator -----------------------------------------------------

_RUNMAX_STATE = T.StructType(
    [
        T.StructField("best_value", T.DoubleType()),
        T.StructField("best_seq", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)
_RUNMAX_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("best_value", T.DoubleType()),
        T.StructField("best_seq", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def running_max_by_key(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value", seq_col: str = "event_id"
) -> DataFrame:
    """Custom stateful op via ``applyInPandasWithState``: per key, track the
    max value and the sequence number that achieved it, across microbatches.

    This is the plan shape for any 'reference operator Spark lacks' that
    needs cross-batch state (the PZ join's retain-inputs buffer, a streaming
    dedup, a monotonic-version tracker). Batches arrive as Arrow pandas
    frames, so the per-key update is vectorized within each group.

    The output schema is derived from the INPUT's key column (name + type)
    — ``_RUNMAX_OUT`` is just the default-parameter shape; null values are
    skipped (``n_seen`` still advances) rather than crashing ``idxmax``.
    """
    out_schema = T.StructType(
        [T.StructField(key_col, events.schema[key_col].dataType)]
        + list(_RUNMAX_OUT.fields[1:])
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            best_value, best_seq, n_seen = state.get
        else:
            best_value, best_seq, n_seen = float("-inf"), -1, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            # drop rows where EITHER column is null: a NaN seq on the row
            # holding the max value would crash int(NaN) just like the
            # value-null case this guard fixed first (r6 ADVICE)
            ok = pdf[[value_col, seq_col]].dropna()
            if not len(ok):
                continue  # no fully-populated row in this microbatch
            i = ok[value_col].idxmax()
            if ok[value_col].loc[i] > best_value:
                best_value = float(ok[value_col].loc[i])
                best_seq = int(ok[seq_col].loc[i])
        state.update((best_value, best_seq, n_seen))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "best_value": [best_value],
                "best_seq": [best_seq],
                "n_seen": [n_seen],
            }
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_RUNMAX_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory_sink(stream_df: DataFrame, query_name: str, output_mode: str = "append"):
    """Drive a finite directory 'stream' to completion into a memory sink
    (test harness: availableNow + processAllAvailable)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exactly-once event dedup: drop re-deliveries of the same key
    arriving within the watermark horizon (``dropDuplicatesWithinWatermark``
    — state per key is evicted once the watermark passes, so state is
    bounded by event-time disorder, not stream length). This is the
    at-least-once → exactly-once front gate for a CDC feed whose source can
    re-deliver events; the merge's idempotent LWW handles anything older
    than the horizon."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "right_ts",
    within: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: left rows matched to right rows with the
    same ``on`` key where ``right_ts ≤ left_ts ≤ right_ts + within``. Both
    sides carry watermarks and the time-bound predicate, so each side's
    buffered state is evicted once the watermark clears the interval —
    bounded state, the streaming twin of the batch as-of/range join
    (operators/join.py)."""
    lw = left.withColumn(left_ts, F.col(left_ts).cast("timestamp")).withWatermark(
        left_ts, watermark
    )
    rw = right.withColumn(right_ts, F.col(right_ts).cast("timestamp")).withWatermark(
        right_ts, watermark
    )
    cond = (
        (lw[on] == rw[on])
        & (lw[left_ts] >= rw[right_ts])
        & (lw[left_ts] <= rw[right_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, on=cond, how="inner").drop(rw[on])
