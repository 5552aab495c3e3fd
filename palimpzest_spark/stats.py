"""Execution statistics — the reference's per-op ``RecordOpStats`` /
``ExecutionStats`` surface (``records.py:343-433``, ``core/models.py:114-278``),
re-expressed Spark-first.

The reference materializes every operator's output as python records and
counts them; here each fluent ``Dataset`` operator gets a **CollectMetrics**
node (``DataFrame.observe``) that rides the SAME job as the user's action —
per-op output row counts and derived selectivities cost zero extra Spark
jobs and zero extra scans. Wall-clock is taken around the action via the
collector's ``timed()`` context.

This is the sampling input the reference's ``SampleBasedCostModel``
(``cost_model.py:80-151``) consumes; here Catalyst+AQE do plan choice, so
the stats serve observability and regression tracking instead of plan
search.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class OpStats:
    """One operator's observed output: rows out + selectivity vs its input
    (the reference's per-op ``RecordOpStats`` aggregate view)."""

    op_idx: int
    op_name: str
    rows_out: int | None
    selectivity: float | None  # rows_out / previous op's rows_out


@dataclass
class ExecutionStats:
    """Per-query roll-up (the reference's ``ExecutionStats``): ordered op
    stats + wall-clock of the observed action."""

    ops: list[OpStats] = field(default_factory=list)
    wall_sec: float | None = None

    def to_dict(self) -> dict:
        return {
            "wall_sec": self.wall_sec,
            "ops": [
                {
                    "op": f"{o.op_idx}:{o.op_name}",
                    "rows_out": o.rows_out,
                    "selectivity": o.selectivity,
                }
                for o in self.ops
            ],
        }


class StatsCollector:
    """Attach to a ``Dataset`` via ``.with_stats(collector)``; every fluent
    operator after that point records its output cardinality.

    Usage::

        sc = StatsCollector()
        ds = Dataset.from_parquet(spark, path).with_stats(sc)
        out = ds.filter(...).map(...).df
        with sc.timed():
            out.collect()              # ONE action; metrics ride along
        stats = sc.execution_stats()   # per-op rows/selectivity + wall
    """

    def __init__(self):
        self._ops: list[tuple[str, Observation]] = []
        self._wall: float | None = None

    def attach(self, df: DataFrame, op_name: str) -> DataFrame:
        obs = Observation()
        out = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        self._ops.append((op_name, obs))
        return out

    @contextmanager
    def timed(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._wall = time.perf_counter() - t0

    @staticmethod
    def _rows(obs: Observation) -> int | None:
        # non-blocking: Observation.get with no prior action would block on
        # the listener bus forever (see cdc/merge.py) — poll briefly instead
        # and report None for ops whose metrics never arrived (e.g. pruned
        # subtrees or no action yet).
        jo = getattr(obs, "_jo", None)
        deadline = time.time() + 2.0
        while jo is not None and time.time() < deadline:
            if jo.getRowOrEmpty().isDefined():
                return int(obs.get["rows"])
            time.sleep(0.02)
        return None

    def execution_stats(self) -> ExecutionStats:
        ops: list[OpStats] = []
        prev: int | None = None
        for i, (name, obs) in enumerate(self._ops):
            rows = self._rows(obs)
            sel = None
            if rows is not None and prev is not None and prev > 0:
                sel = rows / prev
            ops.append(OpStats(op_idx=i, op_name=name, rows_out=rows, selectivity=sel))
            if rows is not None:
                prev = rows
        return ExecutionStats(ops=ops, wall_sec=self._wall)
