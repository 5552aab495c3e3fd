"""Oracle-parity tests: every ``queries()`` entry vs. its DuckDB twin.

Mimics the driver's CORRECTNESS gate (row count + column names + an
order-insensitive value comparison) at sf0.01, so breakage is caught before
the driver runs.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from palimpzest_spark.plans.queries import ORACLE_SQL, QUERIES
from palimpzest_spark.sources.registry import TABLES

from tests.conftest import SF_TEST


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_TEST}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _keyval(v) -> str:
    if v is None:
        return "\x00None"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NaN"
        return f"{v:.6f}"
    return str(v)


def _render(v) -> str:
    """The driver-faithful value canonicalization: rendered values must match
    EXACTLY, preserving int-vs-float-ness. DuckDB HUGEINT sums come back from
    fetchdf() as float64 ('99111.0') while Spark emits int64 ('99111') — the
    r1 isclose() comparison hid exactly that class of driver hash failure."""
    if v is None:
        return "\x00None"
    if isinstance(v, float):  # covers np.float64 (subclass)
        return "\x00NaN" if math.isnan(v) else repr(float(v))
    try:
        import numpy as np

        if isinstance(v, (int, np.integer)):
            return repr(int(v))
    except ImportError:
        pass
    return str(v)


def _canon(df):
    """Sort columns by name, then rows by normalized values → comparable list."""
    cols = sorted(df.columns)
    out = df[cols].astype(object).where(df[cols].notna(), None)
    rows = [tuple(r) for r in out.itertuples(index=False)]
    return cols, sorted(rows, key=lambda row: tuple(_keyval(v) for v in row))


def _eq(a, b) -> bool:
    return _render(a) == _render(b)


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLE_SQL))
def test_query_matches_oracle(spark, name):
    got = QUERIES[name](spark, SF_TEST).toPandas()
    want = _duck(ORACLE_SQL[name])

    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )

    gc, grows = _canon(got)
    wc, wrows = _canon(want)
    mismatches = [
        (i, gr, wr)
        for i, (gr, wr) in enumerate(zip(grows, wrows))
        if not all(_eq(a, b) for a, b in zip(gr, wr))
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]} (cols {gc})"
