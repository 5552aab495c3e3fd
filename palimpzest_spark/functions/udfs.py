"""The reference's schema-conversion UDF library, vectorized.

Reference ``utils/udfs.py:14-56`` ships three record-level converters its
tests exercise; here each is a DataFrame combinator built on the engine's
convert operators (Arrow-batched, never per-row driver Python):

- ``url_to_file``   (ref :14-26): URL column → (filename, timestamp,
  contents) via stdlib ``urllib`` (supports file:// for offline use; the
  reference uses ``requests``). Fetch runs inside ``mapInPandas`` so a
  million-URL crawl parallelizes by partition.
- ``file_to_xls``   (ref :28-31): binary contents → (sheet_names,
  number_sheets) with the stdlib SpreadsheetML reader.
- ``xls_to_tables`` (ref :34-56): one row per sheet with name / filename /
  header / stringified rows (first 100 per the reference's MAX_ROWS cap) —
  a 1→many fan-out through ``flat_map_records`` so every output row carries
  ``_cardinality_idx``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from palimpzest_spark.operators.convert import flat_map_records, map_records

MAX_ROWS = 100  # reference constants.MAX_ROWS cap in xls_to_tables


def url_to_file(df: DataFrame, url_col: str = "url", timestamp: str = "") -> DataFrame:
    """URL rows → (url, filename, timestamp, contents:binary).

    The reference stamps ``datetime.now()`` per record (``udfs.py:18``) —
    nondeterministic across executors; here the caller passes ``timestamp``
    (empty = unstamped) so replays are reproducible. Errors fetch as b""
    like the reference's except branch."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.request import urlopen

        for pdf in batches:
            names, contents = [], []
            for u in pdf[url_col].fillna(""):
                names.append(u.split("/")[-1])
                try:
                    with urlopen(u) as r:  # noqa: S310 — caller controls URLs
                        contents.append(r.read())
                except Exception:
                    contents.append(b"")
            yield pd.DataFrame(
                {
                    url_col: pdf[url_col],
                    "filename": names,
                    "timestamp": [timestamp] * len(pdf),
                    "contents": contents,
                }
            )

    return df.select(url_col).mapInPandas(
        fetch,
        schema=f"{url_col} string, filename string, timestamp string, contents binary",
    )


def file_to_xls(df: DataFrame, contents_col: str = "contents") -> DataFrame:
    """Append (sheet_names, number_sheets) to file rows (ref ``udfs.py:28-31``)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        from palimpzest_spark.sources.xlsx_lite import sheet_names

        out = []
        for b in batch[contents_col]:
            try:
                out.append(sheet_names(bytes(b)))
            except Exception:
                out.append([])
        return pd.DataFrame(
            {"sheet_names": out, "number_sheets": [len(s) for s in out]}
        )

    schema = T.StructType(
        [
            T.StructField("sheet_names", T.ArrayType(T.StringType())),
            T.StructField("number_sheets", T.IntegerType()),
        ]
    )
    return map_records(df, fn, schema, depends_on=[contents_col])


_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("sheet", T.StringType()),
        T.StructField("header", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
    ]
)


def xls_to_tables(
    df: DataFrame,
    contents_col: str = "contents",
    filename_col: str = "filename",
    max_rows: int = MAX_ROWS,
) -> DataFrame:
    """XLS file rows → one output row PER SHEET (1→many fan-out; each child
    carries ``_cardinality_idx`` = its sheet ordinal). Matches the
    reference's per-sheet record shape (``udfs.py:34-56``): ``name`` =
    ``<filename>_<sheet>``, header list, rows stringified and capped."""

    def fn(batch: pd.DataFrame) -> pd.Series:
        from palimpzest_spark.sources.xlsx_lite import read_xlsx

        def tables(row) -> list[dict]:
            try:
                sheets = read_xlsx(bytes(row[contents_col]))
            except Exception:
                return []
            fn_base = str(row[filename_col]).split("/")[-1]
            return [
                {
                    "name": f"{fn_base}_{s['name']}",
                    "sheet": s["name"],
                    "header": s["header"],
                    "rows": [
                        ["" if v is None else str(v) for v in r]
                        for r in s["rows"][:max_rows]
                    ],
                }
                for s in sheets
            ]

        return batch.apply(tables, axis=1)

    return flat_map_records(
        df, fn, _TABLE_SCHEMA, depends_on=[contents_col, filename_col]
    ).drop(contents_col)
