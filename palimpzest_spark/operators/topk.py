"""Top-k operators.

Reference: ``TopKOp`` (``query/operators/topk.py:39-313``) retrieves top-k
matches for a query against a chroma vector index (embed query → ANN search →
attach results). There is no relational top-k or sort in the reference
(SURVEY.md §2.5).

Spark-first:
- relational top-k per group = ``row_number()`` over a window — Spark runs
  this as a partial top-k per partition under AQE, no global sort;
- whole-table top-k = ``orderBy().limit(k)`` which Catalyst executes as
  TakeOrderedAndProject (per-partition heap + driver merge, no full sort);
- embedding top-k = cosine similarity computed **JVM-side** with
  ``F.zip_with`` + ``F.aggregate`` over ``array<float>`` (no Python crossing)
  then TakeOrderedAndProject. The scale path (LSH-bucketed ANN) lives in
  ``functions/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def cosine_similarity_col(vec_col: str, query: list[float]) -> Column:
    """JVM-side cosine similarity between an array<float> column and a
    constant query vector — stays in whole-stage codegen."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    norm_q = float(sum(x * x for x in query)) ** 0.5
    return dot / (norm_v * F.lit(norm_q))


def embedding_top_k(
    df: DataFrame, vec_col: str, query: list[float], k: int, sim_col: str = "similarity"
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity (TopKOp analogue).

    Exact baseline; executes as a single scan + TakeOrderedAndProject, so at
    100 TB it is one pass with no shuffle — the ANN variants in
    ``functions/similarity.py`` trade recall for fewer candidates.
    """
    sim = cosine_similarity_col(vec_col, query)
    return df.withColumn(sim_col, sim).orderBy(F.desc(sim_col)).limit(k)
