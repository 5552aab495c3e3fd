"""Sequence packing: group documents into fixed token-budget bins.

The standard LLM-pretraining data step (pack many short documents into one
context window to avoid pad waste). Global first-fit-decreasing is
inherently sequential, so the distributed form partitions documents into
independent PACKING GROUPS by key hash; each group packs locally with FFD
inside one ``applyInPandas`` task (vectorized, bounded state = one group),
and bin ids are made globally unique as ``group_id * 2^32 + local_bin``.

Scale shape: one hash shuffle on the group id; each task holds only its
group's (id, token) pairs — ~(budget · docs_per_bin · bins_per_group) rows,
tuned via ``docs_per_group``. Packing quality loss vs global FFD is small
when every group holds many bins' worth of documents (FFD waste ≤ ~22%
worst-case, typically <5% at 64+ bins/group). Deterministic: group
assignment hashes the id, in-group order sorts (tokens desc, id).

No reference analogue (the reference has no token/packing machinery);
target-engine construction for the training-data tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    docs_per_group: int = 100_000,
    n_groups: int | None = None,
) -> DataFrame:
    """Assign every row to a bin such that each bin's token sum ≤ ``budget``.

    Returns (id_col, token_col, bin_id, bin_tokens, bin_docs). A document
    longer than ``budget`` gets a singleton bin (callers truncate/split
    upstream; the packer never drops rows). ``n_groups`` overrides the
    ``count()``-based sizing (one extra cheap job) — pass it when the caller
    already knows the cardinality.
    """
    if n_groups is None:
        n_rows = df.count()
        n_groups = max(n_rows // docs_per_group, 1)

    # Keep the id column's ORIGINAL type (ADVICE r2: casting string doc ids
    # to long silently nulls them, collapsing every row onto one sort key and
    # breaking the every-doc-exactly-once invariant). The id is hashed only
    # for group assignment; it flows through the packer untouched.
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField(token_col, T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("bin_tokens", T.LongType()),
            T.StructField("bin_docs", T.LongType()),
        ]
    )

    cap = int(budget)

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL token counts arrive as NaN (nullable long -> float64 through
        # Arrow); int(nan) would kill the task with an opaque error. The
        # packer never drops rows, so a null count packs as 0 tokens.
        pdf = pdf.copy()
        pdf[token_col] = pdf[token_col].fillna(0)
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        )
        # First-fit via a segment tree over per-bin remaining capacity
        # (internal node = max capacity in its subtree; query descends to
        # the LEFTMOST leaf with capacity >= t). Identical assignment to a
        # linear first-fit scan — the tree only replaces the O(bins) walk
        # with O(log bins) — but the full group packs in O(n log n) instead
        # of O(n^2): under FFD most open bins are too full for the next doc,
        # so the linear scan touched nearly every bin per doc (~10^8 Python
        # steps for a 25k-doc single-group pack; the dominant cost of the
        # curation pipeline at sf1.0).
        n = len(pdf)
        size = 1
        while size < max(n, 1):
            size *= 2
        tree = [-1] * (2 * size)  # leaf i = remaining capacity of bin i (-1 = no bin)
        n_bins = 0
        assign = []
        for tok in pdf[token_col].to_numpy():
            t = int(tok)
            if n_bins and tree[1] >= t:
                i = 1
                while i < size:
                    i = 2 * i if tree[2 * i] >= t else 2 * i + 1
                bi = i - size
                left = tree[i] - t
            else:
                # new bin (oversized doc -> singleton bin with negative slack)
                bi = n_bins
                n_bins += 1
                i = size + bi
                left = max(cap - t, 0)
            assign.append(bi)
            tree[i] = left
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2
        # r6: bin stats are computed HERE, inside the group that owns every
        # one of its bins' members, instead of a post-pack groupBy + join —
        # that join made the applyInPandas a two-consumer subtree, so the
        # whole packer (and its upstream) executed twice per materialization,
        # and cost an extra shuffle besides. Same values by construction
        # (each global bin lives entirely inside one group).
        an = np.asarray(assign, dtype=np.int64)
        toks = pdf[token_col].to_numpy().astype(np.int64)
        bin_tokens = np.bincount(an, weights=toks).astype(np.int64)
        bin_docs = np.bincount(an).astype(np.int64)
        gid = int(pdf["_gid"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                token_col: toks,
                "bin_id": gid * (1 << 32) + an,
                "bin_tokens": bin_tokens[an],
                "bin_docs": bin_docs[an],
            }
        )

    return (
        df.select(
            F.col(id_col),
            F.col(token_col).cast("long").alias(token_col),
        )
        .withColumn(
            "_gid", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).cast("long")
        )
        .groupBy("_gid")
        .applyInPandas(ffd, out_schema)
        .select(id_col, token_col, "bin_id", "bin_tokens", "bin_docs")
    )
