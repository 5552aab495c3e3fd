"""Round-6 optimization equivalence gates.

Every r6 performance change must leave query RESULTS bit-identical; these
tests pin that contract against the r5 formulations:

- ``_xxh64_long`` (numpy) vs the JVM ``F.xxhash64`` on longs;
- the hybrid minhash signature stage vs the r5 pure-JVM HOF expression;
- the segment-tree first-fit packer vs a literal linear-scan first-fit;
- the Arrow exact ``sem_topk`` tier vs the r5 broadcast-join + window
  formulation (sims compared bit-for-bit, not rounded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from palimpzest_spark.functions import dedup
from palimpzest_spark.functions.dedup import _xxh64_int, _xxh64_long, word_shingles

SF_SMOKE = "/root/testdata/sf0.001"


def test_xxh64_long_matches_spark(spark):
    """The numpy rehash primitive is a bit-exact twin of Spark's xxhash64
    fold over (long, long) columns with the default seed 42."""
    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [
            rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64),
            np.array([0, 1, -1, 2**63 - 1, -(2**63), 42], dtype=np.int64),
        ]
    )
    df = spark.createDataFrame(pd.DataFrame({"h": vals}))
    got = (
        df.select(
            "h",
            *[F.xxhash64("h", F.lit(i)).alias(f"p{i}") for i in (0, 1, 7, 63)],
        )
        .orderBy("h")
        .collect()
    )
    h = np.array(sorted(vals.tolist()), dtype=np.int64).view(np.uint64)
    inner = _xxh64_long(h, np.uint64(42))
    for col_i, perm_i in enumerate((0, 1, 7, 63)):
        # F.lit(i) is an INTEGER literal -> the 4-byte hashInt path
        expect = _xxh64_int(np.uint64(perm_i), inner).view(np.int64)
        actual = np.array([r[col_i + 1] for r in got], dtype=np.int64)
        assert (expect == actual).all(), f"perm {perm_i} diverges from JVM xxhash64"


def _hof_minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed):
    """The r5 pure-JVM HOF signature expression, kept verbatim as the
    equivalence reference for the Arrow rehash tier."""
    grams = word_shingles("_t", shingle_n)
    base = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    ).select("id", grams.alias("_grams"))
    hashed = base.select(
        "id",
        F.transform("_grams", lambda g: F.xxhash64(g, F.lit(seed))).alias("_gh"),
    )

    def perm(i):
        return F.array_min(F.transform("_gh", lambda h: F.xxhash64(h, F.lit(i))))

    return hashed.select("id", F.array(*[perm(i) for i in range(num_perm)]).alias("signature"))


def test_minhash_jvm_rehash_bit_identical(spark):
    """minhash_signatures(token_hash='jvm') r6 (JVM string hash + Arrow
    rehash) emits exactly the signatures of the r5 pure-JVM expression —
    same permutation family, same mins, for real docs and edge shapes."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    edge = spark.createDataFrame(
        [
            (900001, ""),
            (900002, None),
            (900003, "one"),
            (900004, "a  b\t c\nd   e"),
            (900005, "x " * 500),
        ],
        "doc_id long, text string",
    )
    full = docs.select("doc_id", "text").unionByName(edge)
    new = dedup.minhash_signatures(full).orderBy("id").collect()
    old = _hof_minhash_signatures(full, "text", "doc_id", 64, 3, 42).orderBy("id").collect()
    assert len(new) == len(old) > 0
    for a, b in zip(new, old):
        assert a["id"] == b["id"]
        assert a["signature"] == b["signature"], f"doc {a['id']} signature diverged"


def test_ffd_tree_matches_linear_scan():
    """The segment-tree first-fit assigns every doc to EXACTLY the bin the
    r5 linear scan chose (same order, same capacities) — on random loads
    including oversized docs, zero-token docs and heavy duplication."""
    from palimpzest_spark.functions.packing import pack_sequences  # noqa: F401 (import sanity)

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        cap = int(rng.integers(8, 64))
        toks = rng.choice(
            [0, 1, 2, 3, cap // 2, cap - 1, cap, cap + 3], size=n
        ).astype(np.int64)
        order = np.lexsort((np.arange(n), -toks))  # tokens desc, id asc
        seq = toks[order]

        # reference: the r5 linear scan, verbatim
        bins: list[int] = []
        ref = []
        for t in seq.tolist():
            for bi in range(len(bins)):
                if bins[bi] >= t:
                    bins[bi] -= t
                    ref.append(bi)
                    break
            else:
                bins.append(max(cap - t, 0))
                ref.append(len(bins) - 1)

        # tree: mirror of the implementation in pack_sequences.ffd
        size = 1
        while size < max(n, 1):
            size *= 2
        tree = [-1] * (2 * size)
        n_bins = 0
        got = []
        for t in seq.tolist():
            if n_bins and tree[1] >= t:
                i = 1
                while i < size:
                    i = 2 * i if tree[2 * i] >= t else 2 * i + 1
                bi = i - size
                left = tree[i] - t
            else:
                bi = n_bins
                n_bins += 1
                i = size + bi
                left = max(cap - t, 0)
            got.append(bi)
            tree[i] = left
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2
        assert got == ref, f"trial {trial}: tree first-fit diverged from linear scan"


def test_pack_sequences_single_group_large(spark):
    """End-to-end packer invariants survive the segment-tree rewrite at a
    size where the linear scan was quadratic: every doc packed exactly once,
    no bin over budget (oversized docs excepted), bin stats consistent."""
    from palimpzest_spark.functions.packing import pack_sequences

    rng = np.random.default_rng(3)
    n = 5000
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": np.arange(n), "n_tokens": rng.integers(1, 130, n)}
        )
    )
    out = pack_sequences(df, "doc_id", "n_tokens", budget=120, n_groups=1).toPandas()
    assert len(out) == n
    assert out["doc_id"].nunique() == n
    g = out.groupby("bin_id")
    sums = g["n_tokens"].sum()
    counts = g["doc_id"].count()
    assert (out.groupby("bin_id")["bin_tokens"].first() == sums).all()
    assert (out.groupby("bin_id")["bin_docs"].first() == counts).all()
    multi = sums[counts > 1]
    assert (multi <= 120).all(), "multi-doc bin over budget"


def test_sem_topk_exact_arrow_matches_jvm_join(spark):
    """The Arrow exact tier returns bit-identical (rank, id, similarity)
    attachments to the r5 broadcast-join formulation — float32 corpus with
    identity embed (the oracle query's shape) AND double corpus with the
    hash-embed UDF, ragged corpus rows included."""
    from palimpzest_spark.functions.similarity import _norm, sem_topk

    rng = np.random.default_rng(11)

    # shape 1: float32 corpus, pre-embedded records (identity embed) — the
    # sem_topk_attach_oracle plan shape
    n = 400
    vecs = rng.standard_normal((n, 16)).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    records = corpus.filter(F.col("vec_id") % 29 == 0).select("vec_id", "embedding")

    def reference(recs, corp):
        q = recs.select("vec_id", "embedding").withColumn(
            "_qv", F.col("embedding")
        ).select(F.col("vec_id").alias("_rid"), "_qv")
        c = corp.select("vec_id", "embedding")
        joined = q.join(F.broadcast(c))
        dot = F.aggregate(
            F.zip_with(F.col("_qv"), F.col("embedding"), lambda a, b: a * b),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        sim = dot / (_norm("_qv") * _norm("embedding"))
        w = Window.partitionBy("_rid").orderBy(F.desc("_sim"), F.asc("vec_id"))
        return (
            joined.withColumn("_sim", sim)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= 5)
            .select(
                F.col("_rid").alias("record_id"),
                F.col("_rk").alias("rank"),
                F.col("vec_id").alias("retrieved_id"),
                F.col("_sim").alias("sim"),
            )
            .orderBy("record_id", "rank")
        )

    got = sem_topk(
        records, corpus, "embedding", "vec_id", k=5, embed_fn=lambda c: c
    )
    flat = (
        got.select(F.col("vec_id").alias("record_id"), F.explode("retrieved").alias("e"))
        .select(
            "record_id",
            F.col("e.rank").alias("rank"),
            F.col("e.id").alias("retrieved_id"),
            F.col("e.similarity").alias("sim"),
        )
        .orderBy("record_id", "rank")
        .collect()
    )
    want = reference(records, corpus).collect()
    assert len(flat) == len(want) > 0
    for a, b in zip(flat, want):
        assert (a["record_id"], a["rank"], a["retrieved_id"]) == (
            b["record_id"],
            b["rank"],
            b["retrieved_id"],
        )
        assert a["sim"] == b["sim"], (
            f"similarity not bit-identical: {a['sim']!r} vs {b['sim']!r}"
        )

    # shape 2: double corpus + embed UDF + payload + one ragged corpus row
    # (wrong length -> NULL sim tail in both formulations)
    corpus2 = spark.createDataFrame(
        [(i, rng.standard_normal(8).tolist(), f"doc {i}") for i in range(40)]
        + [(40, rng.standard_normal(5).tolist(), "ragged")],
        "vec_id long, embedding array<double>, body string",
    )
    records2 = spark.createDataFrame(
        [(i, f"query text {i}") for i in range(7)], "rec_id long, text string"
    )
    out2 = sem_topk(
        records2, corpus2, "text", "rec_id", k=41, dim=8, payload_col="body"
    ).toPandas()
    assert len(out2) == 7
    for lst in out2["retrieved"]:
        assert [e["rank"] for e in lst] == list(range(1, 42))
        sims = [e["similarity"] for e in lst if e["similarity"] is not None]
        assert sims == sorted(sims, reverse=True)
        # the ragged row has NULL sim and must be ranked LAST
        assert lst[-1]["id"] == 40 and lst[-1]["similarity"] is None
        assert all(
            e["body"] == ("ragged" if e["id"] == 40 else f"doc {e['id']}")
            for e in lst
        )


# --- r6b: fully-vectorized byte-level shingle+hash kernel ---------------------

_EDGE_TEXTS = [
    (900001, ""),
    (900002, None),
    (900003, "one"),
    (900004, "a  b\t c\nd   e"),
    (900005, "x " * 500),
    (900006, " \t lead"),
    (900007, "trail \t "),
    (900008, "\t\t"),
    (900009, "   "),
    (900010, " nbsp is a token char"),
    (900011, "multi line unicode separators stay"),
    (900012, "a\x0bb\x0cc\rd\ne f"),
    (900013, "héllo wörld ünïcode tokens"),
    (900014, "多 字 节 的 文 本"),
    (900015, "\ta"),
    (900016, "a\t"),
]


def test_xxh64_bytes_matches_spark(spark):
    """The numpy byte-hash kernel is a bit-exact twin of Spark's xxhash64
    over STRING columns — single-arg and with a trailing int-literal fold —
    across lengths 0..70+ and multi-byte UTF-8."""
    import random

    from palimpzest_spark.functions.dedup import (
        _xxh64_bytes_varlen,
        _xxh64_int,
    )

    random.seed(0)
    strs = []
    for length in list(range(0, 70)) + [100, 255]:
        for _ in range(3):
            strs.append(
                "".join(random.choice("abß嗨 xyz09\t~") for _ in range(length))
            )
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)], "i long, s string")
    got = (
        df.select("i", F.xxhash64("s").alias("h1"), F.xxhash64("s", F.lit(42)).alias("h2"))
        .orderBy("i")
        .collect()
    )
    bts = [s.encode("utf-8") for s in strs]
    lens = np.array([len(b) for b in bts], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
    buf = np.frombuffer(b"".join(bts), dtype=np.uint8)
    h1 = _xxh64_bytes_varlen(buf, offs, lens, np.uint64(42))
    h2 = _xxh64_int(np.uint64(42), h1)
    assert (h1.view(np.int64) == np.array([r["h1"] for r in got])).all()
    assert (h2.view(np.int64) == np.array([r["h2"] for r in got])).all()


@pytest.mark.parametrize("fold_seed", [None, 42, 7])
def test_gram_kernel_matches_jvm(spark, fold_seed):
    """The byte-level tokenize+gram+hash kernel emits exactly the distinct
    hash SET of the JVM expression chain
    ``array_distinct(transform(word_shingles(text), g -> xxhash64(g[, lit])))``
    for real docs plus whitespace/unicode/null edges, for n in {2,3,5}."""
    import pyarrow as pa

    from palimpzest_spark.functions.dedup import _distinct_gram_hashes

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    edge = spark.createDataFrame(_EDGE_TEXTS, "doc_id long, text string")
    full = docs.select("doc_id", "text").unionByName(edge)
    pdf = full.orderBy("doc_id").toPandas()
    for n in (2, 3, 5):
        hash_expr = (
            (lambda g: F.xxhash64(g))
            if fold_seed is None
            else (lambda g: F.xxhash64(g, F.lit(fold_seed)))
        )
        jvm = (
            full.select(
                "doc_id",
                F.array_distinct(
                    F.transform(word_shingles("text", n), hash_expr)
                ).alias("grams"),
            )
            .orderBy("doc_id")
            .collect()
        )
        arr = pa.array(pdf["text"].tolist(), type=pa.string())
        vh, offs = _distinct_gram_hashes(arr, n, fold_seed)
        assert len(jvm) == len(offs) - 1
        for i, row in enumerate(jvm):
            mine = sorted(vh[offs[i] : offs[i + 1]].tolist())
            theirs = sorted(row["grams"])
            assert mine == theirs, (
                f"n={n} fold={fold_seed} doc {row['doc_id']}: {mine[:5]} != {theirs[:5]}"
            )

