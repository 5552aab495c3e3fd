"""UDF library (ref utils/udfs.py:14-56), learned embedding-join thresholds
(ref join.py:706-746), tree-reduced sem_aggregate, and lineage contracts
(ref records.py:28-83)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from palimpzest_spark.functions import udfs as U
from palimpzest_spark.sources.xlsx_lite import read_xlsx, write_xlsx


# --- UDF library -------------------------------------------------------------


def _two_workbooks(spark):
    files = [
        ("a.xlsx", write_xlsx({"S1": [["x", "y"], [1, "p"], [2, "q"]],
                               "S2": [["z"], ["only"]]})),
        ("b.xlsx", write_xlsx({"Solo": [["h"], ["v1"], ["v2"], ["v3"]]})),
    ]
    return spark.createDataFrame(files, "filename string, contents binary")


def test_file_to_xls_and_tables_fanout(spark):
    df = _two_workbooks(spark)
    meta = U.file_to_xls(df).toPandas().set_index("filename")
    assert list(meta.loc["a.xlsx", "sheet_names"]) == ["S1", "S2"]
    assert meta.loc["a.xlsx", "number_sheets"] == 2
    assert meta.loc["b.xlsx", "number_sheets"] == 1

    tables = U.xls_to_tables(df).toPandas().sort_values(["filename", "_cardinality_idx"])
    assert list(tables["name"]) == ["a.xlsx_S1", "a.xlsx_S2", "b.xlsx_Solo"]
    # the 1->many fan-out ordinal is the sheet index within each file
    assert list(tables["_cardinality_idx"]) == [0, 1, 0]
    s1 = tables[tables["name"] == "a.xlsx_S1"].iloc[0]
    assert list(s1["header"]) == ["x", "y"]
    assert [list(r) for r in s1["rows"]] == [["1", "p"], ["2", "q"]]


def test_xls_to_tables_caps_rows(spark):
    big = write_xlsx({"Big": [["n"]] + [[i] for i in range(250)]})
    df = spark.createDataFrame([("big.xlsx", big)], "filename string, contents binary")
    out = U.xls_to_tables(df, max_rows=100).toPandas()
    assert len(out) == 1 and len(out.iloc[0]["rows"]) == 100  # MAX_ROWS cap


def test_url_to_file_file_scheme(spark, tmp_path):
    p = tmp_path / "payload.bin"
    p.write_bytes(b"hello-bytes")
    urls = [(f"file://{p}",), ("file:///nonexistent/nope.bin",)]
    df = spark.createDataFrame(urls, "url string")
    out = U.url_to_file(df).toPandas().set_index("filename")
    assert bytes(out.loc["payload.bin", "contents"]) == b"hello-bytes"
    assert bytes(out.loc["nope.bin", "contents"]) == b""  # error -> b"" (ref :21-24)


# --- learned embedding-join thresholds ----------------------------------------


def test_fit_similarity_band_reference_semantics():
    from palimpzest_spark.operators.strategies import fit_similarity_band

    # prefix of non-matches up to 0.4; suffix of matches from 0.8
    samples = [(0.1, False), (0.4, False), (0.5, True), (0.6, False), (0.8, True), (0.9, True)]
    lo, hi = fit_similarity_band(samples)
    assert lo == 0.4 and hi == 0.8
    # degenerate: first sample matched / last unmatched -> open bounds
    assert fit_similarity_band([(0.2, True), (0.9, False)]) == (-1.0, 2.0)
    assert fit_similarity_band([]) == (-1.0, 2.0)


def _lr(spark):
    L = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")], "lid long, text string"
    )
    R = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "unrelated words here"),
         (12, "delta epsilon zeta")],
        "rid long, text string",
    )
    return L, R


def test_band_short_circuits_judge(spark):
    """Out-of-band pairs must NOT take the judge's answer: with an
    always-match judge, below-band pairs still come out False; with a
    never-match judge, above-band pairs still come out True."""
    from palimpzest_spark.operators import strategies as S

    def always_match(prompts: pd.Series) -> pd.Series:
        return pd.Series(["ejoin:0-always"] * len(prompts), index=prompts.index)

    def never_match(prompts: pd.Series) -> pd.Series:
        return pd.Series(["ejoin:X-never"] * len(prompts), index=prompts.index)

    L, R = _lr(spark)
    out = S.embedding_join(L, R, "same?", lo=0.99, hi=0.995,
                           infer_fn=always_match).toPandas()
    below = out[out.similarity < 0.99]
    assert len(below) > 0 and not below["matched"].any()

    out2 = S.embedding_join(L, R, "same?", lo=-0.5, hi=0.5,
                            infer_fn=never_match).toPandas()
    above = out2[out2.similarity > 0.5]
    assert len(above) > 0 and above["matched"].all()


def test_embedding_join_learns_band(spark):
    """End-to-end learned thresholds: judge says matched iff both texts are
    equal (which is also exactly the sim=1.0 pairs for the deterministic
    embedding stub), so the fitted band must classify every pair correctly
    and expose lo/hi via band_lo/band_hi."""
    from palimpzest_spark.operators import strategies as S

    def judge(prompts: pd.Series) -> pd.Series:
        def one(p):
            if not isinstance(p, str) or "\n---\n" not in p:
                return "ejoin:skip"
            body = p.split("\n\n", 1)[1]
            l, r = body.split("\n---\n", 1)
            return "ejoin:0" if l == r else "ejoin:no"

        return prompts.map(one)

    L, R = _lr(spark)
    out = S.embedding_join(L, R, "same?", num_samples=6, infer_fn=judge).toPandas()
    got = {(int(a), int(b)) for a, b in zip(out[out.matched].lid, out[out.matched].rid)}
    assert got == {(0, 10), (1, 12)}
    assert (out["band_lo"] < 1.0).all() and (out["band_hi"] <= 1.0).all()


def test_unblocked_join_guard(spark):
    from palimpzest_spark.operators import strategies as S

    L, R = _lr(spark)
    with pytest.raises(ValueError, match="block_on"):
        S.embedding_join(L, R, "same?", lo=0.1, hi=0.9, max_unblocked_pairs=2)


# --- tree-reduced sem_aggregate -------------------------------------------------


def test_sem_aggregate_tree_reduce(spark):
    from palimpzest_spark.operators import strategies as S
    from palimpzest_spark.operators.strategies import default_infer_fn

    pdf = pd.DataFrame({"doc_id": range(50), "text": [f"text number {i}" for i in range(50)]})
    df = spark.createDataFrame(pdf)

    # small data (one partial group): must equal the DIRECT single-group
    # prompt — computed independently here
    out = S.sem_aggregate(df, "summarize", group_cols=None, order_col="doc_id").toPandas()
    assert len(out) == 1
    joined = "\n".join(t for _, t in sorted(zip(pdf["doc_id"], pdf["text"])))
    expected = default_infer_fn("sem-agg")(pd.Series(["summarize\n\n" + joined]))[0]
    assert out["_sem_agg"].iloc[0] == expected

    # big-corpus shape: force multiple partial groups; result is one row,
    # deterministic across runs, bounded state per reducer
    from palimpzest_spark.operators.strategies import _infer_udf, sem_aggregate_global

    infer = _infer_udf(default_infer_fn("sem-agg"))
    r1 = sem_aggregate_global(df, "summarize", "text", "_sem_agg",
                              F.col("doc_id"), infer, max_group_rows=10).toPandas()
    r2 = sem_aggregate_global(df, "summarize", "text", "_sem_agg",
                              F.col("doc_id"), infer, max_group_rows=10).toPandas()
    assert len(r1) == 1 and r1["_sem_agg"].iloc[0] == r2["_sem_agg"].iloc[0]
    assert r1["_sem_agg"].iloc[0].startswith("sem-agg:")


# --- lineage contracts ---------------------------------------------------------


def test_lineage_through_map_and_flat_map(spark):
    """records.py:28-83 contract: _id is a hash of the DERIVATION (operator,
    parent id, cardinality idx) — stable across runs and partitionings;
    _parent_id links each child to its parent's _id."""
    from palimpzest_spark import lineage as L
    from palimpzest_spark.operators.convert import flat_map_records, map_expr

    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "c d e"]})

    def build(df):
        src = L.with_source_lineage(df, key_cols=["doc_id"])
        mapped = map_expr(src, {"n": F.length("text")}, track_lineage=True)

        def fn(batch: pd.DataFrame) -> pd.Series:
            return batch["text"].map(lambda t: [{"word": w} for w in str(t).split()])

        schema = T.StructType([T.StructField("word", T.StringType())])
        return flat_map_records(mapped, fn, schema, depends_on=["text"],
                                track_lineage=True)

    a = build(spark.createDataFrame(pdf)).toPandas().sort_values(
        ["doc_id", "_cardinality_idx"]).reset_index(drop=True)
    b = build(spark.createDataFrame(pdf).repartition(5)).toPandas().sort_values(
        ["doc_id", "_cardinality_idx"]).reset_index(drop=True)

    assert len(a) == 5  # 2 + 3 words
    # deterministic across runs AND re-partitionings
    assert list(a["_id"]) == list(b["_id"])
    assert list(a["_parent_id"]) == list(b["_parent_id"])
    # ids unique per child; siblings share their parent pointer
    assert a["_id"].nunique() == 5
    by_doc = a.groupby("doc_id")["_parent_id"].nunique()
    assert (by_doc == 1).all()
    # child id differs from parent id (derivation hash, not passthrough)
    assert not (a["_id"] == a["_parent_id"]).any()


# --- SchemaBuilder ---------------------------------------------------------------


def test_schema_from_file_formats(tmp_path):
    """csv/json/jsonld/yml -> StructType with descriptions in metadata
    (ref schemabuilder/schema_builder.py:21-56 dispatch + :84-92 filters)."""
    from palimpzest_spark.schema_builder import DESCRIPTION_KEY, schema_from_file

    csv_p = tmp_path / "t.csv"
    csv_p.write_text("name,age,score\nAda,36,9.5\nGrace,40,8.0\n")
    s = schema_from_file(str(csv_p))
    assert [(f.name, f.dataType.simpleString()) for f in s.fields] == [
        ("name", "string"), ("age", "bigint"), ("score", "double")
    ]

    json_p = tmp_path / "t.json"
    json_p.write_text('{"title": {"description": "the title"}, "year": {}}')
    s = schema_from_file(str(json_p))
    assert [f.name for f in s.fields] == ["title", "year"]
    assert s.fields[0].metadata[DESCRIPTION_KEY] == "the title"

    jsonld_p = tmp_path / "t.jsonld"
    jsonld_p.write_text(
        '{"@graph": [{"@type": "rdfs:Class", "rdfs:label": "genre",'
        ' "rdfs:comment": "music genre",'
        ' "schema:rangeIncludes": [{"@id": "schema:Rock"}, {"@id": "schema:Jazz"}]},'
        ' {"@type": "rdf:Property", "rdfs:label": "ignored"}]}'
    )
    s = schema_from_file(str(jsonld_p))
    assert [f.name for f in s.fields] == ["genre"]
    assert "Rock, Jazz" in s.fields[0].metadata[DESCRIPTION_KEY]

    yml_p = tmp_path / "t.yml"
    yml_p.write_text(
        "schema:\n  name: Paper\n  fields:\n"
        "    - name: title\n      description: paper title\n"
        "    - name: n_pages\n      type: int\n"
    )
    s = schema_from_file(str(yml_p))
    assert [(f.name, f.dataType.simpleString()) for f in s.fields] == [
        ("title", "string"), ("n_pages", "bigint")
    ]

    s = schema_from_file(str(csv_p), exclude_attributes=["AGE"])
    assert [f.name for f in s.fields] == ["name", "score"]
    s = schema_from_file(str(csv_p), include_attributes=["name"])
    assert [f.name for f in s.fields] == ["name"]


# --- real PNG decode through the multimodal path -------------------------------


def test_png_decode_in_multimodal_pipeline(spark):
    """decode='image' must produce REAL pixel statistics (width/height from
    IHDR, per-channel means from decoded scanlines), not the byte-hash stub."""
    import numpy as np

    from palimpzest_spark.functions import multimodal as M
    from palimpzest_spark.sources.png_lite import encode_png

    solid = np.full((4, 6, 3), 200, dtype=np.uint8)   # mean 200/255
    dark = np.zeros((2, 3, 3), dtype=np.uint8)        # mean 0
    df = spark.createDataFrame(
        [(1, encode_png(solid)), (2, encode_png(dark)), (3, b"not a png")],
        "asset_id long, content binary",
    )
    meta = M.image_metadata(df).toPandas().set_index("asset_id")
    assert (meta.loc[1, "width"], meta.loc[1, "height"], meta.loc[1, "channels"]) == (6, 4, 3)
    assert pd.isna(meta.loc[3, "width"])

    feats = (
        M.extract_features(df, dim=9, decode="image").toPandas().set_index("asset_id")
    )
    f1 = list(feats.loc[1, "features"])
    assert f1[:3] == [6.0, 4.0, 3.0]                       # w, h, ch
    assert abs(f1[3] - 200 / 255) < 1e-9 and f1[4] == 0.0  # mean_r, std_r
    f2 = list(feats.loc[2, "features"])
    assert f2[:3] == [3.0, 2.0, 3.0] and f2[3] == 0.0
    # non-PNG bytes fall back to the deterministic stub (unit vector)
    f3 = np.array(feats.loc[3, "features"])
    assert abs(np.linalg.norm(f3) - 1.0) < 1e-9


# --- write-time LSH index (partition-pruned ANN probes) --------------------------


def test_lsh_indexed_topk_prunes_and_matches(spark, tmp_path):
    """The materialized-bucket path must (a) agree with the in-memory LSH
    probe and (b) read only the probed buckets (parquet partition pruning)."""
    import numpy as np

    from palimpzest_spark.functions import similarity as SIM

    rng = np.random.default_rng(5)
    vecs = [(i, rng.standard_normal(16).tolist()) for i in range(200)]
    corpus = spark.createDataFrame(pd.DataFrame(vecs, columns=["vec_id", "embedding"]))
    path = str(tmp_path / "lsh_index")
    SIM.write_lsh_index(corpus, path, bits=6)

    query = vecs[7][1]
    direct = SIM.lsh_top_k(corpus, query, k=5, bits=6, multiprobe_hamming=1).toPandas()
    indexed = SIM.lsh_top_k_indexed(spark, path, query, k=5, bits=6,
                                    multiprobe_hamming=1).toPandas()
    assert list(indexed["vec_id"]) == list(direct["vec_id"])
    assert indexed.iloc[0]["vec_id"] == 7  # the query vector itself

    # pruning: the probe plan must carry _bkt as a partition filter
    planes = SIM.hyperplanes(16, 6)
    plan = (
        spark.read.parquet(path)
        .filter(F.col("_bkt").isin([0, 1]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "_bkt" in plan


def test_ivf_indexed_topk_recall_and_pruning(spark, tmp_path):
    """IVF tier: seeded training is deterministic, the partitioned layout
    prunes to the probed inverted lists, and recall@10 vs exact brute force
    is high on clustered data (the IVF sweet spot)."""
    import numpy as np

    from palimpzest_spark.functions import similarity as SIM

    rng = np.random.default_rng(11)
    # 8 well-separated clusters — realistic embedding geometry
    centers = rng.standard_normal((8, 16)) * 4
    vecs = []
    for i in range(400):
        c = i % 8
        vecs.append((i, (centers[c] + rng.standard_normal(16) * 0.3).tolist()))
    corpus = spark.createDataFrame(pd.DataFrame(vecs, columns=["vec_id", "embedding"]))

    C1 = SIM.train_ivf_centroids(corpus, n_centroids=8, iters=8)
    C2 = SIM.train_ivf_centroids(corpus, n_centroids=8, iters=8)
    assert np.allclose(C1, C2), "training must be deterministic"

    path = str(tmp_path / "ivf_index")
    SIM.write_ivf_index(corpus, path, C1)

    query = vecs[7][1]
    exact = SIM.embedding_top_k(corpus, "embedding", query, k=10).toPandas()
    approx = SIM.ivf_top_k(spark, path, query, C1, k=10, nprobe=2).toPandas()
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.9, f"recall@10 = {recall}"
    assert approx.iloc[0]["vec_id"] == 7

    # pruning: _ivf rides as a parquet partition filter
    plan = (
        spark.read.parquet(path)
        .filter(F.col("_ivf").isin([0, 1]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "_ivf" in plan


def test_ivf_int_dot_tier_exact_vs_numpy(spark, tmp_path):
    """Integer-dot IVF tier (the oracle-replayable hook): with integer
    vectors and integer centroids, probes + assignment + ranking must match
    an exact numpy replay bit-for-bit — no float accumulation anywhere."""
    import numpy as np

    from palimpzest_spark.functions import similarity as SIM

    rng = np.random.default_rng(3)
    X = rng.integers(-50, 51, size=(300, 12)).astype(np.int64)
    C = rng.integers(-50, 51, size=(6, 12)).astype(np.int64)
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(300), "embedding": [r.tolist() for r in X]})
    )
    path = str(tmp_path / "ivf_int")
    SIM.write_ivf_index(corpus, path, C, normalize=False)

    q = X[0]
    out = SIM.ivf_top_k_dot(
        spark, path, [int(x) for x in q], C, k=8, nprobe=2
    ).toPandas()

    # numpy replay of the same approximation
    cscores = C @ q
    probes = sorted(range(len(C)), key=lambda c: (-int(cscores[c]), c))[:2]
    assign = np.argmax(X @ C.T, axis=1)
    cand = [i for i in range(300) if assign[i] in probes]
    ranked = sorted(cand, key=lambda i: (-int(X[i] @ q), i))[:8]
    assert list(out["vec_id"]) == ranked
    assert list(out["dot"]) == [int(X[i] @ q) for i in ranked]


def test_sem_join_guard_and_blocking(spark):
    from palimpzest_spark.dataset import Dataset

    L = Dataset(spark.createDataFrame([(1, "k1", "a"), (2, "k2", "b")],
                                      "lid long, k string, text string"))
    R = Dataset(spark.createDataFrame([(3, "k1", "c"), (4, "k3", "d")],
                                      "rid long, k string, text string"))
    with pytest.raises(ValueError, match="block_on"):
        L.sem_join(R, "related?", max_unblocked_pairs=1)
    out = L.sem_join(R, "related?", block_on=["k"]).df.toPandas()
    # equi-blocked pair space: only k1 matches -> at most 1 candidate pair
    assert set(out.columns) >= {"lid", "rid", "k", "text", "text_right"}
    assert len(out) <= 1


def test_wav_decode_in_multimodal_pipeline(spark):
    """decode='audio' must produce REAL signal statistics from PCM WAV bytes
    (rate/duration from the RIFF header, rms from decoded samples)."""
    import numpy as np

    from palimpzest_spark.functions import multimodal as M
    from palimpzest_spark.sources.wav_lite import encode_wav

    t = np.linspace(0, 0.5, 8000, endpoint=False)
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)      # rms = 0.5/sqrt(2)
    silence = np.zeros(4000)
    df = spark.createDataFrame(
        [(1, encode_wav(tone, rate=16000)), (2, encode_wav(silence, rate=8000)),
         (3, b"not audio")],
        "asset_id long, content binary",
    )
    meta = M.audio_metadata(df).toPandas().set_index("asset_id")
    assert (meta.loc[1, "sample_rate"], meta.loc[1, "duration_ms"]) == (16000, 500)
    assert (meta.loc[2, "sample_rate"], meta.loc[2, "duration_ms"]) == (8000, 500)
    assert pd.isna(meta.loc[3, "sample_rate"])

    feats = M.extract_features(df, dim=8, decode="audio").toPandas().set_index("asset_id")
    f1 = list(feats.loc[1, "features"])
    assert f1[:3] == [16000.0, 1.0, 0.5]
    assert abs(f1[3] - 0.5 / np.sqrt(2)) < 1e-3   # rms of the sine
    f2 = list(feats.loc[2, "features"])
    assert f2[3] == 0.0                            # silence
    f3 = np.array(feats.loc[3, "features"])        # fallback stub: unit vector
    assert abs(np.linalg.norm(f3) - 1.0) < 1e-9


# --- execution stats (CollectMetrics per fluent op) ------------------------------


def test_execution_stats_per_op(spark):
    """Per-op cardinalities must ride ONE action (the reference's
    RecordOpStats/ExecutionStats surface, re-expressed as observe nodes)."""
    from palimpzest_spark.dataset import Dataset
    from palimpzest_spark.stats import StatsCollector

    rows = [(i, "evt" if i % 4 else "key") for i in range(100)]
    sc = StatsCollector()
    ds = Dataset(spark.createDataFrame(rows, "id long, kind string")).with_stats(sc)
    out = ds.filter(F.col("kind") == "evt").map({"id2": F.col("id") * 2}).df
    with sc.timed():
        n = out.count()
    assert n == 75
    stats = sc.execution_stats()
    names = [o.op_name for o in stats.ops]
    assert names == ["filter", "map"]
    assert [o.rows_out for o in stats.ops] == [75, 75]
    assert stats.ops[1].selectivity == 1.0
    assert stats.wall_sec is not None and stats.wall_sec > 0
    d = stats.to_dict()
    assert d["ops"][0]["op"] == "0:filter"


# --- reference Dataset API parity: deprecated aliases, copy, relax_types ---------


def test_dataset_api_aliases_and_relax(spark):
    import warnings

    from palimpzest_spark.dataset import Dataset

    ds = Dataset(spark.createDataFrame([(1, 2.5)], "a int, b float"))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = ds.add_columns({"c": F.col("a") + 1})
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert out.df.columns == ["a", "b", "c"]

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sem = ds.sem_add_columns("label this")
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert "_sem_out" in sem.df.columns

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        with pytest.raises(ValueError, match="udf"):
            ds.add_columns(None)

    c = ds.copy()
    assert c.df is ds.df

    relaxed = ds.relax_types()
    types = dict(relaxed.df.dtypes)
    assert types == {"a": "bigint", "b": "double"}


def test_dataset_training_combinators(spark):
    """The fluent Dataset face of the training-data ops delegates to the
    function library with identical results."""
    from palimpzest_spark.dataset import Dataset

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "the quick brown fox jumps over a lazy dog today"),  # near dup
        (4, "completely different text about spark joins and shuffles"),
    ]
    ds = Dataset(spark.createDataFrame(rows, ["doc_id", "text"]))

    assert sorted(r["doc_id"] for r in ds.dedup_exact().df.collect()) == [1, 3, 4]
    # jaccard(1,3) = 4/11 ~ 0.36, so 0.3 links {1,2,3} into one cluster
    near = sorted(r["doc_id"] for r in ds.dedup_near(threshold=0.3).df.collect())
    assert near == [1, 4]
    top = ds.search(["spark", "joins"], k=2).df.collect()
    assert top[0]["doc_id"] == 4

    from pyspark.sql import functions as F

    toks = ds.df.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n"))
    packed = Dataset(toks).pack(budget=25, token_col="n").df
    assert packed.count() == 4
    frac = Dataset(toks).sample_fraction(0.99).df
    assert 0 < frac.count() <= 4
