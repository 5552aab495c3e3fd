#!/usr/bin/env python
"""Stage isolation for the dedup/curation hot queries (guide §1.4/§1.5):
time each subtree with the noop sink after a warm pass, label jobs."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/bench_data/sf1.0"


def timed(spark, name, df, trials=2):
    for t in range(trials + 1):
        spark.sparkContext.setJobDescription(f"{name}#{t}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        if t:  # skip warm pass
            print(f"  {name}: {el:.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)


def main():
    from pyspark.sql import functions as F

    from palimpzest_spark.functions import dedup
    from palimpzest_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="stage_isolate", master=f"local[{cpus}]")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # --- dedup_minhash_docs stages
    sigs = dedup.minhash_signatures(docs)
    timed(spark, "minhash:signatures", sigs)
    full = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    timed(spark, "minhash:full", full)
    timed(spark, "minhash:full+sort", full.orderBy("id_a", "id_b"))

    # --- curation stages
    cdocs = (
        docs.filter(
            (F.col("doc_id") % 2 == 0)
            & (F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0)
        ).select("doc_id", "text")
    )
    pairs = dedup.ngram_jaccard_pairs(cdocs, threshold=0.6, n=3)
    timed(spark, "curation:pairs", pairs)
    from palimpzest_spark.functions.graph import drop_near_duplicates
    kept = drop_near_duplicates(cdocs, dedup.ngram_jaccard_pairs(cdocs, threshold=0.6, n=3))
    timed(spark, "curation:pairs+cc+drop", kept)
    from palimpzest_spark.functions.packing import pack_sequences
    toks = kept.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens")
    )
    timed(spark, "curation:full", pack_sequences(toks, "doc_id", "n_tokens", budget=120, n_groups=1).orderBy("doc_id"))
    spark.stop()


if __name__ == "__main__":
    main()
