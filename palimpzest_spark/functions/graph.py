"""Distributed connected components — dedup-cluster construction.

Near-dup detection (``functions/dedup.py``: MinHash-LSH, SimHash, exact
n-gram Jaccard, winnowing; ``functions/similarity.py``: embedding LSH)
emits *pairs*. A training-data pipeline needs *clusters*: transitively
connect the pairs and keep one canonical document per component (the
reference's dedup story stops at pairwise semantics; cluster formation is
the standard next stage in every web-scale corpus pipeline).

Algorithm: iterative **min-label propagation** over the symmetrized edge
list, entirely in DataFrame ops:

    label(v) <- min(label(v), min_{(u,v) in E} label(u))

repeated until a fixpoint. Each round is one shuffle on ``node`` (the
edges-with-labels join + the min aggregate are both map-side combinable),
so the cost is O(iterations x shuffle(|E|)) and the iteration count is
bounded by the cluster *diameter* — for near-dup clusters (dense blobs of
mutually-similar docs, typically diameter <= 3) this converges in a
handful of rounds. ``max_iter`` guards pathological chains; the
large-star/small-star family (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) would give O(log n) rounds for adversarial
topologies and slots into the same interface if ever needed.

Scale notes (100 TB / 1000-executor):
- only (node, label) pairs ever shuffle — never document payloads;
- per-round ``localCheckpoint`` truncates the logical plan, preventing the
  Catalyst lineage blow-up every naive iterative-DataFrame loop hits;
- convergence is detected with a single count aggregate per round (the
  standard driver-side fixpoint test — O(1) result, not a collect of data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``.

    ``component`` is the MINIMUM node id in the node's connected component
    (a deterministic, partitioning-independent cluster id). Node ids may be
    any orderable type (long doc ids, string keys); the id column's type is
    preserved.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds (diameter > max_iter — not a silent wrong answer).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    # Symmetrize once; propagation along both directions makes min-labels
    # flow through the whole component.
    sym = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    sym = sym.distinct().persist()

    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Neighbor messages: each node hears its neighbors' current labels.
        msgs = sym.join(
            labels.withColumnRenamed("node", "s"), "s"
        ).select(F.col("d").alias("node"), "component")
        new_labels = (
            msgs.unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)  # truncate lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            sym.unpersist()
            return labels
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter)"
    )


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → cluster assignment with canonical-doc selection.

    Returns (doc_id, cluster_id, cluster_size, is_canonical) for every doc
    that appears in at least one pair. ``cluster_id`` is the min doc id in
    the component; ``is_canonical`` marks the single kept representative
    (the standard min-id survivor rule — deterministic, no tiebreak state).
    Docs in no pair are implicitly singleton/canonical and are not emitted
    (callers left-anti-join to drop non-canonical members from the corpus).
    """
    comp = connected_components(pairs, src=src, dst=dst)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
        )
    )


def drop_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one representative per near-dup cluster: drop every doc that is
    in some cluster but is not its canonical (min-id) member. Docs in no
    pair survive untouched. One broadcast-or-shuffle anti-join — the doomed
    set is tiny relative to the corpus, so Spark will broadcast it."""
    doomed = dedup_clusters(pairs, src=src, dst=dst).filter(
        F.col("is_canonical") == 0
    ).select(F.col("doc_id").alias(id_col))
    return df.join(doomed, id_col, "left_anti")
