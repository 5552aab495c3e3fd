"""palimpzest_spark — a brand-new PySpark-native analytics + CDC-ingest engine.

Re-expresses the query/data-processing capabilities of mitdbg/palimpzest
(reference, read-only at /root/reference) as idiomatic PySpark: the logical
plan is declared with the DataFrame/SQL API and Catalyst/Tungsten pick the
physical strategy; Python only runs inside Arrow-vectorized pandas UDFs.

Layout
------
- ``session``    : SparkSession builder tuned for local[N] and cluster runs
- ``schemas``    : dynamic schema algebra (union/project/relax) over StructType
- ``dataset``    : fluent Dataset API mirroring the reference's surface
                   (map/flat_map/filter/join/groupby/distinct/limit/topk/...)
- ``operators``  : the operator combinators themselves (pure DataFrame fns)
- ``sources``    : table registry + file datasets (text/binary/memory)
- ``functions``  : training-data pipeline ops — dedup, similarity search,
                   text analysis, multimodal plumbing
- ``cdc``        : the flagship CDC/incremental-ingest engine (north rule):
                   change-feed tail -> schema reconcile -> LWW MERGE into a
                   snapshot-committed lake table, exactly-once, resumable.
"""

from palimpzest_spark.session import get_spark  # noqa: F401
from palimpzest_spark.dataset import Dataset  # noqa: F401

__version__ = "0.1.0"
