from palimpzest_spark.operators.convert import map_records, flat_map_records  # noqa: F401
from palimpzest_spark.operators.filter import filter_records  # noqa: F401
from palimpzest_spark.operators.join import relational_join  # noqa: F401
from palimpzest_spark.operators.aggregate import (  # noqa: F401
    scalar_agg,
    GroupBySig,
    group_by_agg,
)
from palimpzest_spark.operators.distinct import distinct_records  # noqa: F401
from palimpzest_spark.operators.limit import limit_records  # noqa: F401
from palimpzest_spark.operators.project import project_records  # noqa: F401
from palimpzest_spark.operators.topk import top_k_per_group, embedding_top_k  # noqa: F401
