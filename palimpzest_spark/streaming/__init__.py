from palimpzest_spark.streaming.windows import (  # noqa: F401
    stream_from_directory,
    tumbling_counts,
    sliding_counts,
    session_aggregate,
    running_max_by_key,
)
