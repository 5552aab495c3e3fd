from palimpzest_spark.plans.queries import QUERIES, ORACLE_SQL  # noqa: F401
