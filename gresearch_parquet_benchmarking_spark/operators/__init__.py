from gresearch_parquet_benchmarking_spark.operators.registry import (
    QUERIES,
    ORACLE_SQL,
    query,
    all_queries,
    all_oracle_sql,
)

__all__ = ["QUERIES", "ORACLE_SQL", "query", "all_queries", "all_oracle_sql"]
