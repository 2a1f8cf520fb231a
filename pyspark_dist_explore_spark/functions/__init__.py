from pyspark_dist_explore_spark.functions.numeric import (
    bucket_col,
    bucket_sql,
    valid_value,
    valid_value_sql,
)

__all__ = ["bucket_col", "bucket_sql", "valid_value", "valid_value_sql"]
