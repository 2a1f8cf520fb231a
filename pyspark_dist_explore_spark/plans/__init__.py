from pyspark_dist_explore_spark.plans.queries import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
