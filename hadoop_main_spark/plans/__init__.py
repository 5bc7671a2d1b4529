from hadoop_main_spark.plans.registry import REGISTRY, Query

__all__ = ["REGISTRY", "Query"]
