from hadoop_main_spark.functions.hashing import hash64, hash64_sql

__all__ = ["hash64", "hash64_sql"]
