"""hadoop_main_spark — a PySpark-native analytics engine.

A ground-up Spark-first rebuild of the query/data-processing
capabilities of the reference engine (Apache Hadoop MapReduce,
surveyed in SURVEY.md): sources/sinks, per-record transforms,
partitioning & sort semantics, aggregation, joins, subprocess
piping — plus large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal columns).

Everything is expressed on the DataFrame/Catalyst surface so that
predicate pushdown, partial aggregation, broadcast joins, AQE and
whole-stage codegen apply automatically; Python UDFs appear only
where semantics genuinely require them (Arrow-batched).
"""

from hadoop_main_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
