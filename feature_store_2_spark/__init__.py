"""feature_store_2_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing semantics of the reference
feature store (ngharrington/feature-store-2: schema-validated event
ingest -> per-user incremental aggregates -> rule evaluation -> platform
feature grants -> sliding-window circuit breaker) as an idiomatic Spark
engine, extended with a general relational operator surface and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst owns physical
planning (pushdown, pruning, broadcast selection, AQE, codegen); Python
UDFs appear only where Spark has no native expression (MinHash banding
is still done with built-in functions; see operators/).
"""

from feature_store_2_spark.session import get_spark

__all__ = ["get_spark"]
