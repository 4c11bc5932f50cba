"""Query catalog: every operator the engine exposes, as (name, spark_fn,
oracle_sql) triples consumed by the driver contract (__spark_entry__.py).

Each QueryDef's ``fn(spark, sf_dir) -> DataFrame`` is the Spark-first
implementation; ``oracle`` is the equivalent ANSI SQL DuckDB runs on the
same parquet for the correctness gate (row-count + schema +
order-insensitive value hash). ``oracle=None`` marks genuinely
non-SQL-expressible operators (driver falls back to a rows-only check).

Determinism contract for oracle-matched queries:
  * every computed column is aliased identically on both sides;
  * SUM/AVG over doubles accumulate in DECIMAL (exact, order-independent)
    and cast to DOUBLE once, so hashes match bit-for-bit;
  * ORDER-sensitive outputs always carry a total tie-break key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


CATALOG: list[QueryDef] = []


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        CATALOG.append(QueryDef(name, fn, oracle, doc))
        return fn

    return deco


def _load_all() -> None:
    # Import side-effect populates CATALOG.
    from feature_store_2_spark.queries import (  # noqa: F401
        feature_store,
        relational,
    )

    for mod in (
        "relational2",
        "setops_misc",
        "sketches",
        "windows_setops",
        "scalar_funcs",
        "llm_text",
        "llm_similarity",
        "multimodal",
        "storage",
        "streaming_queries",
    ):
        try:
            __import__(f"feature_store_2_spark.queries.{mod}")
        except ImportError:
            pass


_load_all()
