"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship polygon range-count pipeline at sf0.001
queries()      -> every implemented operator (SURVEY.md §2) as
                  (spark, sf_dir) -> DataFrame
oracle_sql()   -> matching ANSI SQL for DuckDB on the same parquet

Implementation lives in spatialsketch_spark/; this module only adapts
the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full sketch pipeline (derive geo events -> capped-pyramid
    exact-mode build -> polygon partition -> dyadic cover -> broadcast
    probe) answering the three fixture polygons at sf0.001."""
    from spatialsketch_spark.gate import q_polygon_count
    return q_polygon_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spatialsketch_spark.gate import GATE_QUERIES
    return {name: fn for name, (fn, _) in GATE_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from spatialsketch_spark.gate import GATE_QUERIES
    return {name: sql_fn() for name, (_, sql_fn) in GATE_QUERIES.items()
            if sql_fn is not None}
