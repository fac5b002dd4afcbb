"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (two-phase exact kNN graph over
points derived from the documents table) at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator with its DuckDB oracle.
Implementation lives in ``city2graph_spark.gate``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from city2graph_spark import gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact kNN graph (k=5) over sf0.001-derived points."""
    return gate.q_knn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate.queries()


def oracle_sql() -> dict[str, str]:
    return gate.oracle_sql()
