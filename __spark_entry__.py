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
    """Flagship: the full interleaved-document stack at sf0.001 — wrap the
    flat documents into the spans shape (text + geometry-WKT + media spans),
    assert the span-sequence invariant, extract points from the geometry
    spans via the vectorized WKT codec, and build the exact two-phase kNN
    graph (k=5) over them."""
    from city2graph_spark.io.documents import (
        extract_points, span_invariant_violations, synth_spans)
    from city2graph_spark.operators.proximity import estimate_knn_cell, knn_graph

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spans = synth_spans(docs)
    violations = span_invariant_violations(spans, spans).count()
    if violations:
        raise AssertionError(f"span invariant violated for {violations} docs")
    pts = extract_points(spans)
    edges = knn_graph(pts, 5, cell_size=estimate_knn_cell(pts.count(), 5))
    return edges


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate.queries()


def oracle_sql() -> dict[str, str]:
    return gate.oracle_sql()
