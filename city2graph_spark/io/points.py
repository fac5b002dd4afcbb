"""Deterministic point derivation from the driver's ``documents`` table.

The engine's authoritative input is an Iceberg table of interleaved
text+media documents whose geometry payloads ride in span arrays
(``io.documents``).  The driver's correctness harness, however, compares
Spark results against DuckDB SQL over its own parquet tables — so the
spatial operators are *also* exercised over a point set derived from
``documents.doc_id`` by LCG arithmetic that is expressible identically in
Spark SQL and ANSI/DuckDB SQL (pure BIGINT ops + one double division ⇒
bit-identical doubles in both engines).

Domain: [0, 5000)² — mirrors the reference's UTM-scale synthetic fixture
(150 points uniform(0,5000)², /root/reference/tests/test_proximity.py:123-125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# SQL snippets shared verbatim between the Spark query and the DuckDB oracle.
X_SQL_T = "(CAST(({id} * 1103515245 + 12345) % 5000000 AS DOUBLE) / 1000.0)"
Y_SQL_T = "(CAST(({id} * 69069 + 362437) % 5000000 AS DOUBLE) / 1000.0)"
X_SQL = X_SQL_T.format(id="doc_id")
Y_SQL = Y_SQL_T.format(id="doc_id")

DOMAIN = 5000.0

# DuckDB CTE yielding the same (node_id, x, y) table the Spark side builds.
POINTS_CTE = (
    "pts AS (SELECT doc_id AS node_id, "
    f"{X_SQL} AS x, {Y_SQL} AS y FROM documents)"
)


def derived_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node_id, x, y) derived deterministically from documents.parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("node_id"),
        F.expr(X_SQL).alias("x"),
        F.expr(Y_SQL).alias("y"),
    )


def expanded_points(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    """Bench-scale point table: each doc_id replicated ``factor`` times with
    ids ``doc_id + i·n_docs``, coordinates from the same LCG over the new id.
    Deterministic, derived solely from the driver's input table — used to
    benchmark the spatial operators at N× the sf's document count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    # the sf parquet is a single file = one input partition; without a
    # repartition the whole expansion (and the next stage's shuffle write)
    # runs in ONE task — measured as a 12-second single-core phase at 3.2M
    # points.  Real deployments read many files; the repartition emulates
    # that.
    par = docs.sparkSession.sparkContext.defaultParallelism * 2
    rep = (docs.repartition(par)
           .withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
           .select((F.col("doc_id") + F.col("_i") * F.lit(n)).alias("node_id")))
    return rep.select(
        "node_id",
        F.expr(X_SQL_T.format(id="node_id")).alias("x"),
        F.expr(Y_SQL_T.format(id="node_id")).alias("y"),
    )
