"""O1 ``od_matrix_to_graph`` (SURVEY.md §2.6) — OD matrices/edgelists →
canonical edge DataFrames.

Reference semantics (/root/reference/city2graph/mobility.py:54-191):
zone alignment drops edges whose endpoints aren't in the zone table;
duplicate (source,target) rows aggregate by SUM; directed thresholding is
``weight >= threshold`` (or ``> 0`` when none); self-loops drop unless
``include_self_loops``; undirected mode merges reciprocal edges by SUMMING
every weight column and applies the threshold AFTER the merge
(mobility.py:157-169).

Spark shapes: the edgelist IS the native distributed form; adjacency
matrices arrive melted as (row_id, col_id, value) — ``adjacency_to_edgelist``
covers the square-DataFrame case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adjacency_to_edgelist(adj: DataFrame, id_col: str) -> DataFrame:
    """Melt a wide adjacency DataFrame (one column per destination zone,
    ``id_col`` naming the origin) into (source, target, weight)."""
    dests = [c for c in adj.columns if c != id_col]
    pairs = F.array(*[
        F.struct(F.lit(c).alias("target"),
                 F.col(c).cast("double").alias("weight"))
        for c in dests])
    return (adj.select(F.col(id_col).alias("source"), F.explode(pairs).alias("p"))
            .select("source", F.col("p.target").alias("target"),
                    F.col("p.weight").alias("weight")))


def od_matrix_to_graph(od: DataFrame, zones: DataFrame, *,
                       zone_id_col: str = "zone_id",
                       source_col: str = "source", target_col: str = "target",
                       weight_cols: list[str] | None = None,
                       threshold: float | None = None,
                       threshold_col: str | None = None,
                       include_self_loops: bool = False,
                       directed: bool = True) -> DataFrame:
    """Returns the canonical edge DataFrame (source, target, <weight cols>)."""
    weight_cols = weight_cols or ["weight"]
    threshold_col = threshold_col or weight_cols[0]
    if threshold_col not in weight_cols:
        raise ValueError("threshold_col must be one of weight_cols")

    e = od.select(F.col(source_col).alias("source"),
                  F.col(target_col).alias("target"),
                  *[F.col(c).cast("double").alias(c) for c in weight_cols])

    # zone alignment: drop edges whose ends aren't known zones
    z = zones.select(F.col(zone_id_col).alias("_z")).dropDuplicates()
    e = e.join(z.withColumnRenamed("_z", "source"), "source", "left_semi") \
         .join(z.withColumnRenamed("_z", "target"), "target", "left_semi")

    if not include_self_loops:
        e = e.where(F.col("source") != F.col("target"))

    # duplicate aggregation (sum every weight col)
    e = e.groupBy("source", "target") \
         .agg(*[F.sum(c).alias(c) for c in weight_cols])

    def thresholded(df: DataFrame) -> DataFrame:
        if threshold is not None:
            return df.where(F.col(threshold_col) >= float(threshold))
        return df.where(F.col(threshold_col) > 0)

    if directed:
        return thresholded(e)

    # undirected: reciprocal merge summing ALL weight cols, threshold AFTER
    canon = e.select(F.least("source", "target").alias("source"),
                     F.greatest("source", "target").alias("target"),
                     *weight_cols)
    merged = canon.groupBy("source", "target") \
                  .agg(*[F.sum(c).alias(c) for c in weight_cols])
    return thresholded(merged)
