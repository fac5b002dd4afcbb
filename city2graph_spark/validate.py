"""U8 — input-table validation (SURVEY §2.4; reference
utils/validation.py ``validate_gdf``: geometry-type / CRS / null checks).

The distributed analogues check the engine's table contracts — point tables
``(node_id, x, y)``, polygon vertex tables ``(poly_id, ring, seq, x, y)``,
edge lists ``(src, dst[, weight])`` — with ONE aggregate pass per table
(no collect of data, just counts), raising ``ValueError`` that lists every
violation at once, the reference's error-style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require_columns(df: DataFrame, cols: list[str], what: str) -> list[str]:
    missing = [c for c in cols if c not in df.columns]
    return [f"{what}: missing column {c!r}" for c in missing]


def validate_points(df: DataFrame, *, id_col: str = "node_id") -> DataFrame:
    """Point-table contract: id/x/y present, no null or duplicate ids, no
    non-finite coordinates.  Returns the input unchanged when valid."""
    problems = _require_columns(df, [id_col, "x", "y"], "points")
    if not problems:
        row = df.agg(
            F.count("*").alias("n"),
            F.count(id_col).alias("n_id"),
            F.countDistinct(id_col).alias("n_distinct"),
            F.sum(F.when(F.col("x").isNull() | F.col("y").isNull()
                         | F.isnan("x") | F.isnan("y"), 1).otherwise(0))
             .alias("bad_xy")).head()
        if row["n_id"] < row["n"]:
            problems.append(f"points: {row['n'] - row['n_id']} null ids")
        if row["n_distinct"] < row["n_id"]:
            problems.append(
                f"points: {row['n_id'] - row['n_distinct']} duplicate ids")
        if row["bad_xy"]:
            problems.append(f"points: {row['bad_xy']} null/NaN coordinates")
    if problems:
        raise ValueError("; ".join(problems))
    return df


def validate_polygons(verts: DataFrame, *, id_col: str = "poly_id",
                      min_ring: int = 3) -> DataFrame:
    """Polygon vertex-table contract: (poly_id, ring, seq, x, y) present,
    every exterior ring has ≥ ``min_ring`` distinct sequence positions, no
    null/NaN coordinates."""
    problems = _require_columns(verts, [id_col, "ring", "seq", "x", "y"],
                                "polygons")
    if not problems:
        per = (verts.where(F.col("ring") == 0)
               .groupBy(id_col)
               .agg(F.countDistinct("seq").alias("nv"),
                    F.sum(F.when(F.col("x").isNull() | F.col("y").isNull()
                                 | F.isnan("x") | F.isnan("y"), 1)
                          .otherwise(0)).alias("bad")))
        row = per.agg(
            F.sum(F.when(F.col("nv") < min_ring, 1).otherwise(0))
             .alias("thin"),
            F.sum("bad").alias("bad")).head()
        if row["thin"]:
            problems.append(
                f"polygons: {row['thin']} exterior rings with "
                f"< {min_ring} distinct vertices")
        if row["bad"]:
            problems.append(f"polygons: {row['bad']} null/NaN coordinates")
    if problems:
        raise ValueError("; ".join(problems))
    return verts


def validate_edges(edges: DataFrame, *, src: str = "src", dst: str = "dst",
                   weight: str | None = None,
                   allow_self_loops: bool = False) -> DataFrame:
    """Edge-list contract: endpoint columns present and non-null; optional
    weight column non-null and non-negative; self-loops rejected unless
    allowed."""
    cols = [src, dst] + ([weight] if weight else [])
    problems = _require_columns(edges, cols, "edges")
    if not problems:
        aggs = [
            F.sum(F.when(F.col(src).isNull() | F.col(dst).isNull(), 1)
                  .otherwise(0)).alias("null_ep"),
            F.sum(F.when(F.col(src) == F.col(dst), 1).otherwise(0))
             .alias("loops")]
        if weight:
            aggs.append(F.sum(F.when(F.col(weight).isNull()
                                     | (F.col(weight) < 0), 1).otherwise(0))
                        .alias("bad_w"))
        row = edges.agg(*aggs).head()
        if row["null_ep"]:
            problems.append(f"edges: {row['null_ep']} null endpoints")
        if not allow_self_loops and row["loops"]:
            problems.append(f"edges: {row['loops']} self-loops")
        if weight and row["bad_w"]:
            problems.append(f"edges: {row['bad_w']} null/negative weights")
    if problems:
        raise ValueError("; ".join(problems))
    return edges
