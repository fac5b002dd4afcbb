"""S3 ``process_overture_segments`` (SURVEY.md §2.8) — Overture street
segments: endpoint snapping, lengths, and barrier-geometry derivation.

Reference (/root/reference/city2graph/data.py:296-378, 806-918, 973+):
``level_rules`` JSON rows like ``[{"value": 1, "between": [0.2, 0.8]}]``
mark barrier intervals in fractional arc-length; the passable
``barrier_geometry`` is the complement of their union, materialised as
sub-linestrings via line interpolation; a full-extent barrier yields a NULL
geometry.  Endpoints within ``threshold`` are clustered and snapped so
``segments_to_graph`` sees shared nodes.

Spark shapes: level_rules parse with ``from_json`` (JVM-side); interval
complement is a window computation; only the substring extraction touches a
vectorized pandas kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RULES_SCHEMA = "array<struct<value double, between array<double>>>"


def passable_intervals(segments: DataFrame, *, id_col: str = "seg_id",
                       rules_col: str = "level_rules") -> DataFrame:
    """(seg_id, t0, t1) passable fractional intervals: the complement of the
    union of barrier intervals (rules with value != 0).  Segments with no
    rules get (0,1); fully-barriered segments produce no rows
    (data.py:866-918 interval complement)."""
    ids = segments.select(F.col(id_col).alias("seg_id"),
                          F.from_json(F.col(rules_col), _RULES_SCHEMA)
                          .alias("_rules"))
    bars = (ids.select("seg_id", F.explode_outer("_rules").alias("r"))
            .select("seg_id",
                    F.when((F.col("r.value").isNotNull())
                           & (F.col("r.value") != 0)
                           & (F.size("r.between") == 2),
                           F.col("r.between")).alias("iv")))
    # normalise: clamp to [0,1] (greatest/least ignore NULLs in Spark, so
    # guard explicitly — a NULL rule must stay NULL, not become [0,1])
    bars = bars.select(
        "seg_id",
        F.when(F.col("iv").isNotNull(),
               F.greatest(F.lit(0.0), F.col("iv").getItem(0))).alias("b0"),
        F.when(F.col("iv").isNotNull(),
               F.least(F.lit(1.0), F.col("iv").getItem(1))).alias("b1"))
    w = Window.partitionBy("seg_id").orderBy(F.col("b0").asc_nulls_last())
    # merge overlapping barrier intervals via running max of b1
    merged = (bars.where(F.col("b0").isNotNull() & (F.col("b1") > F.col("b0")))
              .withColumn("_hi", F.max("b1").over(
                  w.rowsBetween(Window.unboundedPreceding, -1)))
              .withColumn("_start_new",
                          (F.col("_hi").isNull())
                          | (F.col("b0") > F.col("_hi")))
              .withColumn("_grp", F.sum(F.col("_start_new").cast("int")).over(w))
              .groupBy("seg_id", "_grp")
              .agg(F.min("b0").alias("b0"), F.max("b1").alias("b1")))
    # complement per segment: gaps between merged barriers + edges
    w2 = Window.partitionBy("seg_id").orderBy("b0")
    gaps = (merged
            .withColumn("_prev_end", F.lag("b1").over(w2))
            .select("seg_id",
                    F.coalesce("_prev_end", F.lit(0.0)).alias("t0"),
                    F.col("b0").alias("t1")))
    tails = (merged.groupBy("seg_id").agg(F.max("b1").alias("t0"))
             .withColumn("t1", F.lit(1.0)))
    no_rules = (ids.join(merged.select("seg_id").dropDuplicates(),
                         "seg_id", "left_anti")
                .select("seg_id", F.lit(0.0).alias("t0"), F.lit(1.0).alias("t1")))
    out = gaps.unionByName(tails).unionByName(no_rules)
    return out.where(F.col("t1") > F.col("t0"))


def line_substrings(mv: DataFrame, intervals: DataFrame) -> DataFrame:
    """Materialise passable sub-polylines: for each (movement_id, t0, t1)
    fractional interval, interpolate along the polyline.  Returns the new
    vertex table (movement_id, piece, seq, x, y) — shapely
    ``substring``/``line_interpolate_point`` equivalent in numpy."""
    from .morphology import polyline_parts
    parts = polyline_parts(mv)
    glist = parts.groupBy("movement_id").agg(
        F.sort_array(F.collect_list(F.struct(
            "part", "ax", "ay", "bx", "by", "part_len", "prefix_len",
            "total_len"))).alias("_parts"))
    wp = Window.partitionBy("seg_id").orderBy("t0")
    iv = intervals.select(F.col("seg_id").alias("movement_id"), "t0", "t1",
                          (F.row_number().over(wp) - 1).alias("piece")) \
        .join(glist, "movement_id")

    def cut(it):
        import numpy as np
        import pandas as pd
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, t0, t1, k, ps in zip(pdf["movement_id"], pdf["t0"],
                                          pdf["t1"], pdf["piece"],
                                          pdf["_parts"]):
                total = ps[0]["total_len"]
                lo, hi = t0 * total, t1 * total
                verts = []
                for p in ps:
                    s, e = p["prefix_len"], p["prefix_len"] + p["part_len"]
                    if e < lo or s > hi or p["part_len"] == 0:
                        continue
                    a = max(lo, s)
                    b = min(hi, e)
                    ta = (a - s) / p["part_len"]
                    tb = (b - s) / p["part_len"]
                    xa = p["ax"] + ta * (p["bx"] - p["ax"])
                    ya = p["ay"] + ta * (p["by"] - p["ay"])
                    xb = p["ax"] + tb * (p["bx"] - p["ax"])
                    yb = p["ay"] + tb * (p["by"] - p["ay"])
                    if not verts or verts[-1] != (xa, ya):
                        verts.append((xa, ya))
                    if (xb, yb) != verts[-1]:
                        verts.append((xb, yb))
                for i, (x, y) in enumerate(verts):
                    rows.append((mid, k, i, x, y))
            if rows:
                yield pd.DataFrame(rows, columns=["movement_id", "piece",
                                                  "seq", "x", "y"])

    return iv.mapInPandas(cut, "movement_id long, piece long, seq long, "
                               "x double, y double")


def snap_endpoints(segments: DataFrame, *, threshold: float,
                   id_col: str = "seg_id") -> DataFrame:
    """Cluster endpoints within ``threshold`` (grid round-to-cluster snap,
    data.py:735) and rewrite segment endpoint coords to cluster centroids
    so downstream ``segments_to_graph`` sees shared nodes."""
    eps = segments.select(F.col(id_col).alias("seg_id"), "ax", "ay", "bx", "by")
    pts = eps.select(F.col("ax").alias("x"), F.col("ay").alias("y")) \
        .unionByName(eps.select(F.col("bx").alias("x"), F.col("by").alias("y"))) \
        .dropDuplicates()
    g = float(threshold)
    clustered = (pts
                 .withColumn("_gx", F.round(F.col("x") / g).cast("long"))
                 .withColumn("_gy", F.round(F.col("y") / g).cast("long")))
    cents = clustered.groupBy("_gx", "_gy") \
        .agg(F.avg("x").alias("sx"), F.avg("y").alias("sy"))
    snap = clustered.join(cents, ["_gx", "_gy"]).select("x", "y", "sx", "sy")
    out = (eps
           .join(snap.select(F.col("x").alias("ax"), F.col("y").alias("ay"),
                             F.col("sx").alias("_nax"), F.col("sy").alias("_nay")),
                 ["ax", "ay"])
           .join(snap.select(F.col("x").alias("bx"), F.col("y").alias("by"),
                             F.col("sx").alias("_nbx"), F.col("sy").alias("_nby")),
                 ["bx", "by"])
           .select("seg_id", F.col("_nax").alias("ax"), F.col("_nay").alias("ay"),
                   F.col("_nbx").alias("bx"), F.col("_nby").alias("by")))
    return out


def process_overture_segments(mv: DataFrame, rules: DataFrame, *,
                              snap_threshold: float | None = None
                              ) -> tuple[DataFrame, DataFrame]:
    """S3 composition: passable intervals from level_rules → barrier
    sub-geometries; segment lengths; optional endpoint snapping of the
    derived 2-point segment table.  Returns (barrier_vertex_table,
    endpoint_segments)."""
    from .morphology import polyline_endpoints
    iv = passable_intervals(rules)
    barrier_geo = line_substrings(mv, iv)
    eps = polyline_endpoints(mv)
    if snap_threshold is not None:
        eps = snap_endpoints(eps, threshold=snap_threshold)
    return barrier_geo, eps
