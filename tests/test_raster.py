"""Raster ↔ vector operators vs hand-computed oracles (north-rule surface
"raster↔vector"; the reference repo is vector-only, so the oracles here are
definitional)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from city2graph_spark.geo.kernels import shoelace_area_centroid
from city2graph_spark.operators.raster import (
    raster_regions,
    raster_to_points,
    raster_to_polygons,
    rasterize_points,
    rasterize_polygons,
    zonal_stats,
)


def test_rasterize_points_bins_and_sums(spark):
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0, 10.0), (1, 9.9, 9.9, 20.0),   # same pixel (0,0)
         (2, 10.0, 0.0, 5.0),                        # pixel (1,0)
         (3, -0.1, 0.0, 7.0)],                       # pixel (-1,0)
        "node_id long, x double, y double, v double")
    got = {(r.px, r.py): (r.n, r.value_sum) for r in
           rasterize_points(pts, cell_size=10.0, value_col="v").collect()}
    assert got == {(0, 0): (2, 30.0), (1, 0): (1, 5.0), (-1, 0): (1, 7.0)}
    back = raster_to_points(
        rasterize_points(pts, cell_size=10.0), cell_size=10.0).collect()
    assert {(r.x, r.y) for r in back} == {(5.0, 5.0), (15.0, 5.0),
                                         (-5.0, 5.0)}


def _rect(pid, x0, y0, x1, y1):
    pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    return [(pid, 0, s, float(x), float(y)) for s, (x, y) in enumerate(pts)]


def test_rasterize_polygons_center_rule(spark):
    # rect [0,25]x[0,15] at cell 10: centers (5,5),(15,5),(25?no) —
    # center x=25 is the boundary → covered_by includes it; y=15 boundary
    # row: center (.,15) on edge → included for px with center x<=25
    verts = spark.createDataFrame(_rect(7, 0, 0, 25, 15),
                                  "poly_id long, ring long, seq long, "
                                  "x double, y double")
    got = {(r.px, r.py) for r in
           rasterize_polygons(verts, cell_size=10.0).collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (2, 1)}


def test_raster_regions_and_polygons_with_hole(spark):
    # 4x4 block of value 1 with the center 2x2... make a ring: value 1
    # everywhere in 4x4 except pixel (1,1),(2,1),(1,2),(2,2) = value 2
    rows = []
    for px in range(4):
        for py in range(4):
            v = 2 if (px in (1, 2) and py in (1, 2)) else 1
            rows.append((px, py, v))
    rows.append((10, 10, 1))   # disconnected same-value island
    raster = spark.createDataFrame(rows, "px long, py long, value long")
    lab = raster_regions(raster).collect()
    regions = {}
    for r in lab:
        regions.setdefault(r.region, set()).add((r.px, r.py))
    assert len(regions) == 3   # ring, center block, island
    polys = raster_to_polygons(raster, cell_size=1.0).toPandas()
    by_region = {}
    for (reg, ring), grp in polys.groupby(["region", "ring"]):
        g = grp.sort_values("seq")
        a, _, _ = shoelace_area_centroid(g["x"].to_numpy(), g["y"].to_numpy())
        by_region.setdefault(reg, []).append(abs(a))
    areas = sorted(tuple(sorted(v, reverse=True)) for v in by_region.values())
    # ring region: outer 16 with a hole of 4 → rings (16, 4); center (4,);
    # island (1,)
    assert areas == [(1.0,), (4.0,), (16.0, 4.0)]


def test_zonal_stats_matches_arithmetic(spark):
    # pixels on a 20x20 grid, value = px + 100*py; zones = two 100x100
    # squares in world coords (cell 10)
    rows = [(px, py, px + 100 * py) for px in range(20) for py in range(10)]
    raster = spark.createDataFrame(rows, "px long, py long, value long")
    zones = spark.createDataFrame(
        _rect(0, 0, 0, 100, 100) + _rect(1, 100, 0, 200, 100),
        "poly_id long, ring long, seq long, x double, y double")
    got = {r.zone_id: (r.n, r.value_sum, r.value_min, r.value_max)
           for r in zonal_stats(raster, zones, cell_size=10.0).collect()}
    z0 = [v for px, py, v in rows if px < 10]
    z1 = [v for px, py, v in rows if px >= 10]
    assert got[0] == (len(z0), sum(z0), min(z0), max(z0))
    assert got[1] == (len(z1), sum(z1), min(z1), max(z1))


def test_raster_vector_roundtrip(spark):
    verts = spark.createDataFrame(_rect(3, 0, 0, 40, 30),
                                  "poly_id long, ring long, seq long, "
                                  "x double, y double")
    ras = rasterize_polygons(verts, cell_size=10.0) \
        .withColumn("value", F.lit(1))
    polys = raster_to_polygons(ras, cell_size=10.0).toPandas()
    assert polys["ring"].max() == 0   # solid rect: no holes
    g = polys.sort_values("seq")
    a, cx, cy = shoelace_area_centroid(g["x"].to_numpy(), g["y"].to_numpy())
    assert abs(abs(a) - 40 * 30) < 1e-9
    assert (cx, cy) == (20.0, 15.0)


def test_focal_stats_window_sums(spark):
    from city2graph_spark.operators.raster import focal_stats
    # 3x3 full grid, value = px + 10*py
    rows = [(px, py, px + 10 * py) for px in range(3) for py in range(3)]
    raster = spark.createDataFrame(rows, "px long, py long, value long")
    got = {(r.px, r.py): (r.n_nbrs, r.value_sum) for r in
           focal_stats(raster, radius=1).collect()}
    vals = {(px, py): v for px, py, v in rows}
    for (px, py), (n, s) in got.items():
        nb = [vals[(qx, qy)] for qx in range(px - 1, px + 2)
              for qy in range(py - 1, py + 2) if (qx, qy) in vals]
        assert (n, s) == (len(nb), sum(nb)), (px, py)
    assert got[(1, 1)][0] == 9 and got[(0, 0)][0] == 4
    # exclude-center variant
    noc = {(r.px, r.py): r.n_nbrs for r in
           focal_stats(raster, radius=1, include_center=False).collect()}
    assert noc[(1, 1)] == 8 and noc[(0, 0)] == 3


def test_raster_to_polygons_pinch_vertex(spark):
    """Round-4 ADVICE: 8-connected pixels touching only diagonally form one
    region pinched at a degree-4 vertex; directed interior-left tracing with
    the sharpest-left-turn rule must close BOTH unit rings (the old
    arbitrary nxts[0] pick could break and silently drop rings)."""
    rows = [(0, 0, 7), (1, 1, 7)]
    raster = spark.createDataFrame(rows, "px long, py long, value long")
    lab = raster_regions(raster, connectivity=8).collect()
    assert len({r.region for r in lab}) == 1
    polys = raster_to_polygons(raster, cell_size=1.0,
                               connectivity=8).toPandas()
    rings = []
    for (_, ring), grp in polys.groupby(["region", "ring"]):
        g = grp.sort_values("seq")
        xs, ys = g["x"].to_numpy(), g["y"].to_numpy()
        a, _, _ = shoelace_area_centroid(xs, ys)
        # each ring closed: consecutive vertices are unit axis steps and
        # the last vertex is one step from the first
        dx = np.abs(np.diff(np.append(xs, xs[0])))
        dy = np.abs(np.diff(np.append(ys, ys[0])))
        assert ((dx + dy) == 1.0).all()
        rings.append(abs(a))
    assert sorted(rings) == [1.0, 1.0]
