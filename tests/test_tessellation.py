"""M5 morphological tessellation: cells partition the buffered bbox, one
cell per building, each building inside its own cell, grid adjacency."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from city2graph_spark.geo.kernels import (
    points_covered_by_ring,
    shoelace_area_centroid,
)
from city2graph_spark.geo.voronoi import voronoi_cells
from city2graph_spark.operators.polygons import contiguity_graph
from city2graph_spark.operators.tessellation import morphological_tessellation


def _square(pid, cx, cy, h):
    return [(pid, 0, s, x, y) for s, (x, y) in enumerate(
        [(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h),
         (cx - h, cy + h), (cx - h, cy - h)])]


def test_voronoi_two_sites_bbox():
    cells = voronoi_cells(np.array([[25.0, 50.0], [75.0, 50.0]]),
                          (0.0, 0.0, 100.0, 100.0))
    # two half-box cells split at x=50
    a, b = cells
    assert abs(abs(shoelace_area_centroid(a[:, 0], a[:, 1])[0]) - 5000.0) < 1e-6
    assert abs(abs(shoelace_area_centroid(b[:, 0], b[:, 1])[0]) - 5000.0) < 1e-6
    assert a[:, 0].max() <= 50.0 + 1e-9 and b[:, 0].min() >= 50.0 - 1e-9


@pytest.fixture(scope="module")
def grid_buildings(spark):
    rows = []
    pid = 0
    for r in range(3):
        for c in range(3):
            rows += _square(pid, 50.0 + c * 100.0, 50.0 + r * 100.0, 20.0)
            pid += 1
    return spark.createDataFrame(
        rows, "poly_id long, ring long, seq long, x double, y double")


def test_morphological_tessellation(spark, grid_buildings):
    cells = morphological_tessellation(grid_buildings, segment=5.0,
                                       buffer=50.0).cache()
    ids = {r.poly_id for r in cells.select("poly_id").dropDuplicates().collect()}
    assert ids == set(range(9))  # one cell per building

    rows = cells.collect()
    rings = {}
    for r in sorted(rows, key=lambda r: (r.poly_id, r.seq)):
        rings.setdefault(r.poly_id, []).append((r.x, r.y))
    # total cell area = buffered bbox area (partition of space)
    total = sum(abs(shoelace_area_centroid(
        np.array([p[0] for p in ring]), np.array([p[1] for p in ring]))[0])
        for ring in rings.values())
    # samples span [30,270]^2 (+/- jitter), buffer 50 → bbox 340x340
    assert abs(total - 340.0 ** 2) / 340.0 ** 2 < 1e-3

    # every building centroid inside its own cell
    for pid, ring in rings.items():
        vx = np.array([p[0] for p in ring])
        vy = np.array([p[1] for p in ring])
        cx, cy = 50.0 + (pid % 3) * 100.0, 50.0 + (pid // 3) * 100.0
        assert points_covered_by_ring(np.array([cx]), np.array([cy]), vx, vy)[0]

    # tessellation adjacency = the 3x3 rook grid (queen diagonals may or
    # may not share an exact snapped corner — rook edges must all exist)
    rook = {(r.src, r.dst) for r in
            contiguity_graph(cells, contiguity="queen").collect()}
    expected_rook = set()
    for rr in range(3):
        for cc in range(3):
            p = rr * 3 + cc
            if cc < 2:
                expected_rook.add((p, p + 1))
            if rr < 2:
                expected_rook.add((p, p + 3))
    assert expected_rook <= rook
