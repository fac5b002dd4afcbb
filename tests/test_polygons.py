"""Polygon operators vs the reference's fixture semantics
(tests/conftest.py:318-346: 'A touches B and C; D is isolated'; L-shapes
sharing only a vertex split queen from rook)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from city2graph_spark.geo.kernels import (
    points_covered_by_ring,
    points_within_ring,
    shoelace_area_centroid,
)
from city2graph_spark.operators.polygons import (
    contiguity_graph,
    group_nodes,
    polygon_centroids,
    polygons_from_wkt,
)

# A(0,0..2,2) touches B(2,0..4,2) edge-wise and C(0,2..2,4) edge-wise;
# D(10,10..12,12) isolated; L1/L2 share only the vertex (6,0).
WKTS = [
    ("A", "POLYGON ((0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 2.0, 0.0 0.0))"),
    ("B", "POLYGON ((2.0 0.0, 4.0 0.0, 4.0 2.0, 2.0 2.0, 2.0 0.0))"),
    ("C", "POLYGON ((0.0 2.0, 2.0 2.0, 2.0 4.0, 0.0 4.0, 0.0 2.0))"),
    ("D", "POLYGON ((10.0 10.0, 12.0 10.0, 12.0 12.0, 10.0 12.0, 10.0 10.0))"),
    ("L1", "POLYGON ((4.0 0.0, 6.0 0.0, 6.0 -2.0, 4.0 -2.0, 4.0 0.0))"),
    ("L2", "POLYGON ((6.0 0.0, 8.0 0.0, 8.0 2.0, 6.0 2.0, 6.0 0.0))"),
]
IDS = {name: i for i, (name, _) in enumerate(WKTS)}


@pytest.fixture(scope="module")
def verts(spark):
    df = spark.createDataFrame([(IDS[n], w) for n, w in WKTS],
                               "poly_id long, wkt string")
    return polygons_from_wkt(df).cache()


def test_kernels_triangle():
    vx = np.array([0.0, 4.0, 0.0])
    vy = np.array([0.0, 0.0, 4.0])
    a, cx, cy = shoelace_area_centroid(vx, vy)
    assert (abs(a), cx, cy) == (8.0, 4.0 / 3.0, 4.0 / 3.0)
    px = np.array([1.0, 3.9, 2.0, 0.0, 2.0, 5.0])
    py = np.array([1.0, 3.9, 2.0, 0.0, 0.0, 5.0])
    cov = points_covered_by_ring(px, py, vx, vy)
    assert cov.tolist() == [True, False, True, True, True, False]
    wit = points_within_ring(px, py, vx, vy)
    assert wit.tolist() == [True, False, False, False, False, False]


def test_centroids(verts):
    got = {r.poly_id: (r.cx, r.cy) for r in polygon_centroids(verts).collect()}
    assert got[IDS["A"]] == (1.0, 1.0)
    assert got[IDS["D"]] == (11.0, 11.0)


def test_queen_vs_rook(verts):
    queen = {(r.src, r.dst) for r in
             contiguity_graph(verts, contiguity="queen").collect()}
    rook = {(r.src, r.dst) for r in
            contiguity_graph(verts, contiguity="rook").collect()}
    ab = (IDS["A"], IDS["B"])
    ac = (IDS["A"], IDS["C"])
    bc = (IDS["B"], IDS["C"])     # share the single vertex (2,2)
    bl1 = (IDS["B"], IDS["L1"])   # share the vertex (4,0)
    l12 = (IDS["L1"], IDS["L2"])  # vertex-only contact at (6,0)
    assert queen == {ab, ac, bc, bl1, l12}
    assert rook == {ab, ac}       # vertex-only contacts drop out
    assert all(IDS["D"] not in e for e in queen)


def test_group_nodes_boundary_inclusive(spark, verts):
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0),     # interior of A
         (1, 2.0, 1.0),     # on shared A|B edge → both (covered_by)
         (2, 11.0, 11.0),   # interior of D
         (3, 50.0, 50.0)],  # nowhere
        "node_id long, x double, y double")
    got = {(r.poly_id, r.node_id) for r in group_nodes(verts, pts).collect()}
    assert got == {(IDS["A"], 0), (IDS["A"], 1), (IDS["B"], 1), (IDS["D"], 2)}
    strict = {(r.poly_id, r.node_id)
              for r in group_nodes(verts, pts, predicate="within").collect()}
    assert strict == {(IDS["A"], 0), (IDS["D"], 2)}
    # weight = centroid distance
    w = {(r.poly_id, r.node_id): r.weight
         for r in group_nodes(verts, pts).collect()}
    assert w[(IDS["A"], 1)] == 1.0
    # reference accepts any sjoin predicate (proximity.py:2579-2595); for
    # points, intersects ≡ covered_by and contains_properly ≡ within
    inter = {(r.poly_id, r.node_id)
             for r in group_nodes(verts, pts, predicate="intersects")
             .collect()}
    assert inter == got
    cp = {(r.poly_id, r.node_id)
          for r in group_nodes(verts, pts,
                               predicate="contains_properly").collect()}
    assert cp == strict
    import pytest as _pt
    with _pt.raises(ValueError, match="unsupported sjoin predicate"):
        group_nodes(verts, pts, predicate="crosses")


# ---------------------------------------------------------------------------
# hole-aware PIP (round-4: holes are first-class — reference sjoin uses the
# FULL polygon geometry, proximity.py:2579-2595)
# ---------------------------------------------------------------------------

HOLED_WKTS = [
    # H: 10×10 square with a 4×4 courtyard hole ([3,7]²)
    (0, "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), "
        "(3.0 3.0, 7.0 3.0, 7.0 7.0, 3.0 7.0, 3.0 3.0))"),
    # B: building inside H's courtyard
    (1, "POLYGON ((4.0 4.0, 6.0 4.0, 6.0 6.0, 4.0 6.0, 4.0 4.0))"),
]


@pytest.fixture(scope="module")
def holed_verts(spark):
    df = spark.createDataFrame(HOLED_WKTS, "poly_id long, wkt string")
    return polygons_from_wkt(df).cache()


def test_group_nodes_courtyard_hole(spark, holed_verts):
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0),    # solid part of H
         (1, 5.0, 5.0),    # center of B == inside H's hole -> B only
         (2, 3.0, 3.0),    # hole corner = on H's boundary -> H (covered)
         (3, 3.5, 5.0),    # in the hole, outside B -> neither
         (4, 4.0, 5.0)],   # on B's boundary, strictly in H's hole -> B only
        "node_id long, x double, y double")
    e = group_nodes(holed_verts, pts)
    got = {(r.poly_id, r.node_id) for r in e.collect()}
    assert got == {(0, 0), (1, 1), (0, 2), (1, 4)}
    # strict interior: the hole-corner point is on H's boundary -> excluded,
    # and B's boundary point is excluded from B
    w = group_nodes(holed_verts, pts, predicate="within")
    got_w = {(r.poly_id, r.node_id) for r in w.collect()}
    assert got_w == {(0, 0), (1, 1)}


def test_centroid_hole_aware(spark):
    # 10x10 square, off-center 2x2 hole at [6,8]^2: centroid shifts away
    wkt = ("POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), "
           "(6.0 6.0, 8.0 6.0, 8.0 8.0, 6.0 8.0, 6.0 6.0))")
    df = spark.createDataFrame([(0, wkt)], "poly_id long, wkt string")
    v = polygons_from_wkt(df)
    r = polygon_centroids(v).head()
    # (100*5 - 4*7) / 96
    assert abs(r.cx - 472.0 / 96.0) < 1e-12
    assert abs(r.cy - 472.0 / 96.0) < 1e-12


def test_group_nodes_chunked_candidates_bounded(spark, monkeypatch):
    """One polygon x 10^6 candidate points: the per-polygon candidate
    aggregation must hash-chunk (no single Arrow row holds the full list)
    and the unioned chunk results must equal the exact membership."""
    import city2graph_spark.operators.polygons as pg

    monkeypatch.setattr(pg, "_GROUP_NODES_CAND_CAP", 100_000)
    # 1000x1000 grid on [0,1)^2, generated JVM-side
    pts = spark.range(1_000_000).select(
        F.col("id").alias("node_id"),
        (F.col("id") % 1000).cast("double") / 1000.0,
        (F.col("id") / 1000).cast("long").cast("double") / 1000.0,
    ).toDF("node_id", "x", "y")
    square = spark.createDataFrame(
        [(7, 0, i, x, y) for i, (x, y) in enumerate(
            [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75)])],
        "poly_id long, ring long, seq long, x double, y double")
    e = pg.group_nodes(square, pts, cell_size=0.25)
    # covered_by is boundary-inclusive: grid lines 250..750 on both axes
    assert e.count() == 501 * 501
