"""D4 edge-geometry materialisation vs hand-computed WKT
(reference proximity.py:612-690)."""

from city2graph_spark.operators.geometry import (
    network_edge_geometry,
    with_edge_geometry,
)


def test_euclidean_and_manhattan_wkt(spark):
    pts = spark.createDataFrame([(0, 0.0, 0.0), (1, 3.0, 4.0)],
                                "node_id long, x double, y double")
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    straight = with_edge_geometry(e, pts).head()["geometry"]
    assert straight == "LINESTRING (0.0 0.0, 3.0 4.0)"
    lpath = with_edge_geometry(e, pts, metric="manhattan").head()["geometry"]
    # the reference's L-path: (x1,y1) → (x2,y1) → (x2,y2)
    assert lpath == "LINESTRING (0.0 0.0, 3.0 0.0, 3.0 4.0)"


def test_network_polyline_and_fallback(spark):
    nodes = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 100.0, 0.0), (2, 200.0, 0.0), (3, 900.0, 900.0)],
        "node_id long, x double, y double")
    street = spark.createDataFrame(
        [(0, 1, 100.0), (1, 2, 100.0)], "src long, dst long, weight double")
    pts = spark.createDataFrame(
        [(10, 0.0, 1.0), (11, 200.0, 1.0), (12, 900.0, 901.0)],
        "node_id long, x double, y double")
    e = spark.createDataFrame([(10, 11), (10, 12)], "src long, dst long")
    got = {(r.src, r.dst): r.geometry
           for r in network_edge_geometry(e, pts, nodes, street).collect()}
    # 10 snaps to node 0, 11 to node 2 → path 0→1→2
    assert got[(10, 11)] == "LINESTRING (0.0 0.0, 100.0 0.0, 200.0 0.0)"
    # 12 snaps to isolated node 3 → no path → straight src→dst fallback
    assert got[(10, 12)] == "LINESTRING (0.0 1.0, 900.0 901.0)"
