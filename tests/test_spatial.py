"""U3 clip_graph and U6 isochrone hulls."""

import numpy as np
import pytest

from city2graph_spark.operators.spatial import (
    clip_graph,
    convex_hull,
    create_isochrone,
)


@pytest.fixture(scope="module")
def grid(spark):
    # 0-1-2-3-4 path plus node 5 hanging off 2 (as in test_network)
    nodes = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 100.0, 0.0), (2, 200.0, 0.0),
         (3, 300.0, 0.0), (4, 400.0, 0.0), (5, 200.0, 100.0)],
        "node_id long, x double, y double")
    edges = spark.createDataFrame(
        [(0, 1, 100.0), (1, 2, 100.0), (2, 3, 100.0), (3, 4, 100.0),
         (2, 5, 100.0)],
        "src long, dst long, weight double")
    return nodes, edges


def test_convex_hull():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]],
                   dtype=float)
    h = convex_hull(pts)
    assert {tuple(p) for p in h} == {(0, 0), (2, 0), (2, 2), (0, 2)}


def test_clip_graph(grid):
    nodes, edges = grid
    ring = np.array([[-10.0, -10.0], [250.0, -10.0], [250.0, 150.0],
                     [-10.0, 150.0]])
    strict = {(r.src, r.dst) for r in clip_graph(nodes, edges, ring).collect()}
    assert strict == {(0, 1), (1, 2), (2, 5)}
    loose = {(r.src, r.dst) for r in
             clip_graph(nodes, edges, ring, keep_outer_neighbors=True).collect()}
    assert loose == {(0, 1), (1, 2), (2, 3), (2, 5)}


def test_isochrone(grid):
    nodes, edges = grid
    iso = create_isochrone(nodes, edges, (1.0, 1.0), [150.0, 350.0])
    # t=150: reachable {0,1} → one degenerate hull (2 points)
    assert len(iso[150.0]) == 1
    assert {tuple(p) for p in iso[150.0][0]} == {(0.0, 0.0), (100.0, 0.0)}
    # t=350: {0,1,2,3,5} one component; hull covers the L shape
    assert len(iso[350.0]) == 1
    assert {tuple(p) for p in iso[350.0][0]} == {(0.0, 0.0), (300.0, 0.0),
                                                 (200.0, 100.0)}
    # buffer variant inflates the hull
    iso_b = create_isochrone(nodes, edges, (1.0, 1.0), [150.0],
                             method="buffer", buffer_dist=10.0)
    xs = iso_b[150.0][0][:, 0]
    assert xs.min() < 0.0 and xs.max() > 100.0
