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
    iso = create_isochrone(nodes, edges, (1.0, 1.0), [150.0, 350.0],
                           method="convex_hull")
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


def _c_shape():
    """C-shaped point cloud: the concave notch distinguishes concave hulls
    from the convex hull."""
    rng = np.random.default_rng(4)
    ts = rng.random(300) * 1.5 * np.pi + 0.25 * np.pi
    rr = 80.0 + rng.random(300) * 40.0
    return np.column_stack([rr * np.cos(ts), rr * np.sin(ts)])


def _area(r):
    x, y = r[:, 0], r[:, 1]
    return 0.5 * abs(float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)))


def test_alpha_shape_ratio_one_is_convex():
    from city2graph_spark.operators.spatial import alpha_shape
    P = _c_shape()
    rings = alpha_shape(P, ratio=1.0)
    assert len(rings) == 1
    assert abs(_area(rings[0]) - _area(convex_hull(P))) < 1e-6


def test_alpha_shape_concave_tighter():
    from city2graph_spark.geo.kernels import points_covered_by_ring
    from city2graph_spark.operators.spatial import alpha_shape
    P = _c_shape()
    rings = alpha_shape(P, ratio=0.2)
    assert rings
    total = sum(_area(r) for r in rings)
    assert total < 0.8 * _area(convex_hull(P))   # the notch is carved out
    # every input point stays covered by some ring
    cov = np.zeros(len(P), dtype=bool)
    for r in rings:
        rx = np.append(r[:, 0], r[0, 0])
        ry = np.append(r[:, 1], r[0, 1])
        cov |= points_covered_by_ring(P[:, 0], P[:, 1], rx, ry)
    assert cov.all()


def test_concave_hull_knn_tighter_and_covering():
    from city2graph_spark.geo.kernels import points_covered_by_ring
    from city2graph_spark.operators.spatial import concave_hull_knn
    P = _c_shape()
    ring = concave_hull_knn(P, k=8)
    assert len(ring) >= 3
    rx = np.append(ring[:, 0], ring[0, 0])
    ry = np.append(ring[:, 1], ring[0, 1])
    assert points_covered_by_ring(P[:, 0], P[:, 1], rx, ry).all()
    assert _area(ring) < 0.9 * _area(convex_hull(P))


def test_isochrone_concave_methods(grid):
    nodes, edges = grid
    iso_k = create_isochrone(nodes, edges, (1.0, 1.0), [350.0])
    assert len(iso_k[350.0]) == 1 and len(iso_k[350.0][0]) >= 3
    iso_a = create_isochrone(nodes, edges, (1.0, 1.0), [350.0],
                             method="concave_hull_alpha", ratio=1.0)
    assert len(iso_a[350.0]) >= 1
