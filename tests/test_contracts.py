"""Empty-input typed-schema contracts + CRS metadata (SURVEY §2.9;
reference proximity.py:2684-2728 pins exact empty-frame shapes, and
proximity.py:216-222 / base.py:828 validate CRS equality and warn on
geographic CRS)."""

import warnings

import pytest
from pyspark.sql import functions as F

from city2graph_spark.crs import ensure_same_crs, get_crs, with_crs

PTS = "node_id long, x double, y double"
EDGES = "src long, dst long, weight double"
VERTS = "poly_id long, ring long, seq long, x double, y double"
MV = "movement_id long, seq long, x double, y double"


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_empty_proximity_contracts(spark):
    from city2graph_spark.operators.proximity import (
        delaunay_graph,
        euclidean_minimum_spanning_tree,
        fixed_radius_graph,
        gabriel_graph,
        knn_graph,
        relative_neighborhood_graph,
        waxman_graph,
    )
    pts = _empty(spark, PTS)
    for fn in (lambda: knn_graph(pts, 3, cell_size=10.0),
               lambda: fixed_radius_graph(pts, 5.0),
               lambda: gabriel_graph(pts, r_cand=10.0),
               lambda: relative_neighborhood_graph(pts, r_cand=10.0),
               lambda: waxman_graph(pts, 0.5, 10.0, 1),
               lambda: delaunay_graph(pts),
               lambda: euclidean_minimum_spanning_tree(pts)):
        out = fn()
        assert out.count() == 0
        got = {f.name: f.dataType.simpleString() for f in out.schema.fields}
        for c in ("u", "v", "src", "dst"):
            if c in got:
                assert got[c] == "bigint", (c, got)
        assert got.get("weight") == "double", got


def test_empty_topology_and_polygon_contracts(spark):
    from city2graph_spark.operators.polygons import (
        contiguity_graph,
        group_nodes,
        polygon_centroids,
    )
    from city2graph_spark.operators.topology import (
        segments_to_graph,
        symmetrize_edges,
    )
    verts = _empty(spark, VERTS)
    pts = _empty(spark, PTS)
    assert contiguity_graph(verts).count() == 0
    assert polygon_centroids(verts).columns == ["poly_id", "cx", "cy"]
    gn = group_nodes(verts, pts)
    assert gn.columns == ["poly_id", "node_id", "weight"]
    assert gn.count() == 0
    segs = _empty(spark, "seg_id long, ax double, ay double, "
                         "bx double, by double")
    nodes, edges = segments_to_graph(segs, directed=False)
    assert nodes.columns == ["node_id", "x", "y"] and nodes.count() == 0
    assert {"from_node_id", "to_node_id"} <= set(edges.columns)
    e = _empty(spark, "src long, dst long")
    assert symmetrize_edges(e).columns == ["src", "dst"]


def test_empty_pipeline_contracts(spark):
    from city2graph_spark.pipeline.dedup import (
        exact_dedup,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash,
    )
    docs = _empty(spark, "doc_id long, text string")
    assert exact_dedup(docs).count() == 0
    assert minhash_signatures(docs).count() == 0
    assert simhash(docs).count() == 0
    assert ngram_jaccard_pairs(docs, max_shingle_df=10).count() == 0


def test_crs_metadata_roundtrip(spark):
    pts = spark.createDataFrame([(0, 1.0, 2.0)], PTS)
    assert get_crs(pts) is None
    tagged = with_crs(pts, "EPSG:32633")
    assert get_crs(tagged) == "EPSG:32633"
    # equality passes, mismatch raises
    assert ensure_same_crs(tagged, with_crs(pts, "EPSG:32633")) == "EPSG:32633"
    with pytest.raises(ValueError, match="CRS mismatch"):
        ensure_same_crs(tagged, with_crs(pts, "EPSG:3857"))
    # untagged passes silently next to a tagged frame
    assert ensure_same_crs(tagged, pts) == "EPSG:32633"
    # geographic CRS warns (planar metrics)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ensure_same_crs(with_crs(pts, "EPSG:4326"))
    assert any("geographic" in str(x.message) for x in w)


def test_crs_enforced_at_operator_boundary(spark):
    from city2graph_spark.operators.bipartite import knn_graph_bipartite
    a = with_crs(spark.createDataFrame([(0, 0.0, 0.0)], PTS), "EPSG:32633")
    b = with_crs(spark.createDataFrame([(1, 1.0, 1.0)], PTS), "EPSG:3857")
    with pytest.raises(ValueError, match="CRS mismatch"):
        knn_graph_bipartite(a, b, 1, cell_size=10.0)
    ok = knn_graph_bipartite(a, with_crs(
        spark.createDataFrame([(1, 1.0, 1.0)], PTS), "EPSG:32633"),
        1, cell_size=10.0)
    assert ok.count() == 1


def test_empty_neardup_and_dup_edges_contracts(spark):
    """Round-4 additions keep the empty-input schema contract: zero rows,
    full schema, no exceptions."""
    from city2graph_spark.operators.proximity import fixed_radius_graph
    from city2graph_spark.pipeline.simsearch import embedding_neardup_pairs
    emb = _empty(spark, "vec_id long, embedding array<float>")
    out = embedding_neardup_pairs(emb, 0.5)
    assert out.columns == ["doc_a", "doc_b"] and out.count() == 0
    lsh = embedding_neardup_pairs(emb, 0.5, method="lsh")
    assert lsh.columns == ["doc_a", "doc_b"] and lsh.count() == 0
    pts = _empty(spark, "node_id long, x double, y double")
    d = fixed_radius_graph(pts, 1.0, duplicate_edges=True)
    assert d.columns == ["src", "dst", "weight"] and d.count() == 0
