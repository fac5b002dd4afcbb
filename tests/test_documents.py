"""Spans-document layer: WKT round-trip, extraction, span invariant."""

import numpy as np
import pandas as pd

from city2graph_spark.geo.wkt import (
    fmt_linestring,
    fmt_point,
    fmt_polygon,
    geom_type,
    parse_points,
    parse_vertices,
)
from city2graph_spark.io.documents import (
    extract_points,
    span_invariant_violations,
    synth_spans,
)


def test_wkt_point_roundtrip_exact():
    rng = np.random.default_rng(1)
    xs, ys = rng.uniform(-1e6, 1e6, 200), rng.uniform(-90, 90, 200)
    s = pd.Series([fmt_point(x, y) for x, y in zip(xs, ys)])
    out = parse_points(s)
    assert (out["x"].to_numpy() == xs).all()
    assert (out["y"].to_numpy() == ys).all()


def test_wkt_vertices_and_types():
    s = pd.Series([
        fmt_linestring([(0.0, 0.0), (1.5, 2.5), (3.0, 0.25)]),
        fmt_polygon([[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)],
                     [(1.0, 1.0), (2.0, 1.0), (1.0, 2.0), (1.0, 1.0)]]),
    ])
    assert list(geom_type(s)) == ["LINESTRING", "POLYGON"]
    v = parse_vertices(s)
    line = v[v["row"] == 0]
    assert line[["x", "y"]].to_numpy().tolist() == [[0.0, 0.0], [1.5, 2.5], [3.0, 0.25]]
    poly = v[v["row"] == 1]
    assert poly["ring"].max() == 1
    hole = poly[poly["ring"] == 1]
    assert hole[["x", "y"]].to_numpy().tolist() == [
        [1.0, 1.0], [2.0, 1.0], [1.0, 2.0], [1.0, 1.0]]


def test_spans_synth_extract_invariant(spark):
    docs = spark.createDataFrame([(i, f"text {i}") for i in range(60)],
                                 "doc_id long, text string")
    spans = synth_spans(docs).cache()
    assert span_invariant_violations(spans, spans).count() == 0
    pts = extract_points(spans)
    assert pts.count() == 60
    # mutation is caught
    from pyspark.sql import functions as F
    mutated = spans.withColumn(
        "spans", F.expr("transform(spans, s -> named_struct("
                        "'kind', s.kind, 'text', concat(s.text, 'X'), "
                        "'media_ref', s.media_ref, 'offset', s.offset))"))
    assert span_invariant_violations(spans, mutated).count() == 60
    # media spans present for every 3rd doc
    media = spans.select(F.explode("spans").alias("s")) \
                 .where(F.col("s.kind") == "image").count()
    assert media == 20
