"""Waxman exact-parity path, network fixed-radius, GBFS loader."""

import json
import os
import tempfile

import numpy as np
import pytest

from city2graph_spark.operators.net import network_fixed_radius_graph
from city2graph_spark.operators.proximity import waxman_graph_exact
from city2graph_spark.operators.transport import load_gbfs


def test_waxman_exact_rng_stream(spark):
    rng = np.random.default_rng(42)
    pts = rng.uniform(0, 5000, (80, 2))
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "node_id long, x double, y double")
    got = {(r.u, r.v) for r in
           waxman_graph_exact(df, 0.5, 500.0, seed=7).collect()}
    # independent replication of the reference's draw protocol
    # (proximity.py:1543-1565): ONE rng.random((n,n)), mask = <= & triu(1)
    rng2 = np.random.default_rng(7)
    dm = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    probs = 0.5 * np.exp(-dm / 500.0)
    rand = rng2.random(dm.shape)
    mask = (rand <= probs) & np.triu(np.ones_like(dm, dtype=bool), 1)
    want = {(i, j) for i, j in zip(*np.where(mask))}
    assert got == want and len(got) > 0


def test_network_fixed_radius(spark):
    nodes = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 100.0, 0.0), (2, 200.0, 0.0), (3, 300.0, 0.0)],
        "node_id long, x double, y double")
    edges = spark.createDataFrame(
        [(0, 1, 100.0), (1, 2, 100.0), (2, 3, 100.0)],
        "src long, dst long, weight double")
    pts = spark.createDataFrame(
        [(10, 1.0, 1.0), (11, 101.0, 1.0), (12, 299.0, 1.0)],
        "node_id long, x double, y double")
    got = {(r.src, r.dst): r.weight for r in
           network_fixed_radius_graph(pts, 150.0, nodes, edges).collect()}
    # snapped costs: 10@0, 11@1, 12@3 → d(10,11)=100 ≤150; others 200/300
    assert got == {(10, 11): 100.0}


def test_load_gbfs(spark):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "station_information.json"), "w") as f:
        json.dump({"data": {"stations": [
            {"station_id": "s1", "lat": 51.5, "lon": -0.1, "capacity": 10},
            {"station_id": "s2", "lat": 51.6, "lon": -0.2, "capacity": 5},
            {"station_id": "s3", "lat": None, "lon": None, "capacity": 1}]}}, f)
    with open(os.path.join(d, "free_bike_status.json"), "w") as f:
        json.dump({"data": {"bikes": [
            {"bike_id": "b1", "lat": 51.51, "lon": -0.11}]}}, f)
    with open(os.path.join(d, "system-information.json"), "w") as f:
        json.dump({"data": {"system_id": "x", "name": "demo"}}, f)
    out = load_gbfs(spark, d)
    assert set(out) == {"station_information", "free_bike_status",
                        "system_information"}
    st = out["station_information"]
    rows = {r.station_id: r.geometry for r in st.collect()}
    assert rows["s1"] is not None and rows["s1"]["lon"] == -0.1
    assert rows["s3"] is None  # NULL-guard path (transportation.py:563-567)
    assert out["system_information"].count() == 1


def test_validate_tables(spark):
    """U8 validate_gdf analogue: one-agg-pass contract checks that list
    every violation at once."""
    import pytest

    from city2graph_spark.validate import (
        validate_edges,
        validate_points,
        validate_polygons,
    )
    good = spark.createDataFrame([(0, 1.0, 2.0), (1, 3.0, 4.0)],
                                 "node_id long, x double, y double")
    assert validate_points(good) is good
    bad = spark.createDataFrame(
        [(0, 1.0, 2.0), (0, float("nan"), 4.0), (None, 5.0, 6.0)],
        "node_id long, x double, y double")
    with pytest.raises(ValueError) as e:
        validate_points(bad)
    msg = str(e.value)
    assert "duplicate ids" in msg and "null ids" in msg and "NaN" in msg

    tri = [(7, 0, s, float(x), float(y)) for s, (x, y) in
           enumerate([(0, 0), (1, 0), (0, 1)])]
    pv = spark.createDataFrame(
        tri, "poly_id long, ring long, seq long, x double, y double")
    assert validate_polygons(pv) is pv
    thin = spark.createDataFrame(
        tri[:2], "poly_id long, ring long, seq long, x double, y double")
    with pytest.raises(ValueError, match="exterior rings"):
        validate_polygons(thin)

    e_ok = spark.createDataFrame([(0, 1, 2.0)],
                                 "src long, dst long, weight double")
    assert validate_edges(e_ok, weight="weight") is e_ok
    e_bad = spark.createDataFrame([(0, 0, -1.0), (None, 1, 2.0)],
                                  "src long, dst long, weight double")
    with pytest.raises(ValueError) as e2:
        validate_edges(e_bad, weight="weight")
    m2 = str(e2.value)
    assert "self-loops" in m2 and "null endpoints" in m2 and "negative" in m2


def test_multires_rollup_hierarchy(spark):
    """Each coarser level's counts are exact sums of its children (the
    rollup reads partials, never the raw table twice)."""
    from city2graph_spark.index import multires_rollup, parent_cell
    import pyspark.sql.functions as F
    pts = spark.createDataFrame(
        [(i, float(i % 40) * 10.0, float(i // 40) * 10.0)
         for i in range(400)], "node_id long, x double, y double")
    out = multires_rollup(pts, base_cell_size=100.0, levels=3).cache()
    tot = {r.res: r.s for r in
           out.groupBy("res").agg(F.sum("n").alias("s")).collect()}
    assert tot == {0: 400, 1: 400, 2: 400}
    # parent consistency: child counts grouped by parent == next level
    lvl0 = out.where("res = 0")
    re = (lvl0.withColumn("pcell", parent_cell(F.col("cell")))
          .groupBy("pcell").agg(F.sum("n").alias("n")))
    lvl1 = {(r.cell): r.n for r in out.where("res = 1").collect()}
    assert {r.pcell: r.n for r in re.collect()} == lvl1
