"""S3 process_overture_segments: level_rules barrier intervals → passable
sub-linestrings; endpoint snapping (reference data.py:296-378, 806-918)."""

import pytest
from pyspark.sql import functions as F

from city2graph_spark.operators.segments import (
    line_substrings,
    passable_intervals,
    process_overture_segments,
    snap_endpoints,
)


@pytest.fixture(scope="module")
def rules(spark):
    return spark.createDataFrame(
        [(0, '[{"value": 1, "between": [0.2, 0.8]}]'),
         (1, None),                                        # no rules → whole
         (2, '[{"value": 1, "between": [0.0, 1.0]}]'),     # full barrier
         (3, '[{"value": 0, "between": [0.3, 0.4]}]'),     # value 0 → passable
         (4, '[{"value": 1, "between": [0.1, 0.4]}, '
             '{"value": 1, "between": [0.3, 0.6]}]')],     # overlapping merge
        "seg_id long, level_rules string")


def test_passable_intervals(rules):
    got = {}
    for r in passable_intervals(rules).collect():
        got.setdefault(r.seg_id, []).append((round(r.t0, 6), round(r.t1, 6)))
    for v in got.values():
        v.sort()
    assert got[0] == [(0.0, 0.2), (0.8, 1.0)]
    assert got[1] == [(0.0, 1.0)]
    assert 2 not in got                       # full barrier → NULL geometry
    assert got[3] == [(0.0, 1.0)]
    assert got[4] == [(0.0, 0.1), (0.6, 1.0)]


def test_line_substrings(spark, rules):
    mv = spark.createDataFrame(
        [(0, 0, 0.0, 0.0), (0, 1, 50.0, 0.0), (0, 2, 100.0, 0.0)],
        "movement_id long, seq long, x double, y double")
    iv = passable_intervals(rules).where(F.col("seg_id") == 0)
    pieces = line_substrings(mv, iv).collect()
    got = {}
    for r in pieces:
        got.setdefault(r.piece, []).append((r.seq, r.x, r.y))
    chains = {k: [xy[1:] for xy in sorted(v)] for k, v in got.items()}
    assert sorted(chains.values()) == [
        [(0.0, 0.0), (20.0, 0.0)],            # [0, 0.2] of a 100m line
        [(80.0, 0.0), (100.0, 0.0)]]          # [0.8, 1.0]


def test_snap_endpoints(spark):
    segs = spark.createDataFrame(
        [(0, 0.0, 0.0, 100.0, 0.0),
         (1, 100.3, 0.2, 200.0, 0.0),     # start ~ seg0's end → same cluster
         (2, 500.0, 500.0, 600.0, 500.0)],
        "seg_id long, ax double, ay double, bx double, by double")
    out = {r.seg_id: (r.ax, r.ay, r.bx, r.by)
           for r in snap_endpoints(segs, threshold=1.0).collect()}
    assert out[0][2:] == out[1][:2]           # shared snapped node
    assert out[2] == (500.0, 500.0, 600.0, 500.0)


def test_process_composition(spark, rules):
    mv = spark.createDataFrame(
        [(i, 0, float(i * 10), 0.0, ) + () for i in range(5)]
        and [(i, s, float(i * 100 + s * 50), 0.0)
             for i in range(5) for s in range(2)],
        "movement_id long, seq long, x double, y double")
    barrier_geo, eps = process_overture_segments(mv, rules, snap_threshold=1.0)
    assert {r.movement_id for r in
            barrier_geo.select("movement_id").dropDuplicates().collect()} \
        == {0, 1, 3, 4}
    assert eps.count() == 5
