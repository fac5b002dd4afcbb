"""O1 od_matrix_to_graph + X1 add_metapaths vs hand-computed fixtures
(mirrors reference tests/test_mobility.py and tests/test_metapath.py
fixture semantics: duplicates, self-loops, threshold ordering, alignment
drop, reciprocal-sum undirected merge; 2-hop path counting)."""

import pytest
from pyspark.sql import functions as F

from city2graph_spark.operators.metapath import add_metapath, add_metapaths
from city2graph_spark.operators.mobility import (
    adjacency_to_edgelist,
    od_matrix_to_graph,
)


@pytest.fixture(scope="module")
def zones(spark):
    return spark.createDataFrame([("A",), ("B",), ("C",), ("D",)],
                                 "zone_id string")


@pytest.fixture(scope="module")
def flows(spark):
    return spark.createDataFrame(
        [("A", "B", 5.0), ("A", "B", 3.0),     # duplicates → sum 8
         ("B", "A", 2.0),                      # reciprocal
         ("A", "A", 9.0),                      # self loop
         ("C", "D", 0.5),                      # below directed threshold 1
         ("X", "B", 7.0), ("A", "Y", 7.0)],    # alignment drops
        "source string, target string, flow double")


def test_directed_threshold_and_alignment(zones, flows):
    got = {(r.source, r.target): r.flow
           for r in od_matrix_to_graph(
               flows, zones, weight_cols=["flow"], threshold=1.0).collect()}
    assert got == {("A", "B"): 8.0, ("B", "A"): 2.0}


def test_no_threshold_keeps_positive(zones, flows):
    got = {(r.source, r.target): r.flow
           for r in od_matrix_to_graph(flows, zones, weight_cols=["flow"]).collect()}
    assert got == {("A", "B"): 8.0, ("B", "A"): 2.0, ("C", "D"): 0.5}


def test_self_loops_kept_on_request(zones, flows):
    got = {(r.source, r.target): r.flow
           for r in od_matrix_to_graph(flows, zones, weight_cols=["flow"],
                                       include_self_loops=True).collect()}
    assert got[("A", "A")] == 9.0


def test_undirected_merge_threshold_after(zones, flows):
    # A↔B merges to 10; threshold 9 keeps it even though each direction < 9
    got = {(r.source, r.target): r.flow
           for r in od_matrix_to_graph(flows, zones, weight_cols=["flow"],
                                       threshold=9.0, directed=False).collect()}
    assert got == {("A", "B"): 10.0}


def test_adjacency_melt(spark, zones):
    adj = spark.createDataFrame(
        [("A", 0.0, 4.0), ("B", 1.0, 0.0)],
        "zone_id string, A double, B double")
    e = adjacency_to_edgelist(adj, "zone_id")
    got = {(r.source, r.target): r.weight for r in e.collect()}
    assert got == {("A", "A"): 0.0, ("A", "B"): 4.0,
                   ("B", "A"): 1.0, ("B", "B"): 0.0}
    final = od_matrix_to_graph(e, zones)
    assert {(r.source, r.target) for r in final.collect()} == {("A", "B"), ("B", "A")}


def test_metapath_2hop_counts_and_attrs(spark):
    # building→road: b1→r1, b1→r2, b2→r1 ; road→poi: r1→p1, r1→p2, r2→p1
    br = spark.createDataFrame(
        [("b1", "r1", 1.0), ("b1", "r2", 2.0), ("b2", "r1", 4.0)],
        "src string, dst string, travel_time double")
    rp = spark.createDataFrame(
        [("r1", "p1", 10.0), ("r1", "p2", 20.0), ("r2", "p1", 40.0)],
        "src string, dst string, travel_time double")
    out = add_metapath([br, rp], attrs=["travel_time"]).collect()
    got = {(r.src, r.dst): (r.weight, r.travel_time_sum) for r in out}
    # b1→p1 via r1 (1+10) and via r2 (2+40) → weight 2, sum 53
    assert got == {("b1", "p1"): (2, 53.0), ("b1", "p2"): (1, 21.0),
                   ("b2", "p1"): (1, 14.0), ("b2", "p2"): (1, 24.0)}
    # typed dict API + key contract
    edges = {("building", "connects", "road"): br, ("road", "serves", "poi"): rp}
    res = add_metapaths(edges, [[("building", "connects", "road"),
                                 ("road", "serves", "poi")]])
    assert list(res) == [("building", "metapath_0", "poi")]
    # mean/mean reductions
    mm = add_metapath([br, rp], attrs=["travel_time"], row_reduce="mean",
                      group_reduce="mean").collect()
    g = {(r.src, r.dst): r.travel_time_mean for r in mm}
    assert g[("b1", "p1")] == ((1 + 10) / 2 + (2 + 40) / 2) / 2


def test_metapath_undirected_dedup_and_reverse_lookup(spark):
    """Undirected semantics (reference metapath.py:831-840, 956-991): a
    path and its reversal collapse onto one canonical signature; weight
    counts undirected paths; a missing hop key resolves via the reverse
    edge type traversed backwards."""
    t1 = spark.createDataFrame([(1, 2, 10.0), (3, 2, 30.0)],
                               "src long, dst long, w double")
    t2 = spark.createDataFrame([(2, 3, 100.0), (2, 1, 1000.0)],
                               "src long, dst long, w double")
    directed = {(r.src, r.dst): (r.weight, r.w_sum)
                for r in add_metapath([t1, t2], attrs=["w"]).collect()}
    assert directed == {(1, 3): (1, 110.0), (3, 1): (1, 1030.0),
                        (1, 1): (1, 1010.0), (3, 3): (1, 130.0)}
    und = {(r.src, r.dst): (r.weight, r.w_sum)
           for r in add_metapath([t1, t2], attrs=["w"],
                                 directed=False).collect()}
    # 1-2-3 and 3-2-1 traverse the same undirected edge set {1:2, 2:3} in
    # opposite order -> one canonical path; min-struct keeps w=110
    assert und == {(1, 3): (1, 110.0), (1, 1): (1, 1010.0),
                   (3, 3): (1, 130.0)}
    # reverse-key hop lookup: B->C hop missing, (C,r2,B) present
    ab = spark.createDataFrame([(1, 2)], "src long, dst long")
    cb = spark.createDataFrame([(5, 2)], "src long, dst long")
    edges = {("A", "r1", "B"): ab, ("C", "r2", "B"): cb}
    path = [("A", "r1", "B"), ("B", "r2", "C")]
    with pytest.raises(KeyError):
        add_metapaths(edges, [path])
    res = add_metapaths(edges, [path], directed=False)
    rows = res[("A", "metapath_0", "C")].collect()
    assert [(r.src, r.dst, r.weight) for r in rows] == [(1, 5, 1)]
