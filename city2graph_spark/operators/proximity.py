"""Proximity-graph generators (SURVEY.md §2.1) as distributed cell joins.

Reimplements the semantics of ``/root/reference/city2graph/proximity.py``
(knn_graph 771-887, fixed_radius_graph 1303-1437, gabriel_graph 985-1081,
relative_neighborhood_graph 1084-1184, waxman_graph 1440-1567) over
``(node_id, x, y)`` DataFrames.  Every operator here is pure DataFrame
column arithmetic — cell equi-joins + window ranks + anti-joins — so the
whole plan stays inside whole-stage codegen; there is **no Python UDF in
any hot path**.

Scale notes (10^12 rows):

- every join is an equi-join on a packed cell id ⇒ shuffle hash join on a
  well-distributed key; AQE skew-join plus ``index.with_salt`` handle hot
  urban-core cells;
- kNN is exact via two-phase local-search → boundary-exchange: phase 1
  scans only the 3×3 halo (O(n·density) candidate pairs), phase 2 re-probes
  only the points whose kth-neighbor certificate fails (a per-row variable
  halo sized by the phase-1 kth distance — still a cell equi-join);
- the residual fallback (fewer than k candidates in the phase-2 halo) is a
  broadcast of the handful of failing probes against one full scan — exact,
  and empty for any sane cell size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import explode_cells_in_box, explode_ring, with_cell

# float64 machine epsilon — the reference's RNG lune tolerance is
# dij² − eps·max(dij²,1)·64 (/root/reference/city2graph/proximity.py:1176).
_EPS64 = 2.220446049250313e-16


def _dist(metric: str, dx, dy):
    if metric == "manhattan":
        return F.abs(dx) + F.abs(dy)
    return F.sqrt(dx * dx + dy * dy)


def estimate_knn_cell(n: int, k: int, domain: float = 5000.0) -> float:
    """Cell size targeting ~high phase-1 certification: twice the expected
    kth-NN distance for a uniform density of n points over domain²."""
    n = max(n, 2)
    return max(domain * math.sqrt(max(k, 1) / (3.0 * n)) * 2.0, domain / (1 << 18))


def knn_graph(points: DataFrame, k: int, *, cell_size: float,
              metric: str = "euclidean", directed: bool = False) -> DataFrame:
    """Exact k-nearest-neighbor graph over (node_id, x, y).

    Reference semantics (proximity.py:875-884): per node, k nearest by the
    chosen metric, self excluded; undirected output canonicalises (u,v) to
    unordered pairs and dedupes.  Ties break by (distance, dst) — the same
    deterministic order the oracle SQL uses.

    Returns (src, dst, weight).
    """
    pts = with_cell(points, cell_size=cell_size)
    build = pts.select(
        F.col("node_id").alias("dst"), F.col("x").alias("bx"),
        F.col("y").alias("by"), F.col("cell").alias("bcell"))

    def rank_topk(cand: DataFrame) -> DataFrame:
        cand = cand.where(F.col("src") != F.col("dst"))
        w = Window.partitionBy("src").orderBy(F.col("weight").asc(), F.col("dst").asc())
        return (cand.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") <= k).drop("_rn"))

    # ---- phase 1: 3×3 halo candidates --------------------------------
    probe = explode_ring(pts, ring=1).select(
        F.col("node_id").alias("src"), F.col("x").alias("px"),
        F.col("y").alias("py"), "qcell")
    cand1 = (probe.join(build, probe.qcell == build.bcell)
             .withColumn("weight", _dist(metric, F.col("px") - F.col("bx"),
                                         F.col("py") - F.col("by"))))
    top1 = rank_topk(cand1.select("src", "px", "py", "dst", "weight"))

    # Certificate: a point's kth-found distance must be strictly inside the
    # guaranteed-scanned halo (≥ cell_size from any interior point), and k
    # candidates must exist at all.
    # Anchor on the full point set: a probe with ZERO halo candidates must
    # still reach the fallback, so left-join the phase-1 aggregates.
    agg1 = top1.groupBy("src").agg(F.max("weight").alias("_kth"),
                                   F.count("*").alias("_cnt"))
    stats1 = (pts.select(F.col("node_id").alias("src"),
                         F.col("x").alias("px"), F.col("y").alias("py"))
              .join(agg1, "src", "left")
              .withColumn("_cnt", F.coalesce(F.col("_cnt"), F.lit(0))))
    certified = stats1.where((F.col("_cnt") == k) & (F.col("_kth") < F.lit(float(cell_size))))
    top_certified = top1.join(certified.select("src"), "src", "left_semi")

    # ---- phase 2: boundary exchange for uncertified probes -----------
    # Probes that found k candidates but too far: every true neighbor lies
    # within the found kth distance ⇒ re-probe a per-row box of that radius.
    retry = stats1.where((F.col("_cnt") == k) & (F.col("_kth") >= F.lit(float(cell_size))))
    retry = explode_cells_in_box(
        retry, F.col("px") - F.col("_kth"), F.col("py") - F.col("_kth"),
        F.col("px") + F.col("_kth"), F.col("py") + F.col("_kth"),
        cell_size=cell_size)
    cand2 = (retry.join(build, retry.qcell == build.bcell)
             .withColumn("weight", _dist(metric, F.col("px") - F.col("bx"),
                                         F.col("py") - F.col("by"))))
    top2 = rank_topk(cand2.select("src", "dst", "weight"))

    # Residual: fewer than k candidates in the 3×3 halo (sparse outskirts).
    # Broadcast those few probes against one full scan — exact fallback.
    sparse = stats1.where(F.col("_cnt") < k).select("src", "px", "py")
    cand3 = (F.broadcast(sparse)
             .crossJoin(build.drop("bcell"))
             .withColumn("weight", _dist(metric, F.col("px") - F.col("bx"),
                                         F.col("py") - F.col("by"))))
    top3 = rank_topk(cand3.select("src", "dst", "weight"))

    edges = (top_certified.select("src", "dst", "weight")
             .unionByName(top2.select("src", "dst", "weight"))
             .unionByName(top3.select("src", "dst", "weight")))

    if directed:
        return edges
    # undirected: canonical unordered pair, dedupe (proximity.py:879-884 via
    # nx.Graph add_edges semantics — last write wins, weights are symmetric).
    return (edges.select(F.least("src", "dst").alias("src"),
                         F.greatest("src", "dst").alias("dst"), "weight")
                 .dropDuplicates(["src", "dst"]))


def fixed_radius_graph(points: DataFrame, radius: float, *,
                       metric: str = "euclidean", cell_size: float | None = None,
                       directed: bool = False) -> DataFrame:
    """Gilbert graph: edge iff d(u,v) ≤ radius (proximity.py:1424-1432,
    keeps i<j).  Cell equi-join with ring ⌈radius/cell⌉ then exact filter."""
    cell_size = cell_size or radius
    ring = max(1, math.ceil(radius / cell_size))
    pts = with_cell(points, cell_size=cell_size)
    build = pts.select(F.col("node_id").alias("dst"), F.col("x").alias("bx"),
                       F.col("y").alias("by"), F.col("cell").alias("bcell"))
    probe = explode_ring(pts, ring=ring).select(
        F.col("node_id").alias("src"), F.col("x").alias("px"),
        F.col("y").alias("py"), "qcell")
    pair_pred = (F.col("src") < F.col("dst")) if not directed else (F.col("src") != F.col("dst"))
    return (probe.join(build, probe.qcell == build.bcell)
            .where(pair_pred)
            .withColumn("weight", _dist(metric, F.col("px") - F.col("bx"),
                                        F.col("py") - F.col("by")))
            .where(F.col("weight") <= F.lit(float(radius)))
            .select("src", "dst", "weight")
            .dropDuplicates(["src", "dst"]))


def _radius_candidates(points: DataFrame, r_cand: float) -> DataFrame:
    """Canonical (u<v) candidate pairs within r_cand, with both coordinate
    pairs kept — shared candidate set for Gabriel/RNG (mirrors the
    reference's Delaunay pruning, proximity.py:1061-1069)."""
    pts = with_cell(points, cell_size=r_cand)
    build = pts.select(F.col("node_id").alias("v"), F.col("x").alias("vx"),
                       F.col("y").alias("vy"), F.col("cell").alias("bcell"))
    probe = explode_ring(pts, ring=1).select(
        F.col("node_id").alias("u"), F.col("x").alias("ux"),
        F.col("y").alias("uy"), "qcell")
    return (probe.join(build, probe.qcell == build.bcell)
            .where(F.col("u") < F.col("v"))
            .withColumn("dist", F.sqrt(
                (F.col("ux") - F.col("vx")) * (F.col("ux") - F.col("vx"))
                + (F.col("uy") - F.col("vy")) * (F.col("uy") - F.col("vy"))))
            .where(F.col("dist") <= F.lit(float(r_cand)))
            .select("u", "v", "ux", "uy", "vx", "vy", "dist")
            .dropDuplicates(["u", "v"]))


def gabriel_graph(points: DataFrame, *, r_cand: float) -> DataFrame:
    """Gabriel graph, radius-bounded variant: among candidate pairs with
    d(u,v) ≤ r_cand, keep (u,v) iff no witness w has
    (u−w)·(v−w) < 0 (open diametral disc empty — exactly the reference's
    einsum test, proximity.py:1071-1078; endpoints never trigger since
    their dot is 0).

    Exactness: every Gabriel edge with length ≤ r_cand is found; the bound
    is the distributed candidate-pruning analogue of the reference's
    Delaunay pruning and is the documented contract of this variant (the
    unbounded edge set equals this one whenever the point set has no empty
    disc of diameter > r_cand — true for any density-bounded corpus).

    Implementation: candidates (cell self-join) → witness join on the cells
    covering each edge's diametral-disc bbox → dot-product violation as a
    plain column predicate → anti-join.  Zero UDFs.
    """
    cand = _radius_candidates(points, r_cand)
    wit_pts = with_cell(points, cell_size=r_cand).select(
        F.col("node_id").alias("w"), F.col("x").alias("wx"),
        F.col("y").alias("wy"), F.col("cell").alias("wcell"))
    mx, my, rad = ((F.col("ux") + F.col("vx")) / 2,
                   (F.col("uy") + F.col("vy")) / 2, F.col("dist") / 2)
    probe = explode_cells_in_box(cand, mx - rad, my - rad, mx + rad, my + rad,
                                 cell_size=r_cand)
    dot = ((F.col("ux") - F.col("wx")) * (F.col("vx") - F.col("wx"))
           + (F.col("uy") - F.col("wy")) * (F.col("vy") - F.col("wy")))
    violated = (probe.join(wit_pts, probe.qcell == wit_pts.wcell)
                .where(dot < 0).select("u", "v").dropDuplicates())
    return (cand.join(violated, ["u", "v"], "left_anti")
                .select("u", "v", F.col("dist").alias("weight")))


def relative_neighborhood_graph(points: DataFrame, *, r_cand: float) -> DataFrame:
    """Relative-neighborhood graph, radius-bounded variant.  Replicates the
    reference's exact predicate chain (proximity.py:1171-1181): a candidate
    dies if any witness has (u−w)·(v−w) < 0 (disc test) **or** lies in the
    lune — d(u,w)² < thr and d(v,w)² < thr with
    thr = d(u,v)² − eps·max(d(u,v)²,1)·64."""
    cand = _radius_candidates(points, r_cand)
    wit_pts = with_cell(points, cell_size=r_cand).select(
        F.col("node_id").alias("w"), F.col("x").alias("wx"),
        F.col("y").alias("wy"), F.col("cell").alias("wcell"))
    # lune ∪ disc ⊂ box [min−d, max+d] on both axes
    d = F.col("dist")
    probe = explode_cells_in_box(
        cand, F.least("ux", "vx") - d, F.least("uy", "vy") - d,
        F.greatest("ux", "vx") + d, F.greatest("uy", "vy") + d,
        cell_size=r_cand)
    dot = ((F.col("ux") - F.col("wx")) * (F.col("vx") - F.col("wx"))
           + (F.col("uy") - F.col("wy")) * (F.col("vy") - F.col("wy")))
    dij2 = d * d
    thr = dij2 - F.lit(_EPS64 * 64.0) * F.greatest(dij2, F.lit(1.0))
    du2 = ((F.col("ux") - F.col("wx")) * (F.col("ux") - F.col("wx"))
           + (F.col("uy") - F.col("wy")) * (F.col("uy") - F.col("wy")))
    dv2 = ((F.col("vx") - F.col("wx")) * (F.col("vx") - F.col("wx"))
           + (F.col("vy") - F.col("wy")) * (F.col("vy") - F.col("wy")))
    violated = (probe.join(wit_pts, probe.qcell == wit_pts.wcell)
                .where((dot < 0) | ((du2 < thr) & (dv2 < thr)))
                .select("u", "v").dropDuplicates())
    return (cand.join(violated, ["u", "v"], "left_anti")
                .select("u", "v", F.col("dist").alias("weight")))


def waxman_graph(points: DataFrame, beta: float, r0: float, seed: int, *,
                 p_min: float = 1e-6) -> DataFrame:
    """Waxman random graph, scalable variant: P(u,v) = β·exp(−d/r0)
    (proximity.py:1556-1563).  The reference draws a dense n×n uniform
    matrix from a seeded numpy Generator — inherently single-node; the
    distributed variant replaces the stream with a *per-pair deterministic
    draw* hashed from (seed,u,v) via md5, so the edge set is reproducible,
    order-independent, and shuffle-safe.  Pairs with P < p_min are pruned
    by a distance cutoff d_max = −r0·ln(p_min/β) before the draw — the
    documented deviation that makes the operator O(n·density) instead of
    O(n²)."""
    if p_min >= beta:
        raise ValueError("p_min must be < beta")
    d_max = -r0 * math.log(p_min / beta)
    cand = _radius_candidates(points, d_max)
    # 60-bit md5-derived uniform in [0,1): portable across engines.
    draw = (F.conv(F.substring(F.md5(F.concat_ws("_", F.lit(seed), F.col("u"),
                                                 F.col("v"))), 1, 15), 16, 10)
            .cast("bigint").cast("double") / F.lit(float(1 << 60)))
    prob = F.lit(float(beta)) * F.exp(-F.col("dist") / F.lit(float(r0)))
    return (cand.withColumn("_p", prob).withColumn("_r", draw)
                .where(F.col("_r") < F.col("_p"))
                .select("u", "v", F.col("dist").alias("weight")))
