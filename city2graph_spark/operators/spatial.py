"""Spatial graph utilities: U3 clip_graph, U6 create_isochrone
(SURVEY.md §2.4; reference /root/reference/city2graph/utils/topology.py:
698-772 and utils/spatial.py:162-302).

Isochrone hull methods: ``convex_hull`` (numpy monotone chain) and
``buffer`` (hull of a deterministic circle sampling around each reachable
node — the shapely-free stand-in for buffer-union).  The reference's
kNN-concave hull is explicitly discouraged by the reference itself for
large point counts (spatial.py:206-211); the alpha-shape variant is the
flagged follow-up.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .net import BroadcastGraph
from .topology import connected_components


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull, CCW, no repeated last vertex."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    P = pts[order]

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(P)
    upper = half(P[::-1])
    return np.array(lower[:-1] + upper[:-1])


def clip_graph(nodes: DataFrame, edges: DataFrame, clip_ring: np.ndarray, *,
               keep_outer_neighbors: bool = False,
               strict: bool = True) -> DataFrame:
    """U3 (topology.py:698-772): keep edges inside the clip polygon.

    strict/default: both endpoints covered by the polygon.
    keep_outer_neighbors: an edge survives if at least one endpoint is
    covered (the sjoin-intersects analogue for straight edge geometry).
    """
    spark = nodes.sparkSession
    ring = np.asarray(clip_ring, dtype=np.float64)
    bc = spark.sparkContext.broadcast((ring[:, 0], ring[:, 1]))

    def covered(it):
        import pandas as pd
        from ..geo.kernels import points_covered_by_ring
        vx, vy = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = points_covered_by_ring(pdf["x"].to_numpy(),
                                       pdf["y"].to_numpy(), vx, vy)
            yield pd.DataFrame({"node_id": pdf["node_id"].to_numpy()[m]})

    inside = nodes.select("node_id", "x", "y") \
        .mapInPandas(covered, "node_id long").dropDuplicates()
    if keep_outer_neighbors:
        a = edges.join(inside.withColumnRenamed("node_id", "src"),
                       "src", "left_semi")
        b = edges.join(inside.withColumnRenamed("node_id", "dst"),
                       "dst", "left_semi")
        return a.unionByName(b).dropDuplicates(["src", "dst"])
    out = edges \
        .join(inside.withColumnRenamed("node_id", "src"), "src", "left_semi")
    if strict:
        out = out.join(inside.withColumnRenamed("node_id", "dst"),
                       "dst", "left_semi")
    return out


def create_isochrone(nodes: DataFrame, edges: DataFrame,
                     center_xy: tuple[float, float],
                     thresholds: list[float], *,
                     method: str = "convex_hull",
                     buffer_dist: float = 0.0,
                     weight: str = "weight") -> dict[float, list[np.ndarray]]:
    """U6 (utils/spatial.py:162-302): per threshold, the reachable subgraph's
    connected components each yield one hull polygon.  The distance field is
    computed once and shared across thresholds (spatial.py:261-289).

    Returns {threshold: [hull rings (k,2)]}.
    """
    g = BroadcastGraph.from_df(edges, weight=weight)
    xy = nodes.select("node_id", "x", "y").collect()
    if not xy:
        return {t: [] for t in thresholds}
    arr = np.array([[r["x"], r["y"]] for r in xy])
    ids = np.array([r["node_id"] for r in xy])
    c = np.array(center_xy)
    start = ids[int(np.argmin(((arr - c) ** 2).sum(axis=1)))]
    costs = g.sssp([start], cutoff=float(max(thresholds)))
    pos = {int(i): arr[k] for k, i in enumerate(ids)}

    out: dict[float, list[np.ndarray]] = {}
    spark = nodes.sparkSession
    for t in sorted(thresholds):
        reach = {n for n, cst in costs.items() if cst <= t}
        if not reach:
            out[t] = []
            continue
        sub = edges.where(F.col("src").isin(list(reach))
                          & F.col("dst").isin(list(reach)))
        rnodes = spark.createDataFrame([(int(n),) for n in reach], "node_id long")
        cc = connected_components(sub, nodes=rnodes)
        comp: dict[int, list] = {}
        for r in cc.collect():
            comp.setdefault(r["component"], []).append(pos[int(r["node"])])
        hulls = []
        for pts in comp.values():
            P = np.array(pts)
            if method == "buffer" and buffer_dist > 0:
                ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
                circ = np.column_stack([np.cos(ang), np.sin(ang)]) * buffer_dist
                P = (P[:, None, :] + circ[None, :, :]).reshape(-1, 2)
            hulls.append(convex_hull(P))
        out[t] = hulls
    return out
