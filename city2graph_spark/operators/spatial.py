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


def alpha_shape(pts: np.ndarray, *, ratio: float = 0.3,
                allow_holes: bool = False) -> list[np.ndarray]:
    """Delaunay alpha shape (reference ``concave_hull_alpha``,
    utils/spatial.py:223-227 — shapely's GEOS concave_hull(ratio) is itself
    Delaunay-based; without GEOS this is the classic circumradius-threshold
    construction): keep triangles whose circumradius ≤ rmin + ratio·(rmax −
    rmin) — ratio=1 ⇒ every triangle ⇒ the convex hull; smaller ratios ⇒
    tighter, more concave fits — then chain the once-appearing edges of the
    kept set into rings.  Returns outer rings (holes dropped unless
    ``allow_holes``)."""
    from ..geo.delaunay import _circum, _triangulate
    from ..geo.kernels import points_covered_by_ring
    P = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(P) < 3:
        return [P]
    tris = np.array(_triangulate(P), dtype=np.int64)
    if len(tris) == 0:
        return [convex_hull(P)]
    _, rr2 = _circum(P, tris)
    rad = np.sqrt(np.maximum(rr2, 0.0))
    rmin, rmax = float(rad.min()), float(rad.max())
    cut = rmin + float(ratio) * (rmax - rmin)
    keep = tris[rad <= cut]
    if len(keep) == 0:
        keep = tris[rad <= rmin]
    # boundary = undirected edges appearing exactly once among kept tris
    e = np.concatenate([keep[:, [0, 1]], keep[:, [1, 2]], keep[:, [2, 0]]])
    key = np.sort(e, axis=1)
    uniq, idx, cnt = np.unique(key, axis=0, return_index=True,
                               return_counts=True)
    boundary = [tuple(k) for k in uniq[cnt == 1]]
    from collections import defaultdict
    adj = defaultdict(list)
    for a, b in boundary:
        adj[a].append(b)
        adj[b].append(a)
    used = set()
    rings = []
    for a0, b0 in boundary:
        if (a0, b0) in used:
            continue
        ring = [a0]
        prev, cur = a0, b0
        used.add((a0, b0))
        while cur != a0:
            ring.append(cur)
            nxts = [x for x in adj[cur]
                    if ((cur, x) if cur < x else (x, cur)) not in used]
            if not nxts:
                break
            nxt = nxts[0]
            used.add((cur, nxt) if cur < nxt else (nxt, cur))
            prev, cur = cur, nxt
        if len(ring) >= 3:
            rings.append(np.array([P[i] for i in ring]))
    if not rings:
        return [convex_hull(P)]
    if allow_holes:
        return rings
    # outer rings only: a ring is a hole iff one of its vertices lies
    # strictly inside another ring
    outer = []
    for i, r in enumerate(rings):
        inside = False
        for j, o in enumerate(rings):
            if i == j or len(o) < 3:
                continue
            rx = np.append(o[:, 0], o[0, 0])
            ry = np.append(o[:, 1], o[0, 1])
            mid = r.mean(axis=0)
            if points_covered_by_ring(np.array([mid[0]]), np.array([mid[1]]),
                                      rx, ry)[0] \
                    and abs(_ring_area(o)) > abs(_ring_area(r)):
                inside = True
                break
        if not inside:
            outer.append(r)
    return outer or rings


def _ring_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def concave_hull_knn(pts: np.ndarray, *, k: int = 3) -> np.ndarray:
    """Moreira–Santos kNN concave hull (reference ``concave_hull_knn``,
    utils/spatial.py:787+): gift-wrap with the k nearest unused candidates
    sorted by largest right-hand turn, rejecting self-intersections and
    retrying with k+1 until every point is enclosed."""
    P = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    n = len(P)
    if n < 3:
        return P
    if n == 3:
        return convex_hull(P)

    def segs_intersect(p1, p2, p3, p4):
        def ccw(a, b, c):
            return (c[1] - a[1]) * (b[0] - a[0]) - (b[1] - a[1]) * (c[0] - a[0])
        d1, d2 = ccw(p3, p4, p1), ccw(p3, p4, p2)
        d3, d4 = ccw(p1, p2, p3), ccw(p1, p2, p4)
        return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))

    from ..geo.kernels import points_covered_by_ring
    kk = max(int(k), 3)
    while kk < n:
        start = int(np.lexsort((P[:, 0], P[:, 1]))[0])   # lowest y
        hull = [start]
        used = np.zeros(n, dtype=bool)
        used[start] = True
        prev_ang = 0.0    # direction back to the "virtual" previous point
        cur = start
        ok = False
        for _ in range(6 * n):
            if len(hull) > 3:
                used[start] = False   # allow closing
            d2 = ((P - P[cur]) ** 2).sum(axis=1)
            d2[used] = np.inf
            d2[cur] = np.inf
            cand = [c for c in np.argsort(d2, kind="stable")[:kk]
                    if np.isfinite(d2[c])]
            if not cand:
                break
            angs = np.arctan2(P[cand, 1] - P[cur, 1], P[cand, 0] - P[cur, 0])
            # largest CCW turn from the back-direction of the previous step
            rel = (angs - prev_ang) % (2 * np.pi)
            order = np.argsort(-rel, kind="stable")
            nxt = None
            for oi in order:
                c = cand[oi]
                crosses = False
                for h in range(len(hull) - 2):
                    if segs_intersect(P[cur], P[c],
                                      P[hull[h]], P[hull[h + 1]]):
                        crosses = True
                        break
                if not crosses:
                    nxt = c
                    break
            if nxt is None:
                break
            if nxt == start:
                ok = True
                break
            hull.append(nxt)
            used[nxt] = True
            prev_ang = np.arctan2(P[cur, 1] - P[nxt, 1],
                                  P[cur, 0] - P[nxt, 0])
            cur = nxt
        if ok and len(hull) >= 3:
            ring = np.array([P[i] for i in hull])
            rx = np.append(ring[:, 0], ring[0, 0])
            ry = np.append(ring[:, 1], ring[0, 1])
            if points_covered_by_ring(P[:, 0], P[:, 1], rx, ry).all():
                return ring
        kk += 1
    return convex_hull(P)


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
                     method: str = "concave_hull_knn",
                     buffer_dist: float = 0.0,
                     ratio: float = 0.3,
                     allow_holes: bool = False,
                     k: int = 3,
                     weight: str = "weight") -> dict[float, list[np.ndarray]]:
    """U6 (utils/spatial.py:162-302): per threshold, the reachable subgraph's
    connected components each yield hull polygon(s).  The distance field is
    computed once and shared across thresholds (spatial.py:261-289).

    Methods (reference spatial.py:203-227, default ``concave_hull_knn``):
    ``concave_hull_knn`` (Moreira–Santos kNN), ``concave_hull_alpha``
    (Delaunay alpha shape, ``ratio``/``allow_holes``), ``convex_hull``,
    ``buffer`` (hull of circle-sampled buffers).

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
    for t in sorted(thresholds):
        reach = {n for n, cst in costs.items() if cst <= t}
        if not reach:
            out[t] = []
            continue
        # components of the reachable subgraph via BFS over the adjacency
        # ALREADY at the driver (the same street-scale contract that holds
        # the broadcast graph and the cost map here).  The previous
        # distributed connected_components per threshold re-shuffled data
        # the driver already had — ~5 s of iterative Spark jobs per
        # threshold for zero distribution benefit at this graph size.
        comp_of: dict[int, int] = {}
        for n in sorted(reach):
            if n in comp_of:
                continue
            comp_of[n] = n
            stack = [n]
            while stack:
                u = stack.pop()
                for v, _w in g.adj.get(u, ()):
                    if v in reach and v not in comp_of:
                        comp_of[v] = n
                        stack.append(v)
        comp: dict[int, list] = {}
        for n in sorted(reach):
            comp.setdefault(comp_of[n], []).append(pos[int(n)])
        hulls = []
        for pts in comp.values():
            P = np.array(pts)
            if method == "concave_hull_alpha":
                hulls.extend(alpha_shape(P, ratio=ratio,
                                         allow_holes=allow_holes))
                continue
            if method == "concave_hull_knn":
                hulls.append(concave_hull_knn(P, k=k))
                continue
            if method == "buffer" and buffer_dist > 0:
                ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
                circ = np.column_stack([np.cos(ang), np.sin(ang)]) * buffer_dist
                P = (P[:, None, :] + circ[None, :, :]).reshape(-1, 2)
            hulls.append(convex_hull(P))
        out[t] = hulls
    return out
