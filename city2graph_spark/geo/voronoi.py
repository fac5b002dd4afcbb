"""Bounded Voronoi diagrams from the pure-numpy Delaunay (geo.delaunay).

Mirror trick: reflect every site across the four bounding-box edges; in the
Delaunay of sites ∪ reflections, each original site's Voronoi cell is
bounded and equals its bbox-clipped cell (standard construction — the
perpendicular bisector between a site and its own reflection IS the box
edge).  Cells come out as circumcenters of incident triangles ordered by
angle around the site.

Used by the tessellation operator (reference
/root/reference/city2graph/utils/spatial.py:2991-3024 — momepy
``morphological_tessellation`` with ``clip='bounding_box'``).
"""

from __future__ import annotations

import numpy as np

from .delaunay import _circum, _triangulate


def voronoi_cells(sites: np.ndarray, bbox: tuple[float, float, float, float]
                  ) -> list[np.ndarray]:
    """Per-site bounded Voronoi polygon (CCW vertex arrays)."""
    xmin, ymin, xmax, ymax = bbox
    n = len(sites)
    refl = np.vstack([
        np.column_stack([2 * xmin - sites[:, 0], sites[:, 1]]),
        np.column_stack([2 * xmax - sites[:, 0], sites[:, 1]]),
        np.column_stack([sites[:, 0], 2 * ymin - sites[:, 1]]),
        np.column_stack([sites[:, 0], 2 * ymax - sites[:, 1]]),
    ])
    P = np.vstack([sites, refl])
    tris = np.array(_triangulate(P), dtype=np.int64)
    cc, _ = _circum(P, tris)

    incident: list[list[int]] = [[] for _ in range(n)]
    for t_idx, tri in enumerate(tris):
        for v in tri:
            if v < n:
                incident[v].append(t_idx)

    cells: list[np.ndarray] = []
    for i in range(n):
        if not incident[i]:
            cells.append(np.empty((0, 2)))
            continue
        C = cc[incident[i]]
        ang = np.arctan2(C[:, 1] - sites[i, 1], C[:, 0] - sites[i, 0])
        order = np.argsort(ang, kind="stable")
        cells.append(C[order])
    return cells


def dissolve_cells(cells: list[np.ndarray], owners: np.ndarray,
                   *, snap: float = 1e-6) -> dict:
    """Union the Voronoi cells of co-owned sites into one polygon per owner.

    Interior edges are shared (same circumcenter endpoints) between two
    cells of the same owner and cancel; the union boundary is the chain of
    edges appearing exactly once.  Endpoints are snapped to a ``snap`` grid
    for matching (cocircular sample configurations produce circumcenters
    equal only up to fp noise); output coordinates keep the snapped values.

    Returns {owner: ring (k,2) ndarray}.
    """
    from collections import defaultdict

    def key(p):
        return (round(p[0] / snap), round(p[1] / snap))

    out = {}
    by_owner = defaultdict(list)
    for cell, o in zip(cells, owners):
        by_owner[o].append(cell)
    for o, polys in by_owner.items():
        count: dict = {}
        for ring in polys:
            m = len(ring)
            if m < 3:
                continue
            for a in range(m):
                p, q = key(ring[a]), key(ring[(a + 1) % m])
                if p == q:
                    continue
                e = (p, q) if p < q else (q, p)
                count[e] = count.get(e, 0) + 1
        boundary = [e for e, c in count.items() if c == 1]
        if not boundary:
            out[o] = np.empty((0, 2))
            continue
        adj = defaultdict(list)
        for p, q in boundary:
            adj[p].append(q)
            adj[q].append(p)
        # walk the largest ring
        used = set()
        rings = []
        for p0, q0 in boundary:
            if (p0, q0) in used:
                continue
            ring = [p0]
            prev, cur = p0, q0
            used.add((p0, q0))
            while cur != p0:
                ring.append(cur)
                nxts = [x for x in adj[cur] if x != prev]
                if not nxts:
                    break
                nxt = nxts[0]
                e = (cur, nxt) if cur < nxt else (nxt, cur)
                if e in used:
                    nxts = [x for x in adj[cur]
                            if ((cur, x) if cur < x else (x, cur)) not in used]
                    if not nxts:
                        break
                    nxt = nxts[0]
                    e = (cur, nxt) if cur < nxt else (nxt, cur)
                used.add(e)
                prev, cur = cur, nxt
            rings.append(ring)
        best = max(rings, key=len)
        out[o] = np.array([[p[0] * snap, p[1] * snap] for p in best])
    return out
