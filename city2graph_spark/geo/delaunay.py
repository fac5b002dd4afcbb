"""Pure-numpy Delaunay triangulation (Bowyer–Watson) — the sandbox has no
scipy; this replaces ``scipy.spatial.Delaunay`` for the reference's
triangulation family (/root/reference/city2graph/proximity.py:890-982).

Incremental insertion with a super-triangle; the bad-triangle search is
vectorized over the triangle list per insertion (O(n) per point ⇒ O(n²)
total — fine for the per-tile/test scale this runs at; tiles at 10^12-doc
scale hold only a few thousand points each, SURVEY §7.3).

Circumcircle tests run in shifted coordinates (translate by the point) to
keep the determinant well-conditioned in float64.
"""

from __future__ import annotations

import numpy as np


def delaunay_edges(pts: np.ndarray) -> set[tuple[int, int]]:
    """Unique undirected edges (i<j) of the Delaunay triangulation of an
    (n,2) float64 array.  <3 points → pairwise edges like the reference's
    n==2 special case."""
    n = len(pts)
    if n < 2:
        return set()
    if n == 2:
        return {(0, 1)}
    tris = _triangulate(pts)
    edges: set[tuple[int, int]] = set()
    for t in tris:
        a, b, c = sorted(t)
        edges.update({(a, b), (a, c), (b, c)})
    return edges


def _triangulate(pts: np.ndarray,
                 check_cover: bool = True) -> list[tuple[int, int, int]]:
    """BW with a hole-detecting retry ladder: a super-triangle that is not
    far enough outside every TRUE circumcircle (near-collinear hull slivers
    can have circumradii of many times the data extent) absorbs those
    triangles, leaving a coverage hole near the hull after the super
    vertices are dropped.  Detect by comparing the triangulated area to the
    convex-hull area and retry with a 64× farther super-triangle (capped —
    beyond ~1e6× extent the in-circle arithmetic itself degrades, the
    documented precision bound: sub-millimetre hull sagittas at city scale
    are below coordinate noise anyway).  A retry that degrades numerically
    (no-cavity) falls back to the best attempt so far.

    ``check_cover=False`` skips the ladder (one attempt) — right for the
    mirror-trick Voronoi input, whose hull region is all reflections and
    whose cells never touch it."""
    scale = 20.0
    best = None
    best_area = -1.0
    for _ in range(4 if check_cover else 1):
        try:
            tris = _bw_once(pts, scale)
        except RuntimeError:
            break   # precision degraded at this scale — keep best-so-far
        if not check_cover:
            return tris
        area = _covered_area(pts, tris)
        if area > best_area:
            best, best_area = tris, area
        if _covers_hull(pts, tris):
            return tris
        scale *= 64.0
    if best is None:
        raise RuntimeError("Bowyer-Watson failed at every super-triangle "
                           "scale (degenerate input)")
    return best


def _covered_area(pts: np.ndarray, tris: list) -> float:
    if not tris:
        return 0.0
    T = np.array(tris, dtype=np.int64)
    a, b, c = pts[T[:, 0]], pts[T[:, 1]], pts[T[:, 2]]
    areas = 0.5 * np.abs((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                         - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    return float(areas.sum())


def _covers_hull(pts: np.ndarray, tris: list) -> bool:
    if len(pts) < 3:
        return True
    h = hull_chain(pts, keep_collinear=False)
    H = pts[h]
    hx, hy = H[:, 0], H[:, 1]
    hull_area = 0.5 * abs(float(np.sum(hx * np.roll(hy, -1)
                                       - np.roll(hx, -1) * hy)))
    if not tris:
        return hull_area <= 1e-12
    return _covered_area(pts, tris) >= hull_area * (1.0 - 1e-9)


def _bw_once(pts: np.ndarray, super_scale: float) -> list[tuple[int, int, int]]:
    n = len(pts)
    # super-triangle containing everything, at ``super_scale`` × extent
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    r = max(np.abs(pts - [cx, cy]).max() * 4.0, 1.0)
    s = super_scale
    sp = np.array([[cx - s * r, cy - r * s / 20.0],
                   [cx + s * r, cy - r * s / 20.0],
                   [cx, cy + s * r]])
    P = np.vstack([pts, sp])
    s0, s1, s2 = n, n + 1, n + 2

    tris = np.array([[s0, s1, s2]], dtype=np.int64)
    # cached circumcircle centers / squared radii
    cc, rr = _circum(P, tris)

    order = np.argsort(P[:n, 0], kind="stable")  # x-sorted insertion
    for ip in order:
        p = P[ip]
        d2 = (cc[:, 0] - p[0]) ** 2 + (cc[:, 1] - p[1]) ** 2
        bad = d2 < rr
        if not bad.any():
            # exact-arithmetic invariant: p lies in some triangle whose
            # circumcircle contains it; loosen by an ulp for fp round-off
            bad = d2 <= rr * (1 + 1e-12)
        if not bad.any():
            raise RuntimeError("Bowyer-Watson insertion found no cavity "
                               f"(degenerate input near point {ip})")
        bad_tris = tris[bad]
        # polygon hole boundary = edges appearing exactly once among bad tris
        e = np.concatenate([bad_tris[:, [0, 1]], bad_tris[:, [1, 2]],
                            bad_tris[:, [2, 0]]])
        key = np.sort(e, axis=1)
        # 1-D integer encode of the sorted pair: same lexicographic order
        # and first-occurrence indices as np.unique(key, axis=0) (both use
        # a stable mergesort), ~10× cheaper than the axis-0 structured path
        k1 = key[:, 0] * np.int64(len(P) + 1) + key[:, 1]
        _, idx, cnt = np.unique(k1, return_index=True, return_counts=True)
        boundary = e[idx[cnt == 1]]
        new = np.column_stack([boundary,
                               np.full(len(boundary), ip, dtype=np.int64)])
        tris = np.vstack([tris[~bad], new])
        ncc, nrr = _circum(P, new)
        cc = np.vstack([cc[~bad], ncc])
        rr = np.concatenate([rr[~bad], nrr])

    keep = ~np.isin(tris, [s0, s1, s2]).any(axis=1)
    return [tuple(map(int, t)) for t in tris[keep]]


def _circum(P: np.ndarray, tris: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # one gather + component slices (identical arithmetic to the previous
    # per-vertex fancy indexing + transpose unpack, just fewer numpy calls
    # — this sits on the Bowyer-Watson per-insert hot path)
    T = P[tris]
    ax, ay = T[:, 0, 0], T[:, 0, 1]
    # shift by a for conditioning
    bx = T[:, 1, 0] - ax
    by = T[:, 1, 1] - ay
    cx = T[:, 2, 0] - ax
    cy = T[:, 2, 1] - ay
    d = 2.0 * (bx * cy - by * cx)
    d = np.where(d == 0.0, 1e-300, d)
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (cy * b2 - by * c2) / d
    uy = (bx * c2 - cx * b2) / d
    cc = np.empty((len(tris), 2))
    cc[:, 0] = ux + ax
    cc[:, 1] = uy + ay
    rr = ux * ux + uy * uy
    return cc, rr


def hull_chain(pts: np.ndarray, *, keep_collinear: bool = True) -> np.ndarray:
    """Convex hull (Andrew monotone chain) as CCW vertex INDICES into
    ``pts``; with ``keep_collinear`` points lying on hull edges are kept —
    the distributed-Delaunay certification needs every boundary point."""
    n = len(pts)
    if n <= 2:
        return np.arange(n)
    order = np.lexsort((pts[:, 1], pts[:, 0]))

    def cross(o, a, b):
        return ((pts[a, 0] - pts[o, 0]) * (pts[b, 1] - pts[o, 1])
                - (pts[a, 1] - pts[o, 1]) * (pts[b, 0] - pts[o, 0]))

    thresh = 0.0
    def build(seq):
        out = []
        for i in seq:
            while len(out) >= 2:
                c = cross(out[-2], out[-1], i)
                if c < thresh or (not keep_collinear and c == 0.0):
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = build(order)
    upper = build(order[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)
