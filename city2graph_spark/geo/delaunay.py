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


def _triangulate(pts: np.ndarray) -> list[tuple[int, int, int]]:
    n = len(pts)
    # super-triangle generously containing everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    r = max(np.abs(pts - [cx, cy]).max() * 4.0, 1.0)
    sp = np.array([[cx - 20 * r, cy - r], [cx + 20 * r, cy - r], [cx, cy + 20 * r]])
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
        uniq, idx, cnt = np.unique(key, axis=0, return_index=True,
                                   return_counts=True)
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
    a, b, c = P[tris[:, 0]], P[tris[:, 1]], P[tris[:, 2]]
    # shift by a for conditioning
    bx, by = (b - a).T
    cx, cy = (c - a).T
    d = 2.0 * (bx * cy - by * cx)
    d = np.where(d == 0.0, 1e-300, d)
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (cy * b2 - by * c2) / d
    uy = (bx * c2 - cx * b2) / d
    cc = np.column_stack([ux + a[:, 0], uy + a[:, 1]])
    rr = ux * ux + uy * uy
    return cc, rr
