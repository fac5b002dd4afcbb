"""Pure-numpy planar geometry kernels (no shapely in this sandbox).

Everything operates on float64 arrays and is exact for the predicates the
operators need: boundary-inclusive point-in-polygon (covered_by), shoelace
area/centroid, point-to-segment distance/projection.
"""

from __future__ import annotations

import math

import numpy as np


def shoelace_area_centroid(vx: np.ndarray, vy: np.ndarray) -> tuple[float, float, float]:
    """Signed area + area centroid of a closed ring (first vertex may or may
    not be repeated at the end — handled).  Degenerate (zero-area) rings
    fall back to the vertex mean, like shapely's centroid of a point/line."""
    if len(vx) > 1 and vx[0] == vx[-1] and vy[0] == vy[-1]:
        vx, vy = vx[:-1], vy[:-1]
    x1, y1 = vx, vy
    x2, y2 = np.roll(vx, -1), np.roll(vy, -1)
    cross = x1 * y2 - x2 * y1
    a = cross.sum() / 2.0
    if a == 0.0:
        return 0.0, float(vx.mean()), float(vy.mean())
    cx = ((x1 + x2) * cross).sum() / (6.0 * a)
    cy = ((y1 + y2) * cross).sum() / (6.0 * a)
    return float(a), float(cx), float(cy)


def points_covered_by_ring(px: np.ndarray, py: np.ndarray,
                           vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Boundary-inclusive point-in-ring test (gpd ``covered_by`` semantics,
    reference proximity.py:2579-2595), vectorized over points.

    Crossing-number for strict interior + exact on-segment test for the
    boundary (collinearity via cross product == 0 within the segment bbox —
    exact for axis-aligned and lattice edges in float64).
    """
    if len(vx) > 1 and vx[0] == vx[-1] and vy[0] == vy[-1]:
        vx, vy = vx[:-1], vy[:-1]
    n = len(vx)
    inside = np.zeros(len(px), dtype=bool)
    on_edge = np.zeros(len(px), dtype=bool)
    x1, y1 = vx, vy
    x2, y2 = np.roll(vx, -1), np.roll(vy, -1)
    for i in range(n):
        ax, ay, bx, by = x1[i], y1[i], x2[i], y2[i]
        # boundary: collinear and within bbox
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        within = ((px >= min(ax, bx)) & (px <= max(ax, bx))
                  & (py >= min(ay, by)) & (py <= max(ay, by)))
        on_edge |= (cross == 0.0) & within
        # crossing number (half-open rule avoids double-counting vertices)
        cond = (ay > py) != (by > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ax + (py - ay) * (bx - ax) / (by - ay)
        inside ^= cond & (px < xint)
    return inside | on_edge


def points_within_ring(px: np.ndarray, py: np.ndarray,
                       vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Strict interior (gpd ``within`` when boundary points excluded)."""
    if len(vx) > 1 and vx[0] == vx[-1] and vy[0] == vy[-1]:
        vx, vy = vx[:-1], vy[:-1]
    inside = np.zeros(len(px), dtype=bool)
    on_edge = np.zeros(len(px), dtype=bool)
    x1, y1 = vx, vy
    x2, y2 = np.roll(vx, -1), np.roll(vy, -1)
    for i in range(len(vx)):
        ax, ay, bx, by = x1[i], y1[i], x2[i], y2[i]
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        within = ((px >= min(ax, bx)) & (px <= max(ax, bx))
                  & (py >= min(ay, by)) & (py <= max(ay, by)))
        on_edge |= (cross == 0.0) & within
        cond = (ay > py) != (by > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ax + (py - ay) * (bx - ax) / (by - ay)
        inside ^= cond & (px < xint)
    return inside & ~on_edge


def points_in_polygon(px: np.ndarray, py: np.ndarray,
                      rings: list[tuple[np.ndarray, np.ndarray]],
                      mode: str = "covered_by") -> np.ndarray:
    """Hole-aware point-in-polygon over a full ring list (ring 0 =
    exterior, ring ≥ 1 = holes) — even-odd composition of the single-ring
    kernels, matching gpd/GEOS full-geometry sjoin semantics
    (reference proximity.py:2579-2595):

    - ``covered_by`` (boundary-inclusive): covered by the exterior AND not
      STRICTLY inside any hole (a point on a hole's boundary is on the
      polygon boundary ⇒ still covered).
    - ``within`` (strict interior): strictly inside the exterior AND not in
      the CLOSURE of any hole (a hole-boundary point is on the polygon
      boundary ⇒ not within).

    Round 5 generalisation: computed as crossing-number PARITY over ALL
    rings plus the boundary union — identical to the exterior∧¬holes
    composition for properly nested ring lists, and additionally correct
    for MULTIPART ring lists (disconnected cells out of hole subtraction,
    where a later ring is a separate part, not a hole: parity 1 ⇒ covered).
    """
    inside = np.zeros(len(px), dtype=bool)
    on_edge = np.zeros(len(px), dtype=bool)
    for vx, vy in rings:
        cov = points_covered_by_ring(px, py, vx, vy)
        strict = points_within_ring(px, py, vx, vy)
        inside ^= strict
        on_edge |= cov & ~strict
    if mode == "within":
        return inside & ~on_edge
    return inside | on_edge


def ring_rep_point(ring: np.ndarray) -> tuple[float, float]:
    """A point strictly inside a simple ring: horizontal scanline through
    the widest vertical gap between distinct vertex levels, midpoint of the
    first crossing interval (robust for non-convex rings where the centroid
    can fall outside).  Degenerate rings fall back to the vertex mean."""
    # fast path: strictly convex ring ⇒ the vertex mean is interior
    # (arrangement faces are overwhelmingly convex; the scanline below is
    # ~20× the cost and only needed for reflex rings)
    x, y = ring[:, 0], ring[:, 1]
    n = len(ring)
    if n >= 3:
        ex = np.empty(n); ey = np.empty(n)
        ex[:-1] = x[1:] - x[:-1]; ex[-1] = x[0] - x[-1]
        ey[:-1] = y[1:] - y[:-1]; ey[-1] = y[0] - y[-1]
        cr = np.empty(n)
        cr[:-1] = ex[:-1] * ey[1:] - ey[:-1] * ex[1:]
        cr[-1] = ex[-1] * ey[0] - ey[-1] * ex[0]
        if (cr > 0.0).all() or (cr < 0.0).all():
            return float(x.mean()), float(y.mean())
    ys = np.unique(ring[:, 1])
    if len(ys) == 1:
        return float(ring[:, 0].mean()), float(ys[0])
    ym = 0.5 * (ys[0] + ys[-1])
    if np.any(np.isclose(ring[:, 1], ym)):
        gaps = np.diff(ys)
        gi = int(np.argmax(gaps))
        ym = 0.5 * (ys[gi] + ys[gi + 1])
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    cross = (y1 > ym) != (y2 > ym)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x1 + (ym - y1) * (x2 - x1) / (y2 - y1)
    xs = np.sort(xs[cross])
    if len(xs) < 2:
        return float(ring[:, 0].mean()), float(ring[:, 1].mean())
    return float(0.5 * (xs[0] + xs[1])), float(ym)


def face_edge_probe(ring: np.ndarray) -> tuple[float, float, float, float]:
    """(mx, my, nx, ny): midpoint of the ring's longest edge plus the UNIT
    interior-side normal (CCW rings — interior on the left of traversal).

    This is the EXACT face-classification anchor for coverage tests
    against a shape arrangement: a ``ring_rep_point`` may land inside a
    NESTED ISLAND face of a no-holes polygonizer (classifying the outer
    face by whatever covers the island), and any offset-by-epsilon probe
    can jump a thinner-than-epsilon gap into a neighboring region.  The
    (midpoint, side) pair avoids both: post-noding, a shape boundary
    passes through an edge MIDpoint only by lying ALONG the edge (crossings
    are split to endpoints), so coverage of the open side is decided
    exactly — strictly-inside/outside when the midpoint is off the shape
    boundary, a normal-direction sign test when it is on it.  Coverage is
    constant over a face, so any boundary edge gives the same answer —
    the driver pass (whole faces) and the tiled pass (clipped pieces)
    classify identically by construction (operators/enclosures.py)."""
    r = np.asarray(ring, dtype=np.float64)
    n = len(r)
    nxt = np.roll(r, -1, axis=0)
    ex, ey = nxt[:, 0] - r[:, 0], nxt[:, 1] - r[:, 1]
    L = np.hypot(ex, ey)
    i = int(np.argmax(L))
    if L[i] <= 0.0:
        px, py = ring_rep_point(r)
        return px, py, 0.0, 0.0
    mx = r[i, 0] + 0.5 * ex[i]
    my = r[i, 1] + 0.5 * ey[i]
    return mx, my, -ey[i] / L[i], ex[i] / L[i]


def probes_covered_by_convex(mx: np.ndarray, my: np.ndarray,
                             nx: np.ndarray, ny: np.ndarray,
                             shape: np.ndarray, tol: float) -> np.ndarray:
    """Exact side-coverage of face probes (``face_edge_probe``) by ONE
    convex ring: per probe, the signed inward distance to every shape edge;
    min > tol ⇒ midpoint strictly inside (both sides covered); |min| ≤ tol
    ⇒ midpoint on the shape boundary ⇒ covered iff the face's interior
    normal points into the shape (sign of the normals' dot product —
    post-noding the two edges are collinear, so the dot is ±1)."""
    sx, sy = shape[:, 0], shape[:, 1]
    orient = float(np.sign(np.sum(sx * np.roll(sy, -1)
                                  - np.roll(sx, -1) * sy))) or 1.0
    k = len(shape)
    m = len(mx)
    sd = np.empty((k, m))
    en = np.empty((k, 2))
    for i in range(k):
        ax, ay = shape[i]
        bx, by = shape[(i + 1) % k]
        ll = math.hypot(bx - ax, by - ay)
        if ll <= 0.0:
            sd[i] = np.inf
            en[i] = (0.0, 0.0)
            continue
        sd[i] = orient * ((bx - ax) * (my - ay)
                          - (by - ay) * (mx - ax)) / ll
        # interior-side unit normal of this shape edge
        en[i] = (-orient * (by - ay) / ll, orient * (bx - ax) / ll)
    jmin = np.argmin(sd, axis=0)
    smin = sd[jmin, np.arange(m)]
    inside = smin > tol
    onb = np.abs(smin) <= tol
    dot = en[jmin, 0] * nx + en[jmin, 1] * ny
    return inside | (onb & (dot > 0.0))


def probes_covered_by_ring(mx: np.ndarray, my: np.ndarray,
                           nx: np.ndarray, ny: np.ndarray,
                           shape: np.ndarray, tol: float) -> np.ndarray:
    """Generic (possibly NON-convex) twin of ``probes_covered_by_convex``:
    nearest true edge distance decides the on-boundary branch (normal-sign
    test against that edge's orientation-signed interior normal); probes
    off the boundary use the even-odd strict-within test."""
    sx, sy = shape[:, 0], shape[:, 1]
    orient = float(np.sign(np.sum(sx * np.roll(sy, -1)
                                  - np.roll(sx, -1) * sy))) or 1.0
    k = len(shape)
    m = len(mx)
    d = np.full((k, m), np.inf)
    en = np.zeros((k, 2))
    for i in range(k):
        ax, ay = shape[i]
        bx, by = shape[(i + 1) % k]
        ll = math.hypot(bx - ax, by - ay)
        if ll <= 0.0:
            continue
        d[i], _ = point_segment_distance(
            mx, my, np.full(m, ax), np.full(m, ay),
            np.full(m, bx), np.full(m, by))
        en[i] = (-orient * (by - ay) / ll, orient * (bx - ax) / ll)
    jmin = np.argmin(d, axis=0)
    dmin = d[jmin, np.arange(m)]
    onb = dmin <= tol
    dot = en[jmin, 0] * nx + en[jmin, 1] * ny
    inside = points_within_ring(mx, my, sx, sy)
    return (inside & ~onb) | (onb & (dot > 0.0))


def ring_signs(rings: list[np.ndarray]) -> np.ndarray:
    """+1/−1 per ring of a possibly-MULTIPART ring list: a ring is a hole
    (−1) iff its interior representative point lies inside an ODD number of
    strictly-larger rings (even-odd nesting depth), else a part (+1).
    Generalises the legacy "ring 0 exterior, rest holes" convention: for a
    properly nested exterior+holes list it returns [+1, −1, …]; for
    disconnected cells (hole subtraction output) separate parts at depth 0
    stay +1."""
    n = len(rings)
    areas = np.zeros(n)
    for i, r in enumerate(rings):
        if len(r) >= 3:
            x, y = r[:, 0], r[:, 1]
            areas[i] = abs(0.5 * float(np.sum(
                x * np.roll(y, -1) - np.roll(x, -1) * y)))
    signs = np.ones(n, dtype=np.int64)
    for i, r in enumerate(rings):
        if len(r) < 3:
            continue
        px, py = ring_rep_point(r)
        depth = 0
        for j, o in enumerate(rings):
            if j == i or len(o) < 3 or areas[j] <= areas[i]:
                continue
            if points_covered_by_ring(np.array([px]), np.array([py]),
                                      o[:, 0], o[:, 1])[0]:
                depth += 1
        if depth % 2 == 1:
            signs[i] = -1
    return signs


def rings_net_area(rings: list[np.ndarray]) -> float:
    """Net area of a multipart ring list: Σ sign·|area| with containment-
    classified signs (parts add, holes subtract)."""
    signs = ring_signs(rings)
    tot = 0.0
    for r, s in zip(rings, signs):
        if len(r) < 3:
            continue
        x, y = r[:, 0], r[:, 1]
        tot += float(s) * abs(0.5 * float(np.sum(
            x * np.roll(y, -1) - np.roll(x, -1) * y)))
    return float(tot)


def rings_area_centroid(rings: list[np.ndarray]
                        ) -> tuple[float, float, float]:
    """(net_area, cx, cy) of a multipart ring list — signed area-weighted
    centroid with containment-classified signs (GEOS ``centroid`` of a
    (Multi)Polygon); degenerate net area falls back to the largest ring's
    vertex mean."""
    signs = ring_signs(rings)
    den = nx = ny = 0.0
    best_a, fx, fy = -1.0, 0.0, 0.0
    for r, s in zip(rings, signs):
        if len(r) < 3:
            continue
        a, cx, cy = shoelace_area_centroid(r[:, 0], r[:, 1])
        a = abs(a)
        if a > best_a:
            best_a, fx, fy = a, float(r[:, 0].mean()), float(r[:, 1].mean())
        den += float(s) * a
        nx += float(s) * a * cx
        ny += float(s) * a * cy
    if den <= 0.0:
        return 0.0, float(fx), float(fy)
    return float(den), float(nx / den), float(ny / den)


def point_segment_distance(px: np.ndarray, py: np.ndarray,
                           ax: np.ndarray, ay: np.ndarray,
                           bx: np.ndarray, by: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Distance from points to segments (row-wise) + projection parameter
    t ∈ [0,1] along the segment (shapely ``line_locate_point`` analogue)."""
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - ax) * dx + (py - ay) * dy) / ll
    t = np.clip(np.where(ll == 0.0, 0.0, t), 0.0, 1.0)
    qx, qy = ax + t * dx, ay + t * dy
    return np.sqrt((px - qx) ** 2 + (py - qy) ** 2), t


def segment_segment_distance(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Row-wise min distance between segment pairs (0 when they intersect).
    All args are equal-length float64 arrays."""
    def orient(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    proper = ((d1 * d2) < 0) & ((d3 * d4) < 0)

    def on_seg(ox, oy, px, py, qx, qy, d):
        return (d == 0) & (qx >= np.minimum(ox, px)) & (qx <= np.maximum(ox, px)) \
            & (qy >= np.minimum(oy, py)) & (qy <= np.maximum(oy, py))

    touch = (on_seg(ax1, ay1, ax2, ay2, bx1, by1, d1)
             | on_seg(ax1, ay1, ax2, ay2, bx2, by2, d2)
             | on_seg(bx1, by1, bx2, by2, ax1, ay1, d3)
             | on_seg(bx1, by1, bx2, by2, ax2, ay2, d4))
    inter = proper | touch

    da1, _ = point_segment_distance(ax1, ay1, bx1, by1, bx2, by2)
    da2, _ = point_segment_distance(ax2, ay2, bx1, by1, bx2, by2)
    db1, _ = point_segment_distance(bx1, by1, ax1, ay1, ax2, ay2)
    db2, _ = point_segment_distance(bx2, by2, ax1, ay1, ax2, ay2)
    d = np.minimum(np.minimum(da1, da2), np.minimum(db1, db2))
    return np.where(inter, 0.0, d)
