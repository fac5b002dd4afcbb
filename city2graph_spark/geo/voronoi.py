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


def canon_circum(P: np.ndarray, tris: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Circumcenters with each triangle's vertices first sorted
    coordinate-lexicographically: the result is a pure function of the
    three POINT VALUES, bit-identical no matter how the triangulation
    indexed them — the distributed tessellation relies on this so cell
    vertices shared between cells computed in different tasks are exactly
    equal (queen contiguity joins on coordinate equality)."""
    A = P[tris]
    order = np.lexsort((A[:, :, 1], A[:, :, 0]), axis=1)
    return _circum(P, np.take_along_axis(tris, order, axis=1))


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
    # check_cover=False: the gathered set's hull is all reflections; real
    # sites' cells never touch it, and the hole-retry ladder can only lose
    # precision on the mirror-expanded extent
    tris = np.array(_triangulate(P, check_cover=False), dtype=np.int64)
    cc, _ = canon_circum(P, tris)

    incident: list[list[int]] = [[] for _ in range(n)]
    for t_idx, tri in enumerate(tris):
        for v in tri:
            if v < n:
                incident[v].append(t_idx)

    # fan order around each site by the incident TRIANGLE's centroid angle,
    # not the circumcenter angle: triangles partition the angular space
    # around their shared vertex, so centroid angles are well-separated even
    # when (nearly) cocircular configurations make circumcenters coincide —
    # circumcenter-angle sorting produced self-intersecting cells there.
    tcent = P[tris].mean(axis=1)
    cells: list[np.ndarray] = []
    for i in range(n):
        if not incident[i]:
            cells.append(np.empty((0, 2)))
            continue
        idx = np.array(incident[i])
        C = cc[idx]
        G = tcent[idx]
        ang = np.arctan2(G[:, 1] - sites[i, 1], G[:, 0] - sites[i, 0])
        order = np.argsort(ang, kind="stable")
        cells.append(C[order])
    return cells


def _clip_halfplane(poly: np.ndarray, si: np.ndarray, sj: np.ndarray
                    ) -> np.ndarray:
    """Clip ``poly`` to the half-plane nearer ``si`` than ``sj``.

    The side function is d²(p,sj) − d²(p,si); evaluated for the mirrored
    pair (sj, si) it is the EXACT IEEE negation, and the crossing parameter
    sa/(sa−sb) equals (−sa)/(sb−sa) bit-for-bit — so the shared bisector
    edge between two Voronoi cells gets identical endpoints in both rings,
    making downstream edge-cancellation dissolves exact."""
    if len(poly) == 0:
        return poly
    dxj = poly[:, 0] - sj[0]
    dyj = poly[:, 1] - sj[1]
    dxi = poly[:, 0] - si[0]
    dyi = poly[:, 1] - si[1]
    side = (dxj * dxj + dyj * dyj) - (dxi * dxi + dyi * dyi)
    # fully vectorized vertex/crossing interleave — the expressions are
    # element-wise identical to the per-vertex loop this replaced, so the
    # output coordinates are bit-for-bit unchanged (the exact-cancellation
    # property above survives)
    n = len(poly)
    sb = np.concatenate([side[1:], side[:1]])
    pb = np.concatenate([poly[1:], poly[:1]])
    keep = side >= 0.0
    cross = (keep != (sb >= 0.0)) & (side != sb)
    # safe denominator where no crossing (slot masked out anyway) — the
    # crossing slots divide by the true (side - sb), bit-identical
    t = side / np.where(cross, side - sb, 1.0)
    cpts = poly + t[:, None] * (pb - poly)
    slots = np.empty((2 * n, 2))
    mask = np.empty(2 * n, dtype=bool)
    slots[0::2] = poly
    mask[0::2] = keep
    slots[1::2] = cpts
    mask[1::2] = cross
    out = slots[mask]
    return out if len(out) else np.empty((0, 2))


def halfplane_cells(sites: np.ndarray, subject: np.ndarray) -> list[np.ndarray]:
    """Voronoi cells clipped to a (possibly concave) ``subject`` ring by
    incremental bisector half-plane clipping, nearest-neighbor-first with
    the 2r stopping certificate (a site farther than twice the current
    cell's max radius cannot cut it).

    Robust where circumcenter-polygon construction is not: degenerate
    (cocircular) sample configurations never produce self-intersecting
    cells, and shared edges cancel exactly (see ``_clip_halfplane``).
    O(n²) site-distance matrix — intended for per-enclosure site counts
    (the distributed tessellation's applyInPandas groups), not global runs.
    """
    sites = np.asarray(sites, dtype=np.float64)
    n = len(sites)
    if n == 1:
        return [subject.copy()]
    cells = []
    s2 = (sites * sites).sum(-1)
    # candidate-selection tolerance: the batched side test below expands
    # |v−sj|²−|v−si|² into a GEMM form whose rounding differs from the
    # clip's exact difference form; admitting candidates within this
    # margin makes the flagged set a SUPERSET of the true cutters, and a
    # flagged non-cutter is a no-op clip returning the poly values
    # unchanged — so the emitted cells are bit-identical to the
    # candidate-by-candidate loop this replaced.
    big2 = max(float(s2.max()),
               float((subject * subject).sum(-1).max()), 1.0)
    margin = 256.0 * np.finfo(np.float64).eps * big2
    # distance rows in chunks: identical ordering to the full (n, n, 2)
    # diff tensor this replaced, but O(chunk·n) memory — the tensor was
    # 3.3 TiB for a 477k-sample giant-enclosure group
    chunk = max(1, min(n, 4_194_304 // max(n, 1) + 1))
    _UNCOND = 8      # nearest candidates clipped without a side pre-test
    _BLOCK = 256     # batch width of the GEMM side pre-test
    # giant-subject pre-localization: when the enclosure ring has many
    # thousands of vertices (domain-wrapping band enclosures), starting
    # every site's poly from the full ring makes each early clip an
    # O(|ring|) pass; instead clip the ring to a site-centred box first
    # and SELF-VERIFY — if the finished cell touches the box boundary the
    # box may have truncated it, so redo with a 4× box (and ultimately
    # the full ring).  A cell strictly inside the box is provably equal
    # to the unboxed result.
    big_subject = len(subject) > 1024
    sx0, sy0 = subject[:, 0].min(), subject[:, 1].min()
    sx1, sy1 = subject[:, 0].max(), subject[:, 1].max()
    ext2 = (sx1 - sx0) ** 2 + (sy1 - sy0) ** 2
    # top-K candidate ordering: the clip loop rarely looks past a few
    # hundred candidates before the certificate fires, so a full stable
    # argsort of every n-length distance row (~O(n² log n) across sites)
    # is waste at giant-group sizes; argpartition the K nearest and sort
    # just those.  A site that exhausts the K candidates with its
    # certificate still open reruns against the full stable order — same
    # examined sequence, same output.  Small groups (n ≤ 2K) keep the
    # full stable argsort path bit-for-bit.
    _TOPK = 1024
    partial = n > 2 * _TOPK
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        diff = sites[c0:c1, None, :] - sites[None, :, :]
        D = (diff * diff).sum(-1)
        if partial:
            part = np.argpartition(D, _TOPK, axis=1)[:, :_TOPK + 1]
            sub = np.take_along_axis(D, part, 1)
            ords = np.argsort(sub, axis=1, kind="stable")
            order = np.take_along_axis(part, ords, 1)
        else:
            order = np.argsort(D, axis=1, kind="stable")
        for r in range(c1 - c0):
            si = sites[c0 + r]
            cand = order[r]
            Drow = D[r]

            def run(poly):
                m = len(cand)
                # phase 1 — the old loop verbatim over the nearest few:
                # they virtually always cut, and each clip collapses the
                # poly fast
                pos = 1
                while pos < min(1 + _UNCOND, m) and len(poly):
                    j = cand[pos]
                    d = poly - si
                    rmax2 = (d * d).sum(-1).max()
                    if Drow[j] > 4.0 * rmax2:
                        return poly, False
                    poly = _clip_halfplane(poly, si, sites[j])
                    pos += 1
                # phase 2 — batched pre-test: flag candidates whose
                # bisector can cut the CURRENT poly (min side < margin)
                # and clip only those, nearest-first; candidates skipped
                # as no-cut would have been no-op clips (poly only ever
                # shrinks), so the effective clip sequence — and the
                # output — is unchanged
                exhausted = False
                while pos < m and len(poly):
                    d = poly - si
                    d2i = (d * d).sum(-1)
                    rmax2 = d2i.max()
                    if Drow[cand[pos]] > 4.0 * rmax2:
                        break
                    blk = cand[pos:pos + _BLOCK]
                    SJ = sites[blk]
                    v2 = (poly * poly).sum(-1)
                    M = (v2 - d2i)[:, None] - 2.0 * (poly @ SJ.T) + s2[blk]
                    cuts = (M < margin).any(axis=0)
                    nz = np.nonzero(cuts)[0]
                    if len(nz) == 0:
                        pos += len(blk)
                        continue
                    k = pos + int(nz[0])
                    if Drow[cand[k]] > 4.0 * rmax2:
                        break
                    poly = _clip_halfplane(poly, si, sites[cand[k]])
                    pos = k + 1
                if partial and m < n and pos >= m and len(poly):
                    d = poly - si
                    if Drow[cand[m - 1]] <= 4.0 * (d * d).sum(-1).max():
                        exhausted = True
                return poly, exhausted

            def cell_for():
                # Known limitation (ADVICE r6): for a strongly NON-CONVEX
                # subject whose half-plane cell is disconnected, a far
                # component lying ENTIRELY outside the initial box never
                # enters the clipped poly, so _touches_box cannot see it
                # and the boxed result can miss that component.  The
                # enclosure subjects this runs on are single connected
                # rings whose cells are star-shaped around their site in
                # practice; a disconnected-cell subject would need the
                # unboxed path (set big_subject handling aside) — keep
                # this in mind before reusing the boxed path elsewhere.
                out = None
                if big_subject and n > 300:
                    R = 2.0 * float(np.sqrt(Drow[cand[min(len(cand) - 1,
                                                          256)]])) + 1.0
                    for _ in range(6):
                        boxed = _clip_box(subject, si, R)
                        res, exh = run(boxed)
                        if exh:
                            return None   # caller widens the candidates
                        if not _touches_box(res, si, R):
                            return res
                        R *= 4.0
                        if R * R > 4.0 * ext2:
                            break
                res, exh = run(subject.copy())
                return None if exh else res

            out = cell_for()
            if out is None:
                # rare: the top-K candidates ran out with the certificate
                # still open — redo with the full stable order
                cand = np.argsort(Drow, kind="stable")
                out = cell_for()
            cells.append(out)
    return cells


def _clip_box(poly: np.ndarray, si: np.ndarray, R: float) -> np.ndarray:
    out = _clip_line(poly, si[0] - R, si[1], 1.0, 0.0)
    out = _clip_line(out, si[0] + R, si[1], -1.0, 0.0)
    out = _clip_line(out, si[0], si[1] - R, 0.0, 1.0)
    return _clip_line(out, si[0], si[1] + R, 0.0, -1.0)


def _touches_box(poly: np.ndarray, si: np.ndarray, R: float) -> bool:
    if len(poly) == 0:
        return False
    tol = 1e-7 * R
    return bool((np.abs(poly[:, 0] - si[0]) >= R - tol).any()
                or (np.abs(poly[:, 1] - si[1]) >= R - tol).any())


def _clip_line(poly: np.ndarray, px: float, py: float, nx: float, ny: float
               ) -> np.ndarray:
    """Clip ``poly`` to the half-plane (p − p0)·n ≥ 0."""
    if len(poly) == 0:
        return poly
    side = (poly[:, 0] - px) * nx + (poly[:, 1] - py) * ny
    # vectorized interleave, element-wise identical to the per-vertex
    # loop it replaced (see _clip_halfplane)
    m = len(poly)
    sb = np.concatenate([side[1:], side[:1]])
    pb = np.concatenate([poly[1:], poly[:1]])
    keep = side >= 0.0
    cross = (keep != (sb >= 0.0)) & (side != sb)
    t = side / np.where(cross, side - sb, 1.0)
    cpts = poly + t[:, None] * (pb - poly)
    slots = np.empty((2 * m, 2))
    mask = np.empty(2 * m, dtype=bool)
    slots[0::2] = poly
    mask[0::2] = keep
    slots[1::2] = cpts
    mask[1::2] = cross
    out = slots[mask]
    return out if len(out) else np.empty((0, 2))


def shrink_ring(ring: np.ndarray, d: float) -> np.ndarray:
    """Inward offset (inner parallel body) of a simple ring by ``d`` —
    momepy's ``buffer(-shrink)`` before boundary sampling (reference
    utils/spatial.py:2085-2197 signature, shrink=0.4).  Computed as the
    intersection of each edge's inward-offset half-plane: exact for convex
    rings, miter-joined at reflex vertices (GEOS erosion would round them —
    sub-sample-spacing difference for building-scale shrinks).  Returns the
    ORIGINAL ring unchanged when the offset degenerates (building thinner
    than 2d), mirroring momepy's fallback to the raw footprint."""
    if d <= 0.0 or len(ring) < 3:
        return ring
    x, y = ring[:, 0], ring[:, 1]
    signed = 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    if signed == 0.0:
        return ring
    orient = 1.0 if signed > 0.0 else -1.0   # CCW ⇒ interior on the left
    poly = ring.copy()
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        ln = float(np.hypot(ex, ey))
        if ln == 0.0:
            continue
        nx, ny = -ey / ln * orient, ex / ln * orient
        poly = _clip_line(poly, a[0] + nx * d, a[1] + ny * d, nx, ny)
        if len(poly) < 3:
            return ring
    px, py = poly[:, 0], poly[:, 1]
    if abs(0.5 * float(np.sum(px * np.roll(py, -1)
                              - np.roll(px, -1) * py))) <= 0.0:
        return ring
    return poly


def dissolve_cells(cells: list[np.ndarray], owners: np.ndarray,
                   *, snap: float = 1e-6) -> dict:
    """Union the Voronoi cells of co-owned sites into one polygon per owner.

    Interior edges are shared (same circumcenter endpoints) between two
    cells of the same owner and cancel; the union boundary is the chain of
    edges appearing exactly once.  Endpoints are snapped to a ``snap`` grid
    for matching (cocircular sample configurations produce circumcenters
    equal only up to fp noise); output coordinates keep the snapped values.

    Returns {owner: [ring, …]} — exterior ring first (largest |area|),
    remaining rings are holes (a courtyard building enclosing another
    building's cell yields a holed host cell; one owner's cell union is
    connected, so exactly one ring is the exterior).
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
            out[o] = []
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
        arrs = []
        for ring in rings:
            if len(ring) < 3:
                continue
            arr = np.array([[p[0] * snap, p[1] * snap] for p in ring])
            x, y = arr[:, 0], arr[:, 1]
            area = abs(0.5 * float(np.sum(x * np.roll(y, -1)
                                          - np.roll(x, -1) * y)))
            arrs.append((area, arr))
        # exterior = largest |area|; the rest are holes
        arrs.sort(key=lambda t: -t[0])
        out[o] = [a for _, a in arrs]
    return out
