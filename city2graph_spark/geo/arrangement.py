"""Planar-arrangement polygonization + polygon clipping — pure numpy.

The enclosed-tessellation path (reference
/root/reference/city2graph/utils/spatial.py:2776-2782 — ``momepy.enclosures``)
needs the faces of the street/barrier arrangement.  shapely/GEOS is absent
in this environment, so the arrangement is built from first principles:

1. ``node_segments`` — split every segment at every pairwise intersection
   (vectorized block-pairwise parametric intersection; endpoints snapped to
   a relative grid so shared cut points compare exactly equal);
2. ``polygonize`` — half-edge face extraction: sort outgoing directed edges
   by angle around each vertex, trace ``next(h) = clockwise successor of
   twin(h)``, keep positively-oriented (bounded) faces;
3. ``sutherland_hodgman`` — clip a (possibly concave) subject ring against a
   convex clipper ring: the shape needed for Voronoi-cell ∩ enclosure
   (Voronoi cells are convex, enclosures are not).

Documented bounds (same calls momepy/GEOS make differently): collinear
overlapping barriers are not merged (rare in street data; pre-dedupe);
an arrangement face's holes (isolated barrier islands) come out as separate
nested faces — consumers resolve nesting with smallest-containing-face
point location.
"""

from __future__ import annotations

import numpy as np


def _snap(arr: np.ndarray, grid: float) -> np.ndarray:
    return np.round(arr / grid) * grid


def clip_segments_to_rect(segs: np.ndarray, rect: tuple[float, float, float, float]
                          ) -> np.ndarray:
    """Liang–Barsky clip of segments (m,4)=[x1,y1,x2,y2] to a rectangle."""
    xmin, ymin, xmax, ymax = rect
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    t0 = np.zeros(len(segs))
    t1 = np.ones(len(segs))
    keep = np.ones(len(segs), dtype=bool)
    for p, q in ((-dx, x1 - xmin), (dx, xmax - x1),
                 (-dy, y1 - ymin), (dy, ymax - y1)):
        r = np.divide(q, p, out=np.full_like(q, np.inf), where=p != 0)
        ent = (p < 0)
        ext = (p > 0)
        t0 = np.where(ent, np.maximum(t0, r), t0)
        t1 = np.where(ext, np.minimum(t1, r), t1)
        keep &= ~((p == 0) & (q < 0))
    keep &= t0 < t1
    out = np.column_stack([x1 + t0 * dx, y1 + t0 * dy,
                           x1 + t1 * dx, y1 + t1 * dy])
    return out[keep]


def node_segments(segs: np.ndarray, *, grid: float = 1e-12,
                  scale: float | None = None) -> np.ndarray:
    """Split segments at all pairwise intersections (proper crossings and
    T-junctions).  Returns (k,4) noded segments with coordinates snapped to
    ``grid`` (RELATIVE to the coordinate scale) so coincident cut points
    are bit-identical; zero-length pieces and exact duplicates are dropped.

    grid=1e-12 relative sits far above double noise (~1e-16 relative —
    parametric cuts of the same crossing agree to ~1e-13) yet far below
    the dwithin tolerances downstream: at a 10⁴ m domain the absolute snap
    is 1e-8 m, so arrangement faces stay within any metric tolerance of
    the input lines (a 1e-9 relative grid displaced face edges by ~5e-6 m,
    silently breaking place↔movement contact at the default 1e-6 m
    tolerance)."""
    segs = np.asarray(segs, dtype=np.float64)
    m = len(segs)
    if m == 0:
        return segs.reshape(0, 4)
    # an explicit ``scale`` pins the snap grid independently of this call's
    # input — REQUIRED when arrangements of different subsets (per-tile
    # tasks) must produce bit-identical coordinates for shared points
    if scale is None:
        scale = max(1.0, float(np.abs(segs).max()))
    g = grid * float(scale)
    # per-segment cut lists of (t, x, y): every crossing stores ONE
    # canonical snapped point shared by both segments (round 5 — computing
    # the point parametrically per segment and snapping independently can
    # land the two copies on ADJACENT grid points when a nearly-parallel
    # pair meets a long edge, so the face fails to close and the dangle
    # pruner eats it; T-junctions canonicalise to the touching ENDPOINT)
    cuts: list[list[tuple]] = [[] for _ in range(m)]
    p = segs[:, 0:2]
    r = segs[:, 2:4] - segs[:, 0:2]
    # two-stage pairing (round 5): a blockwise boolean BBOX prefilter
    # (pure comparisons — no float temporaries) selects candidate pairs,
    # and the exact parametric intersection runs 1-D over candidates only.
    # Intersecting segments' bboxes always overlap (expanded by a hair for
    # the ±1e-12 parameter overhang), so the candidate set is a superset
    # and the cut parameters are computed by the SAME expressions as
    # before — identical output, ~10-50× less memory traffic.
    btol = 1e-9 * scale
    bx0 = np.minimum(segs[:, 0], segs[:, 2]) - btol
    bx1 = np.maximum(segs[:, 0], segs[:, 2]) + btol
    by0 = np.minimum(segs[:, 1], segs[:, 3]) - btol
    by1 = np.maximum(segs[:, 1], segs[:, 3]) + btol
    eps = 1e-12
    # grid-bucketed candidate pairs: each segment's bbox explodes to the
    # cells it covers (cell = median bbox extent); pairs sharing a cell
    # are the only ones whose bboxes can overlap beyond one cell apart —
    # O(m·overlap), not O(m²), and the exact parameters below are the
    # SAME expressions as always, so the output is unchanged.
    # cell = median bbox extent, floored at domain/1024 (a mix of micro
    # edges and one long edge must not explode the long edge into
    # domain/median cells) and at the snap grid
    ext = max(float(bx1.max() - bx0.min()), float(by1.max() - by0.min()),
              1e-9)
    cs = max(float(np.median(np.maximum(bx1 - bx0, by1 - by0))),
             ext / 1024.0, g, 1e-12)
    cell_i, cell_x, cell_y = [], [], []
    for i in range(m):
        cx0, cx1 = int(np.floor(bx0[i] / cs)), int(np.floor(bx1[i] / cs))
        cy0, cy1 = int(np.floor(by0[i] / cs)), int(np.floor(by1[i] / cs))
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        cell_i.append(np.full(nx * ny, i, dtype=np.int64))
        xs = np.repeat(np.arange(cx0, cx1 + 1), ny)
        ys = np.tile(np.arange(cy0, cy1 + 1), nx)
        cell_x.append(xs)
        cell_y.append(ys)
    ci = np.concatenate(cell_i)
    ck = np.concatenate(cell_x) * (np.int64(1) << 32) + np.concatenate(cell_y)
    order = np.argsort(ck, kind="stable")
    ck_s, ci_s = ck[order], ci[order]
    starts = np.nonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])[0]
    ends = np.r_[starts[1:], len(ck_s)]
    pair_a, pair_b = [], []
    for s0, e0 in zip(starts, ends):
        k = e0 - s0
        if k < 2:
            continue
        ids = ci_s[s0:e0]
        # fixed-size chunked emission: a degenerate cs (one outlier
        # coordinate inflating ext collapses every real segment into O(1)
        # cells) must not materialize O(k²) int64 temporaries in a single
        # repeat/tile allocation.  Blocks are capped at ~16M elements
        # (~128 MB int64) and the bbox-overlap filter runs inside the
        # block, so only true candidates survive to the concat; filtering
        # before the cross-cell np.unique dedupe commutes with it, so the
        # final pair set is identical to the one-shot path.
        chunk = max(1, (1 << 24) // k)
        for c0 in range(0, k, chunk):
            sub = ids[c0:c0 + chunk]
            A = np.repeat(sub, k)
            B = np.tile(ids, len(sub))
            sel = A < B
            A, B = A[sel], B[sel]
            if not len(A):
                continue
            ov = ((bx0[A] <= bx1[B]) & (bx1[A] >= bx0[B])
                  & (by0[A] <= by1[B]) & (by1[A] >= by0[B]))
            pair_a.append(A[ov])
            pair_b.append(B[ov])
    if pair_a:
        pa = np.concatenate(pair_a)
        pb = np.concatenate(pair_b)
        pk = np.unique(pa * np.int64(m) + pb)   # dedupe multi-cell pairs
        pa, pb = pk // m, pk % m
        R = r[pa]
        S = r[pb]
        d = R[:, 0] * S[:, 1] - R[:, 1] * S[:, 0]
        qp = p[pb] - p[pa]
        tn = qp[:, 0] * S[:, 1] - qp[:, 1] * S[:, 0]
        un = qp[:, 0] * R[:, 1] - qp[:, 1] * R[:, 0]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = tn / d
            u = un / d
        ok = (np.abs(d) > eps) & (t >= -eps) & (t <= 1 + eps) \
            & (u >= -eps) & (u <= 1 + eps)
        for a, b, tv, uv in zip(pa[ok], pb[ok], t[ok], u[ok]):
            if uv <= eps:
                px, py = segs[b, 0], segs[b, 1]
            elif uv >= 1 - eps:
                px, py = segs[b, 2], segs[b, 3]
            elif tv <= eps:
                px, py = segs[a, 0], segs[a, 1]
            elif tv >= 1 - eps:
                px, py = segs[a, 2], segs[a, 3]
            else:
                px = p[a, 0] + tv * r[a, 0]
                py = p[a, 1] + tv * r[a, 1]
            if eps < tv < 1 - eps:
                cuts[a].append((float(tv), px, py))
            if eps < uv < 1 - eps:
                cuts[b].append((float(uv), px, py))
    pieces = []
    for i in range(m):
        ents = cuts[i] + [(0.0, segs[i, 0], segs[i, 1]),
                          (1.0, segs[i, 2], segs[i, 3])]
        ents.sort(key=lambda e: e[0])
        pts = _snap(np.array([[e[1], e[2]] for e in ents]), g)
        for a in range(len(ents) - 1):
            if not np.array_equal(pts[a], pts[a + 1]):
                pieces.append((pts[a, 0], pts[a, 1], pts[a + 1, 0], pts[a + 1, 1]))
    if not pieces:
        return np.empty((0, 4))
    out = np.array(pieces)
    # dedupe undirected duplicates (overlapping barrier inputs)
    seen = set()
    keep_rows = []
    for ri, s in enumerate(out):
        k = tuple(sorted([(s[0], s[1]), (s[2], s[3])]))
        if k not in seen:
            seen.add(k)
            keep_rows.append(ri)
    return out[keep_rows]


def _prune_dangles(segs: np.ndarray) -> np.ndarray:
    """Iteratively remove segments with a degree-1 endpoint (dead ends)."""
    segs = segs.copy()
    while len(segs):
        pts = np.vstack([segs[:, :2], segs[:, 2:]])
        uniq, inv, cnt = np.unique(pts.round(12), axis=0,
                                   return_inverse=True, return_counts=True)
        deg = cnt[inv]
        bad = (deg[:len(segs)] == 1) | (deg[len(segs):] == 1)
        if not bad.any():
            break
        segs = segs[~bad]
    return segs


def polygonize(segs: np.ndarray, *, min_area: float = 1e-9
               ) -> list[np.ndarray]:
    """Noded segments → bounded faces (list of CCW rings, (k,2) arrays).

    Half-edge traversal: at the head of h=(u→v), the successor is the
    outgoing edge at v immediately clockwise of the twin (v→u); cycles with
    positive signed area are the bounded faces."""
    segs = _prune_dangles(np.asarray(segs, dtype=np.float64))
    if len(segs) == 0:
        return []
    pts = np.vstack([segs[:, :2], segs[:, 2:]])
    uniq, inv = np.unique(pts.round(12), axis=0, return_inverse=True)
    n_seg = len(segs)
    src = np.concatenate([inv[:n_seg], inv[n_seg:]])   # directed: seg fwd, rev
    dst = np.concatenate([inv[n_seg:], inv[:n_seg]])
    nh = len(src)
    twin = np.concatenate([np.arange(n_seg, nh), np.arange(0, n_seg)])
    vec = uniq[dst] - uniq[src]
    ang = np.arctan2(vec[:, 1], vec[:, 0])

    # per-vertex outgoing edges sorted by angle
    order = np.lexsort((ang, src))
    sorted_src = src[order]
    starts = np.searchsorted(sorted_src, np.arange(len(uniq)), side="left")
    ends = np.searchsorted(sorted_src, np.arange(len(uniq)), side="right")
    pos_in_vertex = np.empty(nh, dtype=np.int64)
    pos_in_vertex[order] = np.arange(nh) - starts[sorted_src]

    # vectorized successor: next(h) = clockwise predecessor of twin(h)
    # among the outgoing edges at twin's source vertex
    tv = src[twin]
    kdeg = ends[tv] - starts[tv]
    nxt = order[starts[tv] + (pos_in_vertex[twin] - 1) % kdeg]

    faces = []
    visited = np.zeros(nh, dtype=bool)
    for h0 in range(nh):
        if visited[h0]:
            continue
        ring_v = []
        h = h0
        while not visited[h]:
            visited[h] = True
            ring_v.append(src[h])
            h = nxt[h]
        ring = uniq[np.array(ring_v)]
        x, y = ring[:, 0], ring[:, 1]
        area = 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        if area > min_area:
            faces.append(ring)
    return faces


def sutherland_hodgman(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Clip ``subject`` ring (possibly concave, CCW) against a CONVEX CCW
    ``clipper`` ring.  Returns the clipped ring ((k,2), possibly empty).
    Disconnected intersections come out as one ring with zero-area bridge
    edges (the standard SH degeneracy) — downstream edge-cancellation
    dissolves handle them."""
    out = np.asarray(subject, dtype=np.float64)
    nc = len(clipper)
    for i in range(nc):
        if len(out) == 0:
            break
        a = clipper[i]
        b = clipper[(i + 1) % nc]
        ex, ey = b[0] - a[0], b[1] - a[1]
        px, py = out[:, 0], out[:, 1]
        side = ex * (py - a[1]) - ey * (px - a[0])     # >0 = inside (left)
        nxt_side = np.roll(side, -1)
        nxt_pt = np.roll(out, -1, axis=0)
        new_pts = []
        for j in range(len(out)):
            cur_in = side[j] >= -1e-12
            nx_in = nxt_side[j] >= -1e-12
            if cur_in:
                new_pts.append(out[j])
            if cur_in != nx_in:
                denom = side[j] - nxt_side[j]
                if denom != 0.0:
                    t = side[j] / denom
                    new_pts.append(out[j] + t * (nxt_pt[j] - out[j]))
        out = np.array(new_pts) if new_pts else np.empty((0, 2))
    return out
