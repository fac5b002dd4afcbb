"""M5 ``create_tessellation`` — morphological tessellation (no-barriers
path; reference /root/reference/city2graph/utils/spatial.py:2991-3024:
``momepy.morphological_tessellation(clip='bounding_box')``, tess_id=index).

Method (momepy-equivalent): sample every building boundary at ``segment``
spacing after shrinking... (momepy shrinks footprints by a buffer; without a
polygon-offset kernel the shrink is approximated by sampling the boundary
directly — cells still partition space with one cell per building), run a
bounded Voronoi of all samples (mirror trick, bbox = data bounds buffered),
and dissolve each building's sample cells into one tessellation cell by
cancelling shared Voronoi edges.

A deterministic hash-based jitter (~1e-6 m) breaks the cocircular sample
configurations that make circumcenters degenerate — the reference's own
retry ladder does exactly this (spatial.py:2282-2366).

Scope: the Voronoi runs on gathered samples (building sets are tiny next to
the document table — same rationale as the broadcast street graph); the
per-enclosure distributed variant (groupBy(enclosure).applyInPandas) is the
flagged follow-up together with non-convex enclosure clipping.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sample_boundary(vx: np.ndarray, vy: np.ndarray, segment: float
                     ) -> np.ndarray:
    """Points along a closed ring every ≤``segment`` meters (vertices kept)."""
    if len(vx) > 1 and vx[0] == vx[-1] and vy[0] == vy[-1]:
        vx, vy = vx[:-1], vy[:-1]
    pts = []
    n = len(vx)
    for i in range(n):
        ax, ay = vx[i], vy[i]
        bx, by = vx[(i + 1) % n], vy[(i + 1) % n]
        ln = float(np.hypot(bx - ax, by - ay))
        steps = max(1, int(np.ceil(ln / segment)))
        t = np.arange(steps) / steps
        pts.append(np.column_stack([ax + t * (bx - ax), ay + t * (by - ay)]))
    return np.vstack(pts)


def _jitter(pts: np.ndarray, owners: np.ndarray, eps: float = 1e-6
            ) -> np.ndarray:
    """Deterministic hash-based jitter (spatial.py:2282-2366 analogue)."""
    h1 = np.abs(np.sin(pts[:, 0] * 12.9898 + pts[:, 1] * 78.233
                       + owners * 0.017)) * 43758.5453
    h2 = np.abs(np.sin(pts[:, 0] * 39.3468 + pts[:, 1] * 11.135
                       + owners * 0.031)) * 24634.6345
    return pts + np.column_stack([(h1 % 1.0) - 0.5, (h2 % 1.0) - 0.5]) * eps


def morphological_tessellation(building_verts: DataFrame, *,
                               segment: float = 0.5,
                               buffer: float = 100.0) -> DataFrame:
    """Tessellation cells as a polygon vertex table (tess_id=building
    poly_id, ring=0, seq, x, y).  Cells partition the buffered bounding box
    of the input; every building's footprint lies inside its own cell."""
    rows = building_verts.where(F.col("ring") == 0) \
        .select("poly_id", "seq", "x", "y").collect()
    if not rows:
        return building_verts.limit(0)
    import pandas as pd
    pdf = pd.DataFrame([(r["poly_id"], r["seq"], r["x"], r["y"]) for r in rows],
                       columns=["poly_id", "seq", "x", "y"])
    samples, owners = [], []
    for pid, grp in pdf.sort_values(["poly_id", "seq"]).groupby("poly_id"):
        s = _sample_boundary(grp["x"].to_numpy(), grp["y"].to_numpy(), segment)
        samples.append(s)
        owners.append(np.full(len(s), pid, dtype=np.int64))
    S = np.vstack(samples)
    O = np.concatenate(owners)
    S = _jitter(S, O)
    bbox = (S[:, 0].min() - buffer, S[:, 1].min() - buffer,
            S[:, 0].max() + buffer, S[:, 1].max() + buffer)

    from ..geo.voronoi import dissolve_cells, voronoi_cells
    cells = voronoi_cells(S, bbox)
    rings = dissolve_cells(cells, O)

    out = []
    for pid, ring in sorted(rings.items()):
        for i, (x, y) in enumerate(ring):
            out.append((int(pid), 0, i, float(x), float(y)))
    spark = building_verts.sparkSession
    return spark.createDataFrame(
        out, "poly_id long, ring long, seq long, x double, y double")


# --------------------------------------------------------------------------
# Enclosed (barrier) tessellation — the reference's default M5 path
# --------------------------------------------------------------------------

def build_enclosures(barrier_segs, limit_rect: tuple[float, float, float, float]
                     ) -> list[tuple[int, np.ndarray]]:
    """momepy.enclosures equivalent (reference utils/spatial.py:2776-2782):
    polygonize the planar arrangement of barrier segments ∪ the limit
    rectangle into bounded faces.  Runs at the driver — barriers are
    street-scale, the same size-class call as BroadcastGraph (SURVEY §4);
    the per-enclosure Voronoi below is the distributed part.

    Returns [(eid, CCW ring ndarray)] with eids assigned in deterministic
    (minx, miny, area) order of the faces."""
    from ..geo.arrangement import clip_segments_to_rect, node_segments, polygonize
    xmin, ymin, xmax, ymax = limit_rect
    rect = np.array([(xmin, ymin, xmax, ymin), (xmax, ymin, xmax, ymax),
                     (xmax, ymax, xmin, ymax), (xmin, ymax, xmin, ymin)])
    segs = np.asarray(barrier_segs, dtype=np.float64).reshape(-1, 4)
    if len(segs):
        segs = clip_segments_to_rect(segs, limit_rect)
    allsegs = np.vstack([segs, rect]) if len(segs) else rect
    faces = polygonize(node_segments(allsegs))
    keyed = []
    for ring in faces:
        x, y = ring[:, 0], ring[:, 1]
        area = 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        keyed.append((float(ring[:, 0].min()), float(ring[:, 1].min()),
                      area, ring))
    keyed.sort(key=lambda t: (t[0], t[1], t[2]))
    return [(i, k[3]) for i, k in enumerate(keyed)]


def _tessellate_one_enclosure(ering: np.ndarray, pdf, segment: float):
    """Voronoi-partition one enclosure among its buildings (vectorized numpy;
    runs inside applyInPandas).  Returns [(place_id, ring ndarray)].

    momepy.enclosed_tessellation semantics (reference spatial.py:2661-2723):
    one building → the whole enclosure is its cell; ≥2 → Voronoi of jittered
    boundary samples clipped to the (possibly non-convex) enclosure by
    incremental bisector half-plane clipping (exact shared-edge
    cancellation — geo.voronoi.halfplane_cells), dissolved per building."""
    from ..geo.voronoi import dissolve_cells, halfplane_cells
    pids = sorted(pdf["poly_id"].unique())
    if len(pids) == 1:
        return [(int(pids[0]), ering)]
    samples, owners = [], []
    for pid in pids:
        grp = pdf[pdf["poly_id"] == pid].sort_values("seq")
        s = _sample_boundary(grp["x"].to_numpy(), grp["y"].to_numpy(), segment)
        samples.append(s)
        owners.append(np.full(len(s), pid, dtype=np.int64))
    S = _jitter(np.vstack(samples), np.concatenate(owners))
    O = np.concatenate(owners)
    clipped = halfplane_cells(S, ering)
    rings = dissolve_cells(clipped, O)
    return [(int(pid), ring) for pid, ring in sorted(rings.items())
            if len(ring) >= 3]


def enclosed_tessellation(building_verts: DataFrame, barriers_mv: DataFrame, *,
                          segment: float = 0.5, buffer: float = 100.0,
                          limit: tuple[float, float, float, float] | None = None,
                          keep_empty: bool = True) -> DataFrame:
    """M5 enclosed tessellation (reference utils/spatial.py:2725-2830 +
    momepy.enclosed_tessellation): polygonize the barrier (street)
    arrangement into enclosure faces, then Voronoi-partition each enclosure
    among the buildings inside it.

    Distribution: enclosures come from the street-scale barrier table
    (driver polygonization, broadcast rings); buildings are assigned to
    their smallest containing face by a vectorized PIP pass, and the
    per-enclosure Voronoi runs as ``groupBy(eid).applyInPandas`` — the
    natural partition key, since enclosures tile the city and each is
    independent.  At 100 TB the building table never gathers anywhere.

    ``barriers_mv``: movement polyline vertex table (movement_id, seq, x, y).
    ``limit``: (xmin, ymin, xmax, ymax) enclosure boundary; default = data
    bbox buffered by ``buffer`` (the reference derives a buffered union,
    spatial.py:2768-2775 — rectangle is the documented approximation).

    Returns a polygon vertex table (enclosure_index, place_id, ring, seq,
    x, y); ``place_id`` is the owning building's poly_id, or -1 for an
    enclosure containing no buildings (kept as its own cell when
    ``keep_empty``, matching momepy)."""
    from .morphology import polyline_parts
    from .polygons import polygon_centroids
    spark = building_verts.sparkSession
    parts = polyline_parts(barriers_mv).select("ax", "ay", "bx", "by").collect()
    segs = np.array([[r["ax"], r["ay"], r["bx"], r["by"]] for r in parts]) \
        if parts else np.empty((0, 4))
    if limit is None:
        bb = building_verts.agg(F.min("x"), F.min("y"),
                                F.max("x"), F.max("y")).head()
        xs = [bb[0], bb[2]] + ([segs[:, [0, 2]].min(), segs[:, [0, 2]].max()]
                               if len(segs) else [])
        ys = [bb[1], bb[3]] + ([segs[:, [1, 3]].min(), segs[:, [1, 3]].max()]
                               if len(segs) else [])
        limit = (float(min(xs)) - buffer, float(min(ys)) - buffer,
                 float(max(xs)) + buffer, float(max(ys)) + buffer)
    encl = build_enclosures(segs, limit)
    rings_b = spark.sparkContext.broadcast(
        [(eid, ring) for eid, ring in encl])

    # assign each building to the smallest containing face (smallest-area
    # rule resolves nested faces — barrier islands come out as nested rings)
    cents = polygon_centroids(building_verts)

    def assign(it):
        import pandas as pd
        from ..geo.kernels import points_covered_by_ring
        faces = rings_b.value
        areas = []
        for _, ring in faces:
            x, y = ring[:, 0], ring[:, 1]
            areas.append(0.5 * float(np.sum(x * np.roll(y, -1)
                                            - np.roll(x, -1) * y)))
        for pdf in it:
            if len(pdf) == 0:
                continue
            px = pdf["cx"].to_numpy()
            py = pdf["cy"].to_numpy()
            best_eid = np.full(len(pdf), -1, dtype=np.int64)
            best_area = np.full(len(pdf), np.inf)
            for (eid, ring), area in zip(faces, areas):
                inb = ((px >= ring[:, 0].min()) & (px <= ring[:, 0].max())
                       & (py >= ring[:, 1].min()) & (py <= ring[:, 1].max()))
                if not inb.any():
                    continue
                rx = np.append(ring[:, 0], ring[0, 0])
                ry = np.append(ring[:, 1], ring[0, 1])
                cov = np.zeros(len(pdf), dtype=bool)
                cov[inb] = points_covered_by_ring(px[inb], py[inb], rx, ry)
                upd = cov & (area < best_area)
                best_eid[upd] = eid
                best_area[upd] = area
            yield pd.DataFrame({"poly_id": pdf["poly_id"].to_numpy(),
                                "eid": best_eid})

    eids = cents.mapInPandas(assign, "poly_id long, eid long") \
        .where(F.col("eid") >= 0)
    verts = building_verts.where(F.col("ring") == 0) \
        .select("poly_id", "seq", "x", "y").join(eids, "poly_id")

    ring_map_b = spark.sparkContext.broadcast({eid: ring for eid, ring in encl})
    seg_len = float(segment)

    def tess(key, pdf):
        import pandas as pd
        eid = int(key[0])
        ering = ring_map_b.value[eid]
        cells = _tessellate_one_enclosure(ering, pdf, seg_len)
        rows = []
        for pid, ring in cells:
            for i, (x, y) in enumerate(ring):
                rows.append((eid, pid, 0, i, float(x), float(y)))
        return pd.DataFrame(rows, columns=["enclosure_index", "place_id",
                                           "ring", "seq", "x", "y"])

    schema = ("enclosure_index long, place_id long, ring long, seq long, "
              "x double, y double")
    out = verts.groupBy("eid").applyInPandas(tess, schema)
    if keep_empty:
        used = {r["eid"] for r in eids.select("eid").dropDuplicates().collect()}
        empty_rows = []
        for eid, ring in encl:
            if eid in used:
                continue
            for i, (x, y) in enumerate(ring):
                empty_rows.append((eid, -1, 0, i, float(x), float(y)))
        if empty_rows:
            out = out.unionByName(spark.createDataFrame(empty_rows, schema))
    return out


def create_tessellation(building_verts: DataFrame,
                        primary_barriers: DataFrame | None = None, *,
                        segment: float = 0.5,
                        buffer: float = 100.0,
                        limit: tuple[float, float, float, float] | None = None
                        ) -> DataFrame:
    """M5 entry point (spatial.py:2085-2197): barriers given → enclosed
    tessellation (the reference's default urban path); no barriers →
    morphological tessellation with bounding-box clip, tess_id = building
    index."""
    if primary_barriers is not None:
        return enclosed_tessellation(building_verts, primary_barriers,
                                     segment=segment, buffer=buffer,
                                     limit=limit)
    return morphological_tessellation(building_verts, segment=segment,
                                      buffer=buffer)
