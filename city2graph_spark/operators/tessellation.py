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


def create_tessellation(building_verts: DataFrame,
                        primary_barriers: DataFrame | None = None, *,
                        segment: float = 0.5,
                        buffer: float = 100.0) -> DataFrame:
    """M5 entry point (spatial.py:2085-2197): no barriers → morphological
    tessellation with bounding-box clip and tess_id = building index.
    Enclosed (barrier-bounded) tessellation is the flagged follow-up —
    callers use the fallback path (M14, buildings as cells) meanwhile."""
    if primary_barriers is not None:
        raise NotImplementedError(
            "enclosed tessellation (barrier polygonization + non-convex "
            "clipping) is flagged for the next round; pass "
            "primary_barriers=None for morphological tessellation or use "
            "morphology.fallback_tessellation")
    return morphological_tessellation(building_verts, segment=segment,
                                      buffer=buffer)
