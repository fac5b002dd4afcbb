"""Distributed (tiled) buffered-union enclosure build.

The reference derives its DEFAULT enclosure limit as the union of per-
geometry buffers (reference utils/spatial.py:2922-2962) and polygonizes the
barrier arrangement inside it in-process.  The driver twin of that pass
(`tessellation.build_enclosures_limited`) gathers the pre-merged building
runs at the driver — loudly capped at ``union_driver_cap``.  This module is
the metro-scale path: the SAME enclosure set computed tile-by-tile with no
driver gather of building-scale data anywhere on the success path.

Method
------
1.  **Tile the domain** into squares of side ``ts`` on an irrationally-
    offset grid (so axis-aligned input edges almost never coincide with a
    tile border — coincident-collinear overlap is the one documented
    arrangement degeneracy, `geo/arrangement.py` module docstring).
2.  **Ship, don't gather**: every barrier segment and every shape boundary
    edge is exploded (UNCLIPPED, original endpoints) to the tiles its bbox
    overlaps; every convex shape ring is likewise exploded to the tiles it
    covers.  The two streams meet in a per-tile ``cogroup``.
3.  **Per-tile arrangement** (pure numpy, the exact kernels the driver pass
    uses): clip edges to the tile square (Liang–Barsky — the crossing of an
    edge with a border line is computed from the ORIGINAL endpoints, so the
    two tiles sharing the border derive bit-identical crossing points),
    node + polygonize with the GLOBAL snap scale, keep faces whose rep
    point is covered by a local shape (inside the union), dissolve kept
    faces across shared non-barrier edges (`geo/voronoi.dissolve_cells` —
    which also cancels barrier spur walls, exactly as the driver pass
    does), and emit each local component's rings PLUS a canonical key for
    every non-barrier face edge lying on the tile border.
4.  **Stitch**: a border sub-edge key seen from both sides links the two
    local components; the links feed the engine's distributed
    label-propagation `topology.connected_components`.
5.  **Merge**: per global component, the tile pieces' rings dissolve by
    edge cancellation (border sub-edges appear exactly twice and vanish),
    collinear border residue is stripped, and eids are assigned in the
    driver pass's deterministic (minx, miny, area) order.

Exactness: every coordinate the two paths share is produced by the same
expression on the same inputs and snapped to the same global grid, so the
enclosure ring set equals the driver pass's up to collinear T-junction
vertices (stripped on both sides in the parity test —
``tests/test_enclosures_dist.py``).

Scale notes: per-tile work is bounded by ``tile_shapes``; the one
data-dependent gather left is the per-component piece merge, bounded by the
size of a single enclosure (a city block; capped LOUDLY at
``component_cap`` rows for adversarial no-barrier mega-blobs).  The final
eid ordering is one narrow window over n_enclosures rows.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..index import CELL_OFFSET, CELL_SHIFT, pack_cell

COMP_BITS = 20
COMP_SHIFT = 1 << COMP_BITS

_PIECE_SCHEMA = ("tile long, comp int, kind int, ring int, seq int, "
                 "x double, y double, k1 long, k2 long, k3 long, k4 long")


def _strip_collinear(ring: np.ndarray, eps: float) -> np.ndarray:
    """Drop vertices whose neighbor cross product vanishes (tile-border
    subdivision residue after edge cancellation)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) < 4:
        return r
    a = np.roll(r, 1, axis=0)
    c = np.roll(r, -1, axis=0)
    cross = ((r[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
             - (r[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    keep = np.abs(cross) > eps
    return r[keep] if keep.sum() >= 3 else r


def _tile_task_builder(ox: float, oy: float, ts: float, scale: float):
    """Per-tile arrangement task (closure constants only — picklable)."""

    def task(key, edges_pdf, shapes_pdf):
        import numpy as np
        import pandas as pd

        from ..geo.arrangement import (clip_segments_to_rect, node_segments,
                                       polygonize)
        from ..geo.kernels import face_edge_probe
        from ..geo.voronoi import dissolve_cells

        tile = int(key[0])
        tcx = tile // CELL_SHIFT - CELL_OFFSET
        tcy = tile % CELL_SHIFT - CELL_OFFSET
        tx0, tx1 = ox + tcx * ts, ox + (tcx + 1) * ts
        ty0, ty1 = oy + tcy * ts, oy + (tcy + 1) * ts
        g = 1e-12 * scale
        tol = 1e-9 * scale
        cols = ["tile", "comp", "kind", "ring", "seq", "x", "y",
                "k1", "k2", "k3", "k4"]
        empty = pd.DataFrame(columns=cols)

        shapes = []
        for vs in shapes_pdf["vs"]:
            arr = np.asarray(vs, dtype=np.float64).reshape(-1, 2)
            shapes.append(arr)
        if not shapes:
            return empty

        square = np.array([[tx0, ty0, tx1, ty0], [tx1, ty0, tx1, ty1],
                           [tx1, ty1, tx0, ty1], [tx0, ty1, tx0, ty0]])
        if len(edges_pdf):
            raw = edges_pdf[["ex1", "ey1", "ex2", "ey2"]].to_numpy(float)
            et = edges_pdf["etype"].to_numpy()
            bmask = et == 0
            clipped = clip_segments_to_rect(raw, (tx0, ty0, tx1, ty1))
            bsegs = clip_segments_to_rect(raw[bmask], (tx0, ty0, tx1, ty1))
        else:
            clipped = np.empty((0, 4))
            bsegs = np.empty((0, 4))

        if len(clipped) == 0:
            # interior tile: the whole square is one face of the union if
            # any covering shape contains it
            cx, cy = 0.5 * (tx0 + tx1), 0.5 * (ty0 + ty1)
            if not _covered(np.array([[cx, cy, 0.0, 0.0]]), shapes, tol)[0]:
                return empty
            ring = np.array([[tx0, ty0], [tx1, ty0], [tx1, ty1], [tx0, ty1]])
            # same global snap the arrangement tiles apply — the corner
            # coords must cancel against the neighbors' snapped rings
            ring = np.round(ring / g) * g
            rows = _emit_component(tile, 0, [ring])
            rows += _emit_border_keys(tile, 0, [ring], (tx0, ty0, tx1, ty1),
                                      np.empty((0, 4)), g, tol)
            return pd.DataFrame(rows, columns=cols)

        allsegs = np.vstack([clipped, square])
        faces = polygonize(node_segments(allsegs, scale=scale))
        if not faces:
            return empty

        # EXACT (midpoint, interior-side) probes: constant over a face ⇒
        # tile pieces classify exactly as the driver pass classifies the
        # whole face (see face_edge_probe docstring)
        reps = np.array([face_edge_probe(r) for r in faces])
        covered = _covered(reps, shapes, tol)
        kept = [faces[i] for i in np.nonzero(covered)[0]]
        if not kept:
            return empty

        # intra-tile dissolve across shared non-barrier edges (the driver
        # pass's union-find, verbatim semantics)
        parent = list(range(len(kept)))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        edge_owner: dict = {}
        cand_fi, cand_fj, cand_mx, cand_my = [], [], [], []
        for fi, ring in enumerate(kept):
            nxt = np.roll(np.arange(len(ring)), -1)
            for i in range(len(ring)):
                a = (ring[i, 0], ring[i, 1])
                b = (ring[nxt[i], 0], ring[nxt[i], 1])
                ek = (a, b) if a < b else (b, a)
                if ek in edge_owner:
                    cand_fi.append(fi)
                    cand_fj.append(edge_owner[ek])
                    cand_mx.append(0.5 * (a[0] + b[0]))
                    cand_my.append(0.5 * (a[1] + b[1]))
                else:
                    edge_owner[ek] = fi
        if cand_fi:
            onb = _on_barrier(np.array(cand_mx), np.array(cand_my),
                              bsegs, tol)
            for fi, fj, ob in zip(cand_fi, cand_fj, onb):
                if not ob:
                    parent[find(fi)] = find(fj)
        groups = np.array([find(i) for i in range(len(kept))])
        by_group = dissolve_cells(kept, groups)

        rows = []
        comp_of_group = {}
        for ci, (gid, rl) in enumerate(sorted(by_group.items())):
            if not rl:
                continue
            if ci >= COMP_SHIFT:
                raise ValueError("tile component overflow")
            comp_of_group[gid] = ci
            rows += _emit_component(tile, ci, rl)
        # border keys come from the PRE-dissolve face rings (raw snapped
        # arrangement coords — identical on both sides of the border)
        for fi, ring in enumerate(kept):
            ci = comp_of_group.get(groups[fi])
            if ci is None:
                continue
            rows += _emit_border_keys(tile, ci, [ring],
                                      (tx0, ty0, tx1, ty1), bsegs, g, tol)
        return pd.DataFrame(rows, columns=cols)

    return task


def _covered(probes: np.ndarray, shapes: list[np.ndarray],
             tol: float) -> np.ndarray:
    """Exact side-coverage of (midpoint, interior-normal) face probes
    (``geo.kernels.face_edge_probe``) by any CONVEX shape — the SAME
    classification the driver pass runs, so a tile-clipped piece keeps/
    drops exactly as the whole face would."""
    from ..geo.kernels import probes_covered_by_convex
    out = np.zeros(len(probes), dtype=bool)
    for sh in shapes:
        idx = np.nonzero(~out)[0]
        if len(idx) == 0:
            break
        inside = probes_covered_by_convex(
            probes[idx, 0], probes[idx, 1], probes[idx, 2], probes[idx, 3],
            sh, tol)
        out[idx[inside]] = True
    return out


def _on_barrier(mx: np.ndarray, my: np.ndarray, bsegs: np.ndarray,
                tol: float) -> np.ndarray:
    from ..geo.kernels import point_segment_distance
    onb = np.zeros(len(mx), dtype=bool)
    for s in bsegs:
        d, _ = point_segment_distance(
            mx, my, np.full(len(mx), s[0]), np.full(len(mx), s[1]),
            np.full(len(mx), s[2]), np.full(len(mx), s[3]))
        onb |= d <= tol
    return onb


def _emit_component(tile: int, comp: int, rl: list) -> list:
    rows = []
    for ri, ring in enumerate(rl):
        for i, (x, y) in enumerate(np.asarray(ring, dtype=np.float64)):
            rows.append((tile, comp, 0, ri, i, float(x), float(y),
                         0, 0, 0, 0))
    return rows


def _emit_border_keys(tile: int, comp: int, rings: list,
                      sq: tuple, bsegs: np.ndarray,
                      g: float, tol: float) -> list:
    """Canonical keys of non-barrier face edges lying on the tile border.
    Key = snapped-grid integer quadruple of the sorted endpoint pair — the
    adjacent tile derives the same quadruple for the same sub-edge."""
    tx0, ty0, tx1, ty1 = sq
    rows = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        n = len(r)
        a = r
        b = np.roll(r, -1, axis=0)
        on_v = ((np.abs(a[:, 0] - tx0) <= tol) & (np.abs(b[:, 0] - tx0) <= tol)
                ) | ((np.abs(a[:, 0] - tx1) <= tol)
                     & (np.abs(b[:, 0] - tx1) <= tol))
        on_h = ((np.abs(a[:, 1] - ty0) <= tol) & (np.abs(b[:, 1] - ty0) <= tol)
                ) | ((np.abs(a[:, 1] - ty1) <= tol)
                     & (np.abs(b[:, 1] - ty1) <= tol))
        onb = on_v | on_h
        if not onb.any():
            continue
        idx = np.nonzero(onb)[0]
        mx = 0.5 * (a[idx, 0] + b[idx, 0])
        my = 0.5 * (a[idx, 1] + b[idx, 1])
        if len(bsegs):
            idx = idx[~_on_barrier(mx, my, bsegs, tol)]
        for i in idx:
            p = (int(round(a[i, 0] / g)), int(round(a[i, 1] / g)))
            q = (int(round(b[i, 0] / g)), int(round(b[i, 1] / g)))
            if q < p:
                p, q = q, p
            rows.append((tile, comp, 1, 0, 0, 0.0, 0.0,
                         p[0], p[1], q[0], q[1]))
    return rows


def enclosures_union_distributed(rects: DataFrame,
                                 capsules: list[np.ndarray],
                                 barrier_segs: np.ndarray, *,
                                 buffer: float = 0.0,
                                 arc_segments: int = 0,
                                 tile_size: float | None = None,
                                 tile_shapes: int = 2_000,
                                 component_cap: int = 500_000) -> DataFrame:
    """Tiled buffered-union enclosure build (module docstring).

    ``rects``: (bx0, by0, bx1, by1) buffered building rectangles (pre-
    merged aligned runs) — building-scale, NEVER gathered.  ``capsules``:
    barrier-buffer quads or arc polygons (street-scale, from
    ``buffered_union_shapes``).  ``barrier_segs``: (m, 4) street segments.
    ``arc_segments=k>0`` (with ``buffer``) replaces each rect by its
    round-join arc polygon (``tessellation.arc_rounded_rect`` built
    JVM-side from the rect columns) — round-buffer parity mode.

    Returns an enclosure ring DataFrame (eid, ring, seq, x, y) with eids in
    the driver pass's (minx, miny, area) order; ring 0 is the exterior.
    """
    spark = rects.sparkSession
    bb = rects.agg(F.min("bx0"), F.min("by0"),
                   F.max("bx1"), F.max("by1")).head()
    xs = [float(bb[0]), float(bb[2])]
    ys = [float(bb[1]), float(bb[3])]
    for sh in capsules:
        xs += [float(sh[:, 0].min()), float(sh[:, 0].max())]
        ys += [float(sh[:, 1].min()), float(sh[:, 1].max())]
    if len(barrier_segs):
        xs += [float(barrier_segs[:, [0, 2]].min()),
               float(barrier_segs[:, [0, 2]].max())]
        ys += [float(barrier_segs[:, [1, 3]].min()),
               float(barrier_segs[:, [1, 3]].max())]
    x0g, x1g = min(xs), max(xs)
    y0g, y1g = min(ys), max(ys)
    scale = max(1.0, abs(x0g), abs(x1g), abs(y0g), abs(y1g))
    n_shapes = rects.count() + len(capsules)
    w, h = max(x1g - x0g, 1e-9), max(y1g - y0g, 1e-9)
    if tile_size is None:
        tile_size = max(math.sqrt(w * h * tile_shapes / max(n_shapes, 1)),
                        (x1g - x0g) / 1024.0, (y1g - y0g) / 1024.0, 1e-9)
    ts = float(tile_size)
    # irrational-ish grid offset: axis-aligned input edges must not
    # coincide with tile borders (collinear-overlap is the one documented
    # arrangement degeneracy)
    ox = x0g - 0.2376884512 * ts
    oy = y0g - 0.1437291758 * ts
    pad = 2e-9 * scale

    # ---- shape stream: (vs flat ring coords) exploded to covered tiles
    def tiles_for_box(df, xmin, ymin, xmax, ymax):
        cx0 = (F.floor((xmin - F.lit(ox) - F.lit(pad)) / F.lit(ts))
               + F.lit(CELL_OFFSET)).cast("long")
        cx1 = (F.floor((xmax - F.lit(ox) + F.lit(pad)) / F.lit(ts))
               + F.lit(CELL_OFFSET)).cast("long")
        cy0 = (F.floor((ymin - F.lit(oy) - F.lit(pad)) / F.lit(ts))
               + F.lit(CELL_OFFSET)).cast("long")
        cy1 = (F.floor((ymax - F.lit(oy) + F.lit(pad)) / F.lit(ts))
               + F.lit(CELL_OFFSET)).cast("long")
        df = (df.withColumn("_tcx", F.explode(F.sequence(cx0, cx1)))
              .withColumn("_tcy", F.explode(F.sequence(cy0, cy1))))
        return df.withColumn("tile", pack_cell(F.col("_tcx"), F.col("_tcy"))) \
                 .drop("_tcx", "_tcy")

    if arc_segments > 0 and buffer > 0.0:
        # round-join rect: corner arcs sampled at fixed angles, corner
        # centers are the UNBUFFERED rect corners (bx* are pre-buffered);
        # bbox is unchanged (arcs attain the extremes at edge midpoints)
        b, k = float(buffer), int(arc_segments)
        x0u, y0u = F.col("bx0") + b, F.col("by0") + b
        x1u, y1u = F.col("bx1") - b, F.col("by1") - b
        corners = [(x1u, y0u, -0.5 * math.pi), (x1u, y1u, 0.0),
                   (x0u, y1u, 0.5 * math.pi), (x0u, y0u, math.pi)]
        coords = []
        for cx, cy, a0 in corners:
            for i in range(k + 1):
                a = a0 + 0.5 * math.pi * i / k
                coords += [cx + b * math.cos(a), cy + b * math.sin(a)]
        rect_vs = rects.select(
            F.array(*coords).cast("array<double>").alias("vs"),
            "bx0", "by0", "bx1", "by1")
    else:
        rect_vs = rects.select(
            F.array("bx0", "by0", "bx1", "by0", "bx1", "by1", "bx0", "by1")
            .cast("array<double>").alias("vs"),
            "bx0", "by0", "bx1", "by1")
    shapes_t = tiles_for_box(rect_vs, F.col("bx0"), F.col("by0"),
                             F.col("bx1"), F.col("by1")).select("tile", "vs")
    if capsules:
        cap_rows = [([float(v) for v in sh.reshape(-1)],
                     float(sh[:, 0].min()), float(sh[:, 1].min()),
                     float(sh[:, 0].max()), float(sh[:, 1].max()))
                    for sh in capsules]
        caps_df = spark.createDataFrame(
            cap_rows, "vs array<double>, x0 double, y0 double, "
                      "x1 double, y1 double")
        shapes_t = shapes_t.unionByName(
            tiles_for_box(caps_df, F.col("x0"), F.col("y0"),
                          F.col("x1"), F.col("y1")).select("tile", "vs"))

    # ---- edge stream: shape boundary edges + barrier segments, UNCLIPPED
    def ring_edges(df):
        # generic over ring length (mitered quads and arc polygons alike):
        # edge i joins point i to point (i+1) mod n, n = |vs|/2
        n = (F.size("vs") / F.lit(2)).cast("int")
        idx = F.sequence(F.lit(0), n - F.lit(1))
        segs = F.transform(idx, lambda i: F.struct(
            F.get("vs", 2 * i).alias("ex1"),
            F.get("vs", 2 * i + 1).alias("ey1"),
            F.get("vs", 2 * ((i + 1) % n)).alias("ex2"),
            F.get("vs", 2 * ((i + 1) % n) + 1).alias("ey2")))
        return (df.select(F.explode(segs).alias("e"))
                .select(F.lit(1).alias("etype"), "e.ex1", "e.ey1",
                        "e.ex2", "e.ey2"))

    edges = ring_edges(rect_vs.select("vs"))
    if capsules:
        edges = edges.unionByName(ring_edges(caps_df.select("vs")))
    if len(barrier_segs):
        bseg_df = spark.createDataFrame(
            [(float(s[0]), float(s[1]), float(s[2]), float(s[3]))
             for s in barrier_segs],
            "ex1 double, ey1 double, ex2 double, ey2 double") \
            .select(F.lit(0).alias("etype"), "ex1", "ey1", "ex2", "ey2")
        edges = edges.unionByName(bseg_df)
    edges_t = tiles_for_box(
        edges, F.least("ex1", "ex2"), F.least("ey1", "ey2"),
        F.greatest("ex1", "ex2"), F.greatest("ey1", "ey2"))

    task = _tile_task_builder(ox, oy, ts, scale)
    pieces = (edges_t.groupBy("tile")
              .cogroup(shapes_t.groupBy("tile"))
              .applyInPandas(task, _PIECE_SCHEMA)
              .localCheckpoint())

    node = (F.col("tile") * F.lit(COMP_SHIFT) + F.col("comp")).cast("long")
    ring_rows = pieces.where(F.col("kind") == 0) \
        .select(node.alias("node"), "ring", "seq", "x", "y")
    border = pieces.where(F.col("kind") == 1) \
        .select("k1", "k2", "k3", "k4", node.alias("node")).dropDuplicates()

    kmin = border.groupBy("k1", "k2", "k3", "k4") \
        .agg(F.min("node").alias("root"), F.count("*").alias("_n"))
    links = (border.join(kmin, ["k1", "k2", "k3", "k4"])
             .where((F.col("_n") > 1) & (F.col("node") != F.col("root")))
             .select(F.col("node").alias("src"), F.col("root").alias("dst"))
             .dropDuplicates())

    from .topology import connected_components
    nodes = ring_rows.select("node").dropDuplicates()
    labels = connected_components(links, nodes, src="src", dst="dst")
    labeled = ring_rows.join(labels, "node")

    big = (labeled.groupBy("component").count()
           .where(F.col("count") > component_cap).limit(1).collect())
    if big:
        raise ValueError(
            f"enclosure component {big[0]['component']} has "
            f"{big[0]['count']} ring rows (> component_cap="
            f"{component_cap}) — a barrier-free mega-blob; add barriers, "
            f"pass an explicit limit, or raise component_cap")

    eps = 16.0 * 1e-12 * scale * ts

    def merge(key, pdf):
        import pandas as pd

        from ..geo.voronoi import dissolve_cells
        rings = []
        for (nid, rid), grp in pdf.groupby(["node", "ring"], sort=True):
            g2 = grp.sort_values("seq")
            rings.append(np.column_stack([g2["x"].to_numpy(),
                                          g2["y"].to_numpy()]))
        rl = dissolve_cells(rings, np.zeros(len(rings), dtype=np.int64)) \
            .get(0, [])
        rl = [_strip_collinear(r, eps) for r in rl if len(r) >= 3]
        rl = [r for r in rl if len(r) >= 3]
        if not rl:
            return pd.DataFrame(columns=["component", "ring", "seq",
                                         "x", "y", "minx", "miny", "area"])
        # EXTERIOR FIRST: dissolve returns rings in arbitrary order, and
        # every consumer (area sign, Voronoi subject vs holes) reads ring
        # 0 as the exterior — which, for one connected face, is the ring
        # of maximum |area| (it strictly contains every hole)
        if len(rl) > 1:
            absa = [abs(0.5 * float(np.sum(
                r[:, 0] * np.roll(r[:, 1], -1)
                - np.roll(r[:, 0], -1) * r[:, 1]))) for r in rl]
            ei = int(np.argmax(absa))
            rl = [rl[ei]] + rl[:ei] + rl[ei + 1:]
        ext = rl[0]
        x, y = ext[:, 0], ext[:, 1]
        area = 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        rows = []
        for ri, ring in enumerate(rl):
            for i, (px, py) in enumerate(ring):
                rows.append((int(key[0]), ri, i, float(px), float(py),
                             float(x.min()), float(y.min()), area))
        return pd.DataFrame(rows, columns=["component", "ring", "seq",
                                           "x", "y", "minx", "miny", "area"])

    merged = labeled.groupBy("component").applyInPandas(
        merge, "component long, ring int, seq int, x double, y double, "
               "minx double, miny double, area double").localCheckpoint()

    meta = merged.select("component", "minx", "miny", "area").dropDuplicates()
    # Deterministic (minx, miny, area) rank WITHOUT a global single-task
    # window: range-partition the (narrow, one-row-per-enclosure) meta
    # table on the sort key, rank inside each partition in parallel, and
    # add the cumulative count of the lower partitions (a tiny per-
    # partition count list collected and broadcast as literals).  Equal
    # keys land in one range partition, so the rank equals the old global
    # row_number for every distinct key.
    npart = max(int(meta.sparkSession.sparkContext.defaultParallelism), 1)
    ranged = meta.repartitionByRange(npart, "minx", "miny", "area") \
        .withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint()  # pin partitioning for both reads
    sizes = {r["_pid"]: r["c"] for r in
             ranged.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offs, acc = {}, 0
    for pid in sorted(sizes):
        offs[pid] = acc
        acc += sizes[pid]
    off_col = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offs)]),
            F.array(*[F.lit(offs[p]) for p in sorted(offs)])),
        F.col("_pid")) if offs else F.lit(0)
    wlocal = Window.partitionBy("_pid").orderBy("minx", "miny", "area")
    eids = ranged.withColumn(
        "eid", F.row_number().over(wlocal) - 1 + off_col) \
        .select("component", "eid")
    return (merged.join(eids, "component")
            .select("eid", F.col("ring").cast("long").alias("ring"),
                    F.col("seq").cast("long").alias("seq"), "x", "y"))
