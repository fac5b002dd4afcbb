"""Vectorized WKT codec — pure pandas/numpy (the sandbox has no shapely).

Supports POINT / LINESTRING / POLYGON (exterior ring; holes parsed and
preserved as extra rings).  Parsing uses pandas vectorized string ops plus
one explode for multi-vertex geometries; formatting uses Python float repr
(shortest round-trip) so parse(format(x)) == x bit-for-bit — the property
the span-sequence invariant and the value-hash gate rely on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TYPE_RE = r"^\s*([A-Za-z]+)\s*"


def fmt_point(x: float, y: float) -> str:
    # builtin-float repr: numpy>=2 reprs np.float64 as 'np.float64(…)',
    # which would break the shortest-round-trip property the invariant needs
    return f"POINT ({float(x)!r} {float(y)!r})"


def fmt_linestring(coords) -> str:
    body = ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in coords)
    return f"LINESTRING ({body})"


def fmt_polygon(rings) -> str:
    parts = []
    for ring in rings:
        body = ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in ring)
        parts.append(f"({body})")
    return f"POLYGON ({', '.join(parts)})"


def parse_points(s: pd.Series) -> pd.DataFrame:
    """Vectorized POINT parser: Series[str] → DataFrame(x, y) float64."""
    ex = s.str.extract(r"POINT\s*\(\s*(\S+)\s+([^\s)]+)\s*\)")
    return pd.DataFrame({"x": ex[0].astype(np.float64),
                         "y": ex[1].astype(np.float64)})


def geom_type(s: pd.Series) -> pd.Series:
    return s.str.extract(_TYPE_RE)[0].str.upper()


def parse_vertices(s: pd.Series) -> pd.DataFrame:
    """Vectorized multi-vertex parser for LINESTRING/POLYGON.

    Returns one row per vertex: (row, ring, seq, x, y) where ``row`` indexes
    the input Series positionally and ``ring`` is 0 for LINESTRING /
    polygon exterior, 1+ for holes.
    """
    body = s.str.replace(r"^[A-Za-z]+\s*\(", "", regex=True) \
            .str.replace(r"\)\s*$", "", regex=True)
    rings = body.str.split(r"\)\s*,\s*\(", regex=True)
    df = pd.DataFrame({"row": np.arange(len(s)), "ring_txt": rings}).explode("ring_txt")
    df["ring"] = df.groupby("row").cumcount()
    df["ring_txt"] = df["ring_txt"].str.strip().str.strip("()")
    verts = df["ring_txt"].str.split(",")
    df = df.drop(columns=["ring_txt"]).assign(pt=verts).explode("pt")
    df["seq"] = df.groupby(["row", "ring"]).cumcount()
    xy = df["pt"].str.strip().str.split(r"\s+", regex=True, expand=True)
    df["x"] = xy[0].astype(np.float64)
    df["y"] = xy[1].astype(np.float64)
    return df[["row", "ring", "seq", "x", "y"]].reset_index(drop=True)
