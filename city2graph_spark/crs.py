"""CRS as first-class metadata (reference
/root/reference/city2graph/proximity.py:216-222 ``_validate_gdf`` CRS
equality check, ``base.py:828`` geographic-CRS warning).

GeoDataFrames carry a CRS object; Spark DataFrames don't, so the engine
rides the CRS on COLUMN METADATA of the coordinate columns (schema-only —
attaching, reading, and validating never launch a job).  The engine itself
is projected-plane-only: euclidean/manhattan distances in coordinate units.
A geographic CRS (degrees) makes those distances wrong at first use, so
``ensure_same_crs`` warns on one, exactly like the reference.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRS_KEY = "c2g.crs"

_GEOGRAPHIC = ("4326", "4979", "wgs84", "wgs 84", "epsg:4326", "crs84")


def with_crs(df: DataFrame, crs: str, cols: tuple[str, ...] = ("x", "y")
             ) -> DataFrame:
    """Attach a CRS string to the coordinate columns' metadata."""
    out = df
    for c in cols:
        if c in out.columns:
            out = out.withColumn(c, F.col(c).alias(c, metadata={CRS_KEY: crs}))
    return out


def get_crs(df: DataFrame) -> str | None:
    """First CRS found in the schema's column metadata (None = untagged)."""
    for f in df.schema.fields:
        crs = f.metadata.get(CRS_KEY) if f.metadata else None
        if crs:
            return str(crs)
    return None


def is_geographic(crs: str | None) -> bool:
    return crs is not None and any(g in crs.lower() for g in _GEOGRAPHIC)


def ensure_same_crs(*dfs: DataFrame | None, warn_geo: bool = True
                    ) -> str | None:
    """Validate CRS equality across inputs (reference proximity.py:216-222).

    Untagged frames (None) pass silently — the sandbox default.  Two
    DIFFERENT explicit tags raise; a geographic CRS warns (the engine's
    metrics are planar).  Returns the common CRS, if any."""
    seen: str | None = None
    for df in dfs:
        if df is None:
            continue
        crs = get_crs(df)
        if crs is None:
            continue
        if seen is None:
            seen = crs
        elif crs != seen:
            raise ValueError(
                f"CRS mismatch between inputs: {seen!r} vs {crs!r} — "
                f"reproject to a common projected CRS first")
    if warn_geo and is_geographic(seen):
        warnings.warn(
            f"input CRS {seen!r} is geographic (degrees); euclidean/"
            f"manhattan metrics assume a projected plane — reproject "
            f"(e.g. to a UTM zone) for correct distances",
            UserWarning, stacklevel=2)
    return seen
