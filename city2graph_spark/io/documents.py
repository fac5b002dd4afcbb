"""The engine's authoritative input layer: interleaved text+media documents.

Schema (BASELINE.json ``input_hint``)::

    documents(doc_id: string|long,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Geometry payloads ride in spans with ``kind='geometry'`` and WKT in
``text``.  Per-row invariant vs any transformation that claims to preserve
documents: span-sequence equality (kind, text, media_ref, order).

This module (a) synthesises a deterministic spans table from any base table
carrying a ``doc_id`` (the driver's flat documents.parquet — no external
data), (b) extracts geometry points from spans with the vectorized WKT
codec, and (c) checks the span-sequence invariant as a DataFrame predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io.points import X_SQL_T, Y_SQL_T

SPANS_SCHEMA = ("array<struct<kind:string,text:string,"
                "media_ref:string,offset:int>>")


def synth_spans(docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str | None = "text") -> DataFrame:
    """Deterministically wrap a flat table into the interleaved spans shape.

    Every doc gets: a text span (from ``text_col`` or a generated token), a
    geometry span whose WKT POINT encodes the doc's LCG coordinates, and —
    for every third doc — a media span with a media_ref.  Spans are built
    with pandas inside mapInPandas (float repr for exact WKT round-trip),
    offsets strictly increasing.
    """
    x_sql, y_sql = X_SQL_T.format(id=id_col), Y_SQL_T.format(id=id_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(text_col) if text_col and text_col in docs.columns
         else F.concat(F.lit("doc-"), F.col(id_col))).alias("_text"),
        F.expr(x_sql).alias("_x"), F.expr(y_sql).alias("_y"))

    def build(it):
        import pandas as pd
        from ..geo.wkt import fmt_point
        for pdf in it:
            if len(pdf) == 0:
                continue
            spans = []
            for did, txt, x, y in zip(pdf["doc_id"], pdf["_text"],
                                      pdf["_x"], pdf["_y"]):
                row = [{"kind": "text", "text": txt, "media_ref": None,
                        "offset": 0},
                       {"kind": "geometry", "text": fmt_point(x, y),
                        "media_ref": None, "offset": 1}]
                if did % 3 == 0:
                    row.append({"kind": "image", "text": None,
                                "media_ref": f"media://img/{did}.jpg",
                                "offset": 2})
                spans.append(row)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "spans": spans})

    return base.mapInPandas(build, f"doc_id long, spans {SPANS_SCHEMA}")


def extract_points(docs_spans: DataFrame) -> DataFrame:
    """(doc_id, x, y) from every ``kind='geometry'`` POINT span.

    Explodes spans (JVM-side), filters to geometry WKT, then parses in one
    vectorized pandas pass — no per-row Python.
    """
    geo = (docs_spans
           .select("doc_id", F.explode("spans").alias("s"))
           .where(F.col("s.kind") == "geometry")
           .select("doc_id", F.col("s.text").alias("wkt"))
           .where(F.col("wkt").startswith("POINT")))

    def parse(it):
        import pandas as pd
        from ..geo.wkt import parse_points
        for pdf in it:
            if len(pdf) == 0:
                continue
            xy = parse_points(pdf["wkt"])
            yield pd.DataFrame({"node_id": pdf["doc_id"].to_numpy(),
                                "x": xy["x"].to_numpy(),
                                "y": xy["y"].to_numpy()})

    return geo.mapInPandas(parse, "node_id long, x double, y double")


def span_invariant_violations(before: DataFrame, after: DataFrame) -> DataFrame:
    """Rows of ``after`` whose span sequence (kind, text, media_ref, order)
    differs from ``before`` — the north-rule per-row invariant.  Offsets are
    excluded from the comparison on purpose: order is positional.
    """
    key = F.transform("spans", lambda s: F.struct(
        s["kind"].alias("kind"), s["text"].alias("text"),
        s["media_ref"].alias("media_ref")))
    b = before.select("doc_id", key.alias("_sig_b"))
    a = after.select("doc_id", key.alias("_sig_a"))
    return (a.join(b, "doc_id", "left")
             .where(F.col("_sig_b").isNull()
                    | (F.col("_sig_a") != F.col("_sig_b")))
             .select("doc_id"))
