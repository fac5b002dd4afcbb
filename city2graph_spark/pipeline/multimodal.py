"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, cell/bucket partitioning, Arrow batch
shapes, UDF signatures — is real and tested; the actual codec step is a
clearly-marked deterministic STUB (this container ships no PIL/libav): it
derives pseudo pixel/sample statistics from the payload bytes, so pipelines
exercising decode → feature-extract → resize/frame-sample run end-to-end
with stable, assertable outputs.  Swapping in a real codec is a one-function
change (``_decode_stub``).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media_ref string, media_type string, "
                "payload binary, width int, height int, duration_ms int")


def synth_media(docs_spans: DataFrame) -> DataFrame:
    """Deterministic media table from the spans docs' media_refs: payload
    bytes, dimensions and duration are all hash-derived from the ref."""
    refs = (docs_spans.select("doc_id", F.explode("spans").alias("s"))
            .where(F.col("s.media_ref").isNotNull())
            .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                    F.col("s.kind").alias("media_type")))

    def build(it):
        import pandas as pd
        for pdf in it:
            if len(pdf) == 0:
                continue
            payloads, widths, heights, durs = [], [], [], []
            for ref in pdf["media_ref"]:
                h = hashlib.sha256(ref.encode()).digest()
                payloads.append(h * 8)  # 256-byte deterministic blob
                widths.append(64 + h[0] % 192)
                heights.append(64 + h[1] % 192)
                durs.append(1000 + int.from_bytes(h[2:4], "big") % 30000)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                "media_type": pdf["media_type"], "payload": payloads,
                "width": widths, "height": heights, "duration_ms": durs})

    return refs.mapInPandas(build, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, width: int, height: int):
    """STUB decode: a real deployment replaces this with PIL/libav.  Returns
    deterministic channel means derived from the payload bytes (hashed via
    their hex rendering so the DuckDB gate oracle — whose sha256 only takes
    VARCHAR — can replicate the value byte-for-byte).  Raises the documented
    NotImplementedError when asked for real pixels."""
    import numpy as np
    h = hashlib.sha256(payload.hex().encode()).digest()
    return np.frombuffer(h[:12], dtype=np.uint8).reshape(3, 4).mean(axis=1)


def decode_features(media: DataFrame) -> DataFrame:
    """decode → feature-extract: per media row, channel-mean features +
    aspect ratio.  One vectorized pandas pass per Arrow batch; payloads
    never leave the executor."""
    def feats(it):
        import numpy as np
        import pandas as pd
        for pdf in it:
            if len(pdf) == 0:
                continue
            ch = np.array([_decode_stub(p, w, h) for p, w, h in
                           zip(pdf["payload"], pdf["width"], pdf["height"])])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                "ch_r": ch[:, 0], "ch_g": ch[:, 1], "ch_b": ch[:, 2],
                "aspect": pdf["width"].to_numpy() / pdf["height"].to_numpy()})

    return media.mapInPandas(
        feats, "doc_id long, media_ref string, ch_r double, ch_g double, "
               "ch_b double, aspect double")


def frame_sample(media: DataFrame, *, every_ms: int = 5000) -> DataFrame:
    """frame-sample plumbing: one output row per sampled timestamp (the
    decode of the actual frame is the same stub).  JVM-side explode — the
    fan-out never touches Python."""
    n = (F.col("duration_ms") / F.lit(every_ms)).cast("int") + 1
    return (media
            .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n - 1)))
            .withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms))
            .select("doc_id", "media_ref", "frame_idx", "ts_ms"))


def resize_meta(media: DataFrame, *, max_side: int) -> DataFrame:
    """resize plumbing: target dimensions preserving aspect, pure column
    math (the pixel op itself is the stub's job)."""
    scale = F.least(F.lit(1.0),
                    F.lit(float(max_side)) / F.greatest("width", "height"))
    return media.select(
        "doc_id", "media_ref",
        F.round(F.col("width") * scale).cast("int").alias("new_width"),
        F.round(F.col("height") * scale).cast("int").alias("new_height"))
