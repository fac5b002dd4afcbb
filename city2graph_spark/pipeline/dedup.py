"""Deduplication operators for the training-data pipeline: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

DataFrame-API twins of the dual-dialect SQL in ``gate.py`` (the gate proves
engine-equivalence against DuckDB; these are the library surface).  Hashing
is md5-derived everywhere so results are deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5int(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one keeper (min id) per content hash.
    Returns (content_hash, keeper_id, n_copies)."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count("*").alias("n_copies")))


def shingles(docs: DataFrame, *, n: int = 4, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Distinct character n-gram shingles per doc — JVM-side explode."""
    pos = F.explode(F.sequence(
        F.lit(1), F.greatest(F.length("_t") - (n - 1), F.lit(1))))
    return (docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
            .withColumn("_pos", pos)
            .select("doc_id", F.expr(f"substr(_t, _pos, {n})").alias("shingle"))
            .dropDuplicates())


def minhash_signatures(docs: DataFrame, *, n_hashes: int = 8,
                       shingle_n: int = 4) -> DataFrame:
    """(doc_id, j, h): per-doc min of the j-seeded md5 hash over shingles."""
    sh = shingles(docs, n=shingle_n)
    js = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1)))
    return (sh.withColumn("j", js)
            .withColumn("_h", _md5int(F.concat_ws("_", F.col("j"), F.col("shingle"))))
            .groupBy("doc_id", "j").agg(F.min("_h").alias("h")))


def minhash_lsh_pairs(docs: DataFrame, *, n_hashes: int = 8, band_rows: int = 2,
                      shingle_n: int = 4) -> DataFrame:
    """LSH candidate pairs: docs sharing any full band of minhashes."""
    mh = minhash_signatures(docs, n_hashes=n_hashes, shingle_n=shingle_n)
    bands = (mh.withColumn("band", F.expr(f"j DIV {band_rows}"))
             .groupBy("doc_id", "band")
             .agg(F.sort_array(F.collect_list(F.struct("j", "h"))).alias("sig")))
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (a.join(b, ["band", "sig"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").dropDuplicates())


def simhash(docs: DataFrame, *, bits: int = 16, text_col: str = "text") -> DataFrame:
    """Per-doc SimHash over distinct-token md5 bits."""
    toks = (docs.select("doc_id", F.explode(F.split(F.col(text_col), " "))
                        .alias("tok"))
            .dropDuplicates()
            .withColumn("h", _md5int(F.col("tok"))))
    bidx = F.explode(F.sequence(F.lit(0), F.lit(bits - 1)))
    per_bit = (toks.withColumn("i", bidx)
               .withColumn("_v", F.when(
                   F.expr("shiftright(h, i) & 1") == 1,
                   F.lit(1)).otherwise(F.lit(-1)))
               .groupBy("doc_id", "i").agg(F.sum("_v").alias("s")))
    return (per_bit
            .withColumn("_bit", F.when(F.col("s") > 0,
                                       F.expr("shiftleft(CAST(1 AS BIGINT), i)"))
                        .otherwise(F.lit(0)))
            .groupBy("doc_id").agg(F.sum("_bit").cast("long").alias("simhash")))


def simhash_neardup_pairs(docs: DataFrame, *, bits: int = 16,
                          max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance (bucketless small-scale
    variant: self-join; the scale path buckets on bit-prefix bands)."""
    sh = simhash(docs, bits=bits)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (a.crossJoin(b)
            .where(F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def ngram_jaccard_pairs(docs: DataFrame, *, n: int = 4,
                        threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ threshold (shingle equi-join —
    never a cross join)."""
    sh = shingles(docs, n=n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (sh.alias("a").join(sh.alias("b"),
                                (F.col("a.shingle") == F.col("b.shingle"))
                                & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("ic")))
    out = (inter
           .join(sizes.select(F.col("doc_id").alias("doc_a"),
                              F.col("sz").alias("sa")), "doc_a")
           .join(sizes.select(F.col("doc_id").alias("doc_b"),
                              F.col("sz").alias("sb")), "doc_b")
           .withColumn("jaccard", F.col("ic")
                       / (F.col("sa") + F.col("sb") - F.col("ic"))))
    return out.where(F.col("jaccard") >= threshold) \
              .select("doc_a", "doc_b", "jaccard")
