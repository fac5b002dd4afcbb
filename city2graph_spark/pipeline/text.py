"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

DataFrame-API twins of the gate's dual-dialect SQL (lang_id, quality_score,
token_count) plus a rolling-hash fingerprint.  Everything except the
fingerprint is pure column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "is")


def token_count(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", F.size(F.split(F.col(text_col), " "))
                       .cast("long").alias("n_tokens"))


def quality_scores(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Length / type-token-ratio / mean-token-length quality features."""
    toks = docs.select("doc_id",
                       F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    return (toks.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.countDistinct("tok").alias("n_distinct"),
                 F.avg(F.length("tok")).alias("avg_token_len"))
            .withColumn("ttr", F.col("n_distinct") / F.col("n_tokens")))


def lang_id(docs: DataFrame, *, text_col: str = "text",
            threshold: float = 0.08) -> DataFrame:
    """Stopword-ratio language heuristic (n-gram-free variant)."""
    toks = docs.select("doc_id",
                       F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("_nt"),
        F.sum(F.when(F.col("tok").isin(*STOPWORDS), 1).otherwise(0)).alias("_sw"))
    ratio = F.col("_sw") / F.col("_nt")
    return agg.select(
        "doc_id",
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other"))
         .alias("pred_lang"),
        ratio.alias("stopword_ratio"))


def doc_fingerprint(docs: DataFrame, *, text_col: str = "text",
                    kgram: int = 8, window: int = 4) -> DataFrame:
    """Winnowing fingerprint (rolling-hash document signature): hash every
    k-gram, slide a w-position window keeping each window's min hash, and
    reduce the selected hashes to one signature.  Pure column ops — the
    rolling hash is an md5 per position (JVM-side), the window min a frame
    window function.  Robust to small edits like the classic MOSS scheme."""
    from pyspark.sql import Window as W
    pos = F.explode(F.sequence(
        F.lit(1), F.greatest(F.length("_t") - (kgram - 1), F.lit(1))))
    grams = (docs.select("doc_id", F.col(text_col).alias("_t"))
             .withColumn("_pos", pos)
             .withColumn("_h", F.conv(F.substring(
                 F.md5(F.expr(f"substr(_t, _pos, {kgram})")), 1, 15), 16, 10)
                 .cast("long")))
    w = W.partitionBy("doc_id").orderBy("_pos").rowsBetween(-(window - 1), 0)
    picked = (grams.withColumn("_wmin", F.min("_h").over(w))
              .select("doc_id", "_wmin").dropDuplicates())
    return (picked.groupBy("doc_id")
            .agg(F.count("*").alias("n_fingerprints"),
                 F.sum(F.col("_wmin") % F.lit(1 << 32)).cast("long")
                 .alias("fingerprint")))
