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


def _mh_mix_constants(n_hashes: int) -> list[tuple[int, ...]]:
    """Per-seed mix constants from one SplitMix64 stream — all 5·n values
    distinct and odd (independent hash functions; a shared-constant table
    correlates minima across seeds and inflates band collisions ~1.5× —
    measured on sf0.1)."""
    M = (1 << 64) - 1
    x = 0x243F6A8885A308D3  # pi
    out = []
    for _ in range(n_hashes):
        row = []
        for _ in range(5):
            x = (x + 0x9E3779B97F4A7C15) & M
            z = x
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
            z ^= z >> 31
            row.append(z | 1)
        out.append(tuple(row))
    return out


_MH_MIX = _mh_mix_constants(8)


def minhash_signatures(docs: DataFrame, *, n_hashes: int = 8,
                       shingle_n: int = 4, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<long>): all ``n_hashes`` minima per doc in ONE
    fused mapInPandas pass — no shingle explode (the xxhash64 aggregate
    variant still shuffled nothing but paid len(text) JVM rows/doc into the
    hash aggregate; this kernel never materialises shingles at all).

    Per Arrow batch: code points of every doc concatenate into one array,
    4-gram windows become 4 strided uint64 lanes, each of ``n_hashes``
    seeds applies a linear mix + SplitMix64 finalizer (universal hash +
    strong mixer), and per-doc minima come from one
    ``np.minimum.reduceat`` — min over the window multiset equals min over
    the shingle SET, so deduplication is unnecessary.  Output rows = one
    per doc; the downstream band join is unchanged.  The groupBy-aggregate
    twin survives as :func:`minhash_signatures_agg` (plan comparison), the
    md5 twin as the gate oracle."""
    if n_hashes > len(_MH_MIX):
        raise ValueError(f"n_hashes <= {len(_MH_MIX)}")
    n = int(shingle_n)
    mix = _MH_MIX[:n_hashes]

    def batches(it):
        import numpy as np
        import pandas as pd
        mask = np.uint64(0xFFFFFFFFFFFFFFFF)
        c30, c27, c31 = np.uint64(30), np.uint64(27), np.uint64(31)
        f1 = np.uint64(0xBF58476D1CE4E5B9)
        f2 = np.uint64(0x94D049BB133111EB)
        for pdf in it:
            if len(pdf) == 0:
                continue
            texts = pdf[text_col].astype(str).tolist()
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            nwin = np.maximum(lens - (n - 1), 1)
            total = int(nwin.sum())
            buf = "".join(texts)
            cp = np.frombuffer(buf.encode("utf-32-le"), dtype=np.uint32) \
                .astype(np.uint64)
            doc_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
            win_off = np.concatenate([[0], np.cumsum(nwin)[:-1]])
            # start index (into cp) of every window, all docs at once
            starts = np.repeat(doc_off, nwin) \
                + (np.arange(total) - np.repeat(win_off, nwin))
            lanes = []
            cap = len(cp)
            for k in range(n):
                idx = starts + k
                # short docs: window may run past the doc (and, for the
                # last doc, past the buffer) — clamp and zero the overrun,
                # mirroring substr()'s truncated final shingle
                over = idx >= np.repeat(doc_off + lens, nwin)
                lane = cp[np.minimum(idx, cap - 1)]
                lane[over] = 0
                lanes.append(lane)
            sig = np.empty((len(pdf), n_hashes), dtype=np.uint64)
            red = win_off  # reduceat segment starts
            for j, (a, b, c, d, e) in enumerate(mix):
                h = (np.uint64(a) * lanes[0] + np.uint64(b) * lanes[1]
                     + np.uint64(c) * lanes[2 % n] + np.uint64(d) * lanes[3 % n]
                     + np.uint64(e)) & mask
                h ^= h >> c30
                h = (h * f1) & mask
                h ^= h >> c27
                h = (h * f2) & mask
                h ^= h >> c31
                sig[:, j] = np.minimum.reduceat(h, red)
            out = pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "sig": [row.astype(np.int64).tolist() for row in sig]})
            yield out

    return docs.select(id_col, text_col) \
        .mapInPandas(batches, f"{id_col} long, sig array<long>")


def minhash_signatures_agg(docs: DataFrame, *, n_hashes: int = 8,
                           shingle_n: int = 4) -> DataFrame:
    """xxhash64 one-pass groupBy variant (round-2 fast path, kept for plan
    comparison): n min-aggregates over seeded xxhash64, map-side partial
    aggregation ⇒ shuffle one row per doc."""
    sh = shingles(docs, n=shingle_n)
    mins = [F.min(F.xxhash64(F.col("shingle"), F.lit(j))).alias(f"_h{j}")
            for j in range(n_hashes)]
    wide = sh.groupBy("doc_id").agg(*mins)
    return wide.select(
        "doc_id",
        F.array(*[F.col(f"_h{j}") for j in range(n_hashes)]).alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, *, n_hashes: int = 8, band_rows: int = 2,
                      shingle_n: int = 4) -> DataFrame:
    """LSH candidate pairs: docs sharing any full band of minhashes.
    Banded bucket equi-join — never all-pairs.

    Plan shape: both band sides shuffle on (band, bsig) — the forced
    sort-merge join makes the two exchange subtrees canonically identical,
    so the signature kernel runs ONCE and the second side is a
    ReusedExchange (the planner's broadcast pick evaluated the mapInPandas
    subtree twice, and a broadcast build side can never be the right call
    for a self-join whose sides are by construction the same size).  Each
    pair is emitted exactly once, from its FIRST colliding band — both full
    signatures ride through the join and a codegen filter keeps the band
    row only when every earlier band's slices differ — which replaces the
    output-sized dropDuplicates exchange+aggregate with a filter.  SMJ on
    the band key also keeps AQE's skew-join split available for hot buckets
    (near-identical corpora)."""
    mh = minhash_signatures(docs, n_hashes=n_hashes, shingle_n=shingle_n)
    n_bands = n_hashes // band_rows
    bands = (mh.select("doc_id", "sig", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.slice("sig", b * band_rows + 1, band_rows).alias("bsig"))
        for b in range(n_bands)])).alias("_b"))
        .select("doc_id", "sig", F.col("_b.band").alias("band"),
                F.col("_b.bsig").alias("bsig")))
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("sig").alias("_siga"), "band", "bsig").hint("merge")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("sig").alias("_sigb"), "band", "bsig")
    first_eq = F.array_position(F.array(*[
        (F.slice("_siga", bb * band_rows + 1, band_rows)
         == F.slice("_sigb", bb * band_rows + 1, band_rows)).cast("int")
        for bb in range(n_bands)]), 1)
    return (a.join(b, ["band", "bsig"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .where(first_eq == F.col("band") + 1)
            .select("doc_a", "doc_b"))


def minhash_signatures_md5(docs: DataFrame, *, n_hashes: int = 8,
                           shingle_n: int = 4) -> DataFrame:
    """(doc_id, j, h): md5 twin of ``minhash_signatures`` — the engine-
    portable hash used by the DuckDB gate oracle (gate.sql_minhash_lsh)."""
    sh = shingles(docs, n=shingle_n)
    js = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1)))
    return (sh.withColumn("j", js)
            .withColumn("_h", _md5int(F.concat_ws("_", F.col("j"), F.col("shingle"))))
            .groupBy("doc_id", "j").agg(F.min("_h").alias("h")))


def minhash_lsh_pairs_md5(docs: DataFrame, *, n_hashes: int = 8,
                          band_rows: int = 2, shingle_n: int = 4) -> DataFrame:
    """md5 twin of ``minhash_lsh_pairs`` (row-identical to the gate SQL)."""
    mh = minhash_signatures_md5(docs, n_hashes=n_hashes, shingle_n=shingle_n)
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
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming`` via
    pigeonhole banding: the hash splits into ``max_hamming+1`` bit bands, and
    any pair within the hamming budget must agree EXACTLY on ≥1 band — so
    candidates come from a (band, band_bits) bucket equi-join, verified by
    one exact bit_count.  Never an all-pairs join; at 100 TB the bucket join
    shuffles one row per (doc, band)."""
    sh = simhash(docs, bits=bits)
    nb = int(max_hamming) + 1
    w = -(-bits // nb)
    band_structs = []
    for b in range(nb):
        lo = b * w
        width = min(w, bits - lo)
        if width <= 0:
            break
        band_structs.append(F.struct(
            F.lit(b).alias("band"),
            F.expr(f"shiftright(simhash, {lo}) & {(1 << width) - 1}")
             .alias("bits")))
    bd = (sh.select("doc_id", "simhash",
                    F.explode(F.array(*band_structs)).alias("_b"))
          .select("doc_id", "simhash", F.col("_b.band").alias("band"),
                  F.col("_b.bits").alias("bits")))
    # Same plan shape as minhash_lsh_pairs: forced sort-merge self-join so
    # the simhash subtree computes once (exchange reuse), and each pair is
    # kept only in its FIRST colliding bit-band (both full hashes ride the
    # join) — replaces the output-sized dropDuplicates exchange with a
    # codegen filter.
    a = bd.select(F.col("doc_id").alias("doc_a"),
                  F.col("simhash").alias("ha"), "band", "bits").hint("merge")
    b2 = bd.select(F.col("doc_id").alias("doc_b"),
                   F.col("simhash").alias("hb"), "band", "bits")
    eqs = []
    for b in range(nb):
        lo = b * w
        width = min(w, bits - lo)
        if width <= 0:
            break
        mask = (1 << width) - 1
        eqs.append(((F.expr(f"shiftright(ha, {lo}) & {mask}")
                     == F.expr(f"shiftright(hb, {lo}) & {mask}"))
                    ).cast("int"))
    first_eq = F.array_position(F.array(*eqs), 1)
    cand = (a.join(b2, ["band", "bits"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .where(first_eq == F.col("band") + 1)
            .select("doc_a", "doc_b", "ha", "hb"))
    return (cand
            .withColumn("hamming",
                        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def ngram_jaccard_pairs(docs: DataFrame, *, n: int = 4,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = 100) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ threshold (shingle equi-join —
    never a cross join).

    ``max_shingle_df`` is the standard stopword-shingle skew guard: a
    shingle appearing in more than that many documents is dropped from the
    shingle sets entirely (both intersection and union) BEFORE the
    self-join, capping the worst hot-key fan-out at max_shingle_df² rows
    instead of n_docs².  Hot shingles carry no near-dup signal (they match
    everything), so at a corpus scale this is the difference between a
    bounded join and a quadratic one.  The default (100, matching the gate
    dialects) is the safe production posture; pass None for the exact
    uncapped join on small corpora."""
    sh = shingles(docs, n=n)
    if max_shingle_df is not None:
        rare = (sh.groupBy("shingle").agg(F.count("*").alias("_df"))
                .where(F.col("_df") <= int(max_shingle_df))
                .select("shingle"))
        sh = sh.join(rare, "shingle", "left_semi")
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
