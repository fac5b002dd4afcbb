"""Interleaved A/B measurement for the VERDICT r3 bench regressions.

Round 3 measured minhash_lsh 6.96s→8.17s (the round that rewrote its kernel
to the fused mapInPandas) and gabriel_graph 2.71s→3.78s (kernel untouched)
on a host with documented ±40% neighbor noise.  This tool settles it with
interleaved repeated measurements in ONE session (warm worker pool, same
input, alternating variants so host drift hits both arms equally):

    python tools/ab_bench.py [reps]        # default 5

Prints per-rep times and medians for
  - minhash fused (`minhash_signatures`, the r3 mapInPandas kernel)
  - minhash agg   (`minhash_signatures_agg`, the r2 xxhash64 groupBy twin)
  - gabriel bounded kernel (unchanged since r2)
both timed through the full LSH pair join / edge count respectively.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import functions as F

    from city2graph_spark.io.points import expanded_points
    from city2graph_spark.operators.proximity import gabriel_graph
    from city2graph_spark.pipeline.dedup import (
        minhash_signatures, minhash_signatures_agg)
    from city2graph_spark.session import get_spark

    spark = get_spark("ab_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=str(max(CPUS, 16)))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()
    pts = expanded_points(spark, SF_DIR, 40).cache()
    n_pts = pts.count()
    spacing = 5000.0 / max(n_pts, 1) ** 0.5
    # warm the python worker pool (memory: cold pool costs 10-15s at local[32])
    docs.mapInPandas(lambda it: it, docs.schema).count()

    def lsh_pairs_from(sig_fn):
        mh = sig_fn(docs)
        bands = (mh.select("doc_id", F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.slice("sig", b * 2 + 1, 2).alias("sig"))
            for b in range(4)])).alias("_b"))
            .select("doc_id", F.col("_b.band").alias("band"),
                    F.col("_b.sig").alias("sig")))
        a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        b = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
        return (a.join(b, ["band", "sig"])
                .where(F.col("doc_a") < F.col("doc_b"))
                .select("doc_a", "doc_b").dropDuplicates())

    from city2graph_spark.operators.proximity import relative_neighborhood_graph
    arms = {
        "minhash_fused": lambda: lsh_pairs_from(minhash_signatures).count(),
        "minhash_agg": lambda: lsh_pairs_from(minhash_signatures_agg).count(),
        "gabriel": lambda: gabriel_graph(pts, r_cand=6.0 * spacing).count(),
        # round 5: RNG shares the float32-banded GEMM path — its time
        # should sit within noise of gabriel's (same traffic + 2 extra f32
        # lune matrices)
        "rng": lambda: relative_neighborhood_graph(
            pts, r_cand=6.0 * spacing).count(),
    }
    times: dict[str, list[float]] = {k: [] for k in arms}
    for rep in range(reps):
        for name, fn in arms.items():
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 3))
    out = {name: {"runs": ts, "median": round(statistics.median(ts), 3),
                  "min": min(ts)}
           for name, ts in times.items()}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
