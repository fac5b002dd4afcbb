#!/usr/bin/env python
"""spark-submit entry point (north rule: "run via spark-submit --py-files
on a multi-executor cluster"; SURVEY §7 ``cli.py``).

Package + submit::

    python tools/package.py                       # builds dist/city2graph_spark.zip
    spark-submit --py-files dist/city2graph_spark.zip cli.py \\
        --job knn_graph --sf-dir /root/testdata/sf0.01 \\
        --output /tmp/out --checkpoint /tmp/ckpt

``--job`` accepts any registered query name (the same registry the
correctness gate runs — ``__spark_entry__.queries()``), so every operator
the gate certifies is submittable as a production job.  With
``--checkpoint`` the job runs as a resumable snapshot stage: the result is
written with a manifest (row count, schema, per-partition counts,
wall-clock, lineage fingerprint) and a re-run with an existing valid
manifest skips the compute (``checkpoint.SnapshotCheckpoint`` — the
Iceberg-snapshot stand-in).  One JSON metrics line goes to stdout.

The session comes from ``SparkSession.builder.getOrCreate()`` so
spark-submit's ``--master``/``--conf`` take effect; running it with plain
``python`` falls back to the repo's local session defaults.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    from city2graph_spark import gate

    qs = gate.queries()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--job", required=True, choices=sorted(qs),
                    help="registered query/operator to run")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="input table directory (parquet per table)")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--checkpoint", default=None,
                    help="snapshot-checkpoint root (enables resume)")
    ap.add_argument("--version", default="1",
                    help="build-code tag for checkpoint invalidation")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName(f"c2g:{args.job}").getOrCreate()
    t0 = time.time()
    if args.checkpoint:
        from city2graph_spark.checkpoint import SnapshotCheckpoint
        ck = SnapshotCheckpoint(spark, args.checkpoint)
        resumed = ck.is_complete(args.job, [], args.version)
        df = ck.stage(args.job, lambda: qs[args.job](spark, args.sf_dir),
                      version=args.version)
        manifest = ck.manifest(args.job)
        df.write.mode("overwrite").parquet(args.output)
        rows = manifest["rows"]
        extra = {"resumed": resumed,
                 "fingerprint": manifest["fingerprint"],
                 "partitions": len(manifest["partitions"])}
    else:
        df = qs[args.job](spark, args.sf_dir)
        df.write.mode("overwrite").parquet(args.output)
        rows = spark.read.parquet(args.output).count()
        extra = {}
    print(json.dumps({"job": args.job, "rows": int(rows),
                      "elapsed_sec": round(time.time() - t0, 3),
                      "output": args.output, **extra}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
