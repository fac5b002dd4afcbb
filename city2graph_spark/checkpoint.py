"""Snapshot checkpointing with per-partition lineage + metrics (the north
rule's resumability contract: "resumable from checkpoint with per-partition
lineage + metrics").

Each pipeline stage writes its result as a parquet snapshot plus a
``manifest.json`` recording: row count, schema, per-partition row counts,
wall-clock, and the lineage (upstream stage names + their manifest
fingerprints).  Re-running a pipeline skips any stage whose manifest exists
and whose upstream fingerprints are unchanged — the local stand-in for
Iceberg snapshot commits (same pattern: atomic manifest-after-data, content
fingerprints for validity).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotCheckpoint:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers --------------------------------------------------
    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "manifest.json")

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def fingerprint(self, stage: str) -> str | None:
        m = self.manifest(stage)
        if m is None:
            return None
        return m["fingerprint"]

    def is_complete(self, stage: str, inputs: list[str],
                    version: str | None = None) -> bool:
        m = self.manifest(stage)
        if m is None:
            return False
        # a manifest without its data is NOT complete (deleted/corrupt dir)
        data_dir = os.path.join(self._dir(stage), "data")
        if not os.path.isdir(data_dir) or not any(
                f.endswith(".parquet") or f == "_SUCCESS"
                for f in os.listdir(data_dir)):
            return False
        # build-code identity: a stage rebuilt with different logic must not
        # be silently skipped
        if m.get("version") != version:
            return False
        want = {s: self.fingerprint(s) for s in inputs}
        return m.get("lineage") == want and all(v is not None
                                                for v in want.values()) \
            if inputs else m.get("lineage") == {}

    # -- stage execution ----------------------------------------------------
    def stage(self, name: str, build, *, inputs: list[str] | None = None,
              partition_by: str | None = None,
              version: str | None = None) -> DataFrame:
        """Run (or resume) a stage.  ``build`` is a zero-arg callable
        returning the stage's DataFrame; ``inputs`` are upstream stage names
        for lineage validation; ``version`` is an optional build-code tag —
        change it when the stage's logic changes to force a rebuild."""
        inputs = inputs or []
        data_dir = os.path.join(self._dir(name), "data")
        if self.is_complete(name, inputs, version):
            return self.spark.read.parquet(data_dir)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(data_dir)

        out = self.spark.read.parquet(data_dir)
        per_part = (out.withColumn("_p", F.spark_partition_id())
                    .groupBy("_p").count().collect())
        partitions = {str(r["_p"]): r["count"] for r in per_part}
        rows = sum(partitions.values())
        lineage = {s: self.fingerprint(s) for s in inputs}
        body = {
            "stage": name,
            "rows": rows,
            "schema": out.schema.simpleString(),
            "partitions": partitions,
            "wall_sec": round(time.time() - t0, 3),
            "lineage": lineage,
            "version": version,
        }
        body["fingerprint"] = hashlib.md5(
            json.dumps({k: body[k] for k in
                        ("stage", "rows", "schema", "lineage", "version")},
                       sort_keys=True).encode()).hexdigest()
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(body, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path(name))  # atomic commit
        return out

    def invalidate(self, stage: str) -> None:
        p = self._manifest_path(stage)
        if os.path.exists(p):
            os.remove(p)

    def report(self) -> dict:
        """All stage manifests (the pipeline's lineage/metrics ledger)."""
        out = {}
        if not os.path.isdir(self.root):
            return out
        for stage in sorted(os.listdir(self.root)):
            m = self.manifest(stage)
            if m:
                out[stage] = m
        return out
