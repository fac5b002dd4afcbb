"""Snapshot checkpoint: resume skips completed stages; lineage invalidation
recomputes dependents."""

import tempfile

from pyspark.sql import functions as F

from city2graph_spark.checkpoint import SnapshotCheckpoint


def test_resume_and_lineage(spark):
    root = tempfile.mkdtemp()
    ck = SnapshotCheckpoint(spark, root)
    calls = {"a": 0, "b": 0}

    def build_a():
        calls["a"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    def build_b():
        calls["b"] += 1
        a = ck.stage("a", build_a)
        return a.where(F.col("v") % 4 == 0)

    b1 = ck.stage("a", build_a)
    assert b1.count() == 100 and calls["a"] == 1
    out = ck.stage("b", build_b, inputs=["a"])
    assert out.count() == 50 and calls == {"a": 1, "b": 1}

    # resume: nothing recomputes
    ck2 = SnapshotCheckpoint(spark, root)
    out2 = ck2.stage("b", lambda: (_ for _ in ()).throw(AssertionError("must not run")),
                     inputs=["a"])
    assert out2.count() == 50

    # manifests carry metrics + lineage
    rep = ck2.report()
    assert rep["a"]["rows"] == 100 and rep["b"]["rows"] == 50
    assert sum(rep["a"]["partitions"].values()) == 100
    assert rep["b"]["lineage"] == {"a": rep["a"]["fingerprint"]}
    assert rep["b"]["wall_sec"] >= 0

    # invalidating the upstream forces the dependent to rebuild
    ck2.invalidate("a")
    out3 = ck2.stage("b", build_b, inputs=["a"])
    assert out3.count() == 50 and calls == {"a": 2, "b": 2}


def test_cli_entry_runs_and_resumes(spark, tmp_path, capsys):
    """cli.py (the spark-submit entry): any registered gate query runs as a
    checkpointed job; a second invocation resumes from the manifest."""
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    import cli
    args = ["--job", "rasterize", "--sf-dir", "/root/testdata/sf0.001",
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ckpt")]
    assert cli.main(args) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["rows"] > 0 and first["resumed"] is False
    assert cli.main(args) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["resumed"] is True
    assert second["fingerprint"] == first["fingerprint"]
    assert second["rows"] == first["rows"]
