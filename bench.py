"""Benchmark harness — headline kNN + Gabriel spatial-graph construction.

Default mode: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line ``{"metric", "value", "unit", "queries", "sf", ...}``.

The spatial workload runs over a point table expanded deterministically from
the sf's documents (``SPARK_GRAFT_BENCH_FACTOR`` replicas, default 40 ⇒
200k points at sf0.1) so the cell joins are exercised well past the raw
document count; the pipeline queries (minhash LSH, embedding top-k) run at
native sf.

``--scaling`` mode: re-run the same job in two subprocesses at
``local[8]`` and ``local[32]`` on identical input and write
``BENCH/BASELINE.md`` with throughput at both plus
efficiency = thr(32) / (4 · thr(8)) — the BASELINE.json north-rule
two-cluster-size criterion evidenced at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FACTOR = int(os.environ.get("SPARK_GRAFT_BENCH_FACTOR", "40"))
KNN_K = 5


def run_bench() -> dict:
    from city2graph_spark import gate
    from city2graph_spark.io.points import expanded_points
    from city2graph_spark.operators.proximity import (
        estimate_knn_cell, gabriel_graph, knn_graph)
    from city2graph_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=str(max(CPUS, 16)))
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    pts = expanded_points(spark, SF_DIR, FACTOR).cache()
    n_pts = pts.count()
    spacing = 5000.0 / max(n_pts, 1) ** 0.5

    t0 = time.time()
    knn_edges = knn_graph(pts, KNN_K,
                          cell_size=estimate_knn_cell(n_pts, KNN_K)).count()
    queries["knn_graph"] = round(time.time() - t0, 3)

    t0 = time.time()
    gab_edges = gabriel_graph(pts, r_cand=6.0 * spacing).count()
    queries["gabriel_graph"] = round(time.time() - t0, 3)

    # pipeline headliners at native sf
    for name in ("minhash_lsh", "embedding_topk", "travel_summary"):
        fn = gate.queries()[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        queries[name] = round(time.time() - t0, 3)

    spatial_sec = queries["knn_graph"] + queries["gabriel_graph"]
    extra.update(
        points=n_pts,
        knn_edges=knn_edges,
        gabriel_edges=gab_edges,
        docs_per_sec=round(n_pts / spatial_sec, 1),
        edges_per_sec=round((knn_edges + gab_edges) / spatial_sec, 1),
        cpus=CPUS,
    )
    spark.stop()
    total = round(sum(queries.values()), 3)
    return {"metric": "headline_total_sec", "value": total, "unit": "sec",
            "queries": queries, "sf": SF_DIR.rstrip("/").split("sf")[-1], **extra}


def run_scaling() -> None:
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["docs_per_sec"]
    thr32 = results[32]["docs_per_sec"]
    eff = thr32 / (4.0 * thr8)
    md = f"""# BENCH — two-parallelism scaling evidence (north rule)

Same job (exact two-phase kNN k={KNN_K} + bounded Gabriel over
{results[32]['points']:,} derived points from `{SF_DIR}`) at two parallelism
levels on identical input — the sandbox stand-in for the N vs 4N executor
cluster criterion.

| parallelism | knn sec | gabriel sec | points/sec | edges/sec |
|---|---|---|---|---|
| local[8]  | {results[8]['queries']['knn_graph']} | {results[8]['queries']['gabriel_graph']} | {thr8:,} | {results[8]['edges_per_sec']:,} |
| local[32] | {results[32]['queries']['knn_graph']} | {results[32]['queries']['gabriel_graph']} | {thr32:,} | {results[32]['edges_per_sec']:,} |

**Scaling efficiency (local[8] → local[32], 4× cores):
{eff:.3f}** (gate: ≥ 0.8)

Full JSON: `{json.dumps(results[8])}`
`{json.dumps(results[32])}`
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
