"""X1/X2 metapath operators (SURVEY.md §2.7).

Reference semantics (/root/reference/city2graph/metapath.py):
- add_metapaths (40-166, 662-1000): typed adjacency join chain — hop frames
  merged on dst_{i−1} = src_i (758-769); result grouped by terminal pair
  with weight = path count (947-953, 993-994); numeric attributes are
  row-reduced (sum or mean) ALONG the path, then group-reduced over the
  paths of each terminal pair (974-986).
- add_metapaths_by_weight (169-312): connect endpoint pairs whose
  shortest-path cost over selected edge types lies in
  [min_threshold, threshold] — see ``net.broadcast_sssp`` for the traversal.

Spark shape: pure relational — a chain of equi-joins + one groupBy.
Catalyst reorders/broadcasts the hop joins; hop frames are typically tiny
vs the document table, so the chain usually compiles to broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_metapath(hops: list[DataFrame], *, attrs: list[str] | None = None,
                 row_reduce: str = "sum",
                 group_reduce: str = "sum") -> DataFrame:
    """Compose a metapath from hop edge frames [(src,dst,attr…), …].

    Returns (src, dst, weight = path count[, <attr>_agg …]).
    """
    attrs = attrs or []
    cur = hops[0].select(
        F.col("src").alias("_s"), F.col("dst").alias("_d"),
        *[F.col(a).cast("double").alias(f"_a_{a}_0") for a in attrs])
    for i, hop in enumerate(hops[1:], start=1):
        nxt = hop.select(
            F.col("src").alias("_d"), F.col("dst").alias("_d2"),
            *[F.col(a).cast("double").alias(f"_a_{a}_{i}") for a in attrs])
        cur = cur.join(nxt, "_d").drop("_d").withColumnRenamed("_d2", "_d")
    n = len(hops)
    path_vals = []
    for a in attrs:
        steps = [F.col(f"_a_{a}_{i}") for i in range(n)]
        total = steps[0]
        for s in steps[1:]:
            total = total + s
        if row_reduce == "mean":
            total = total / F.lit(float(n))
        path_vals.append(total.alias(f"_p_{a}"))
    cur = cur.select(F.col("_s").alias("src"), F.col("_d").alias("dst"),
                     *path_vals)
    aggs = [F.count("*").alias("weight")]
    for a in attrs:
        col = F.col(f"_p_{a}")
        agg = F.avg(col) if group_reduce == "mean" else F.sum(col)
        aggs.append(agg.alias(f"{a}_{group_reduce}"))
    return cur.groupBy("src", "dst").agg(*aggs)


def add_metapaths(edges: dict[tuple[str, str, str], DataFrame],
                  metapaths: list[list[tuple[str, str, str]]],
                  *, attrs: list[str] | None = None,
                  row_reduce: str = "sum",
                  group_reduce: str = "sum") -> dict[tuple[str, str, str], DataFrame]:
    """For each metapath (list of typed edge keys), derive a new typed edge
    frame keyed (start_type, 'metapath_<i>', end_type) — the reference's new
    edge key contract (metapath.py:1175+)."""
    out = {}
    for i, path in enumerate(metapaths):
        for a, b in zip(path[:-1], path[1:]):
            if a[2] != b[0]:
                raise ValueError(f"metapath hop mismatch: {a} -> {b}")
        hops = [edges[k] for k in path]
        key = (path[0][0], f"metapath_{i}", path[-1][2])
        out[key] = add_metapath(hops, attrs=attrs, row_reduce=row_reduce,
                                group_reduce=group_reduce)
    return out
