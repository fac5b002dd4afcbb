"""X1/X2 metapath operators (SURVEY.md §2.7).

Reference semantics (/root/reference/city2graph/metapath.py):
- add_metapaths (40-166, 662-1000): typed adjacency join chain — hop frames
  merged on dst_{i−1} = src_i (758-769); result grouped by terminal pair
  with weight = path count (947-953, 993-994); numeric attributes are
  row-reduced (sum or mean) ALONG the path, then group-reduced over the
  paths of each terminal pair (974-986).
- undirected mode (831-840, 956-991): a missing hop key falls back to the
  REVERSE edge type traversed backwards (_get_edge_frame); each joined path
  is canonicalised against its reversal — per-hop edge ids get their
  terminal pair ordered (_canonicalize_undirected_edge_id, 1047-1068), the
  whole edge sequence is compared with its reverse and the smaller
  orientation kept (_canonicalize_undirected_sequence, 1070+), duplicates
  dropped by that path signature (991) so a path and its reverse count
  once; terminal (src, dst) come from the canonical node sequence.
- add_metapaths_by_weight (169-312): connect endpoint pairs whose
  shortest-path cost over selected edge types lies in
  [min_threshold, threshold] — see ``net.broadcast_sssp`` for the traversal.

Spark shape: pure relational — a chain of equi-joins, path signatures as
JVM-side array<struct> columns compared in the ids' native type (numeric
ids order numerically; string ids can't alias across hop boundaries —
no delimiter-joined strings), one canonical-min groupBy per signature,
one terminal groupBy.  Catalyst
reorders/broadcasts the hop joins; hop frames are typically tiny vs the
document table, so the chain usually compiles to broadcast joins.
Edge identity is the (src, dst) pair — the reference's extra MultiIndex
edge-key levels (multigraph hops) are out of scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_metapath(hops: list[DataFrame], *, attrs: list[str] | None = None,
                 row_reduce: str = "sum",
                 group_reduce: str = "sum",
                 directed: bool = True) -> DataFrame:
    """Compose a metapath from hop edge frames [(src,dst,attr…), …].

    Returns (src, dst, weight = path count[, <attr>_agg …]).  With
    ``directed=False`` a path and its reversal are the same path: both
    orientations collapse onto one canonical signature before counting
    (reference metapath.py:956-991).
    """
    attrs = attrs or []
    n = len(hops)
    cur = hops[0].select(
        F.col("src").alias("_n0"), F.col("dst").alias("_n1"),
        *[F.col(a).cast("double").alias(f"_a_{a}_0") for a in attrs])
    for i, hop in enumerate(hops[1:], start=1):
        nxt = hop.select(
            F.col("src").alias(f"_n{i}"), F.col("dst").alias(f"_n{i + 1}"),
            *[F.col(a).cast("double").alias(f"_a_{a}_{i}") for a in attrs])
        cur = cur.join(nxt, f"_n{i}")
    path_vals = []
    for a in attrs:
        steps = [F.col(f"_a_{a}_{i}") for i in range(n)]
        total = steps[0]
        for s in steps[1:]:
            total = total + s
        if row_reduce == "mean":
            total = total / F.lit(float(n))
        path_vals.append(total.alias(f"_p_{a}"))

    if directed:
        cur = cur.select(F.col("_n0").alias("src"),
                         F.col(f"_n{n}").alias("dst"), *path_vals)
    else:
        # canonical per-hop edge signature: ordered terminal pair as
        # array<struct<string>> columns compared ELEMENT-WISE — the exact
        # shape of the reference's per-value (type, repr) sort keys
        # (metapath.py:1003-1021: repr-string order, tuple-compared element
        # by element).  Arrays are orderable/groupable in Spark, so there is
        # no delimiter-joined string: ids containing a would-be delimiter
        # can't alias two paths onto one signature, and a value that is a
        # string-prefix of another ("1" vs "12") orders exactly as the
        # reference's tuple compare does (a joined string would rank the
        # delimiter byte against the next digit instead).
        skeys = [F.col(f"_n{i}").cast("string") for i in range(n + 1)]
        esigs = [F.struct(
            F.least(skeys[i], skeys[i + 1]).alias("a"),
            F.greatest(skeys[i], skeys[i + 1]).alias("b"))
            for i in range(n)]
        sig = F.least(F.array(*esigs), F.array(*reversed(esigs)))
        nodes_f = F.array(*skeys)
        nodes_r = F.array(*reversed(skeys))
        fwd = nodes_f <= nodes_r
        cur = cur.select(
            sig.alias("_sig"),
            F.when(fwd, F.col("_n0")).otherwise(F.col(f"_n{n}")).alias("src"),
            F.when(fwd, F.col(f"_n{n}")).otherwise(F.col("_n0")).alias("dst"),
            *path_vals)
        # a path and its reverse carry identical canonical values, so the
        # min-struct pick is deterministic (not a nondeterministic first())
        cur = (cur.groupBy("_sig")
               .agg(F.min(F.struct("src", "dst",
                                   *[f"_p_{a}" for a in attrs])).alias("_s"))
               .select("_s.*"))

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
                  group_reduce: str = "sum",
                  directed: bool = True
                  ) -> dict[tuple[str, str, str], DataFrame]:
    """For each metapath (list of typed edge keys), derive a new typed edge
    frame keyed (start_type, 'metapath_<i>', end_type) — the reference's new
    edge key contract (metapath.py:1175+).  With ``directed=False`` a hop
    key missing from ``edges`` resolves through its reverse key with the
    frame traversed backwards (reference _get_edge_frame, 806-840)."""
    out = {}
    for i, path in enumerate(metapaths):
        for a, b in zip(path[:-1], path[1:]):
            if a[2] != b[0]:
                raise ValueError(f"metapath hop mismatch: {a} -> {b}")
        hops = []
        for k in path:
            if k in edges:
                hops.append(edges[k])
            elif not directed and (k[2], k[1], k[0]) in edges:
                rev = edges[(k[2], k[1], k[0])]
                hops.append(rev.withColumn("_t", F.col("src"))
                            .withColumn("src", F.col("dst"))
                            .withColumn("dst", F.col("_t")).drop("_t"))
            else:
                raise KeyError(f"edge type {k} not found in edges dict")
        key = (path[0][0], f"metapath_{i}", path[-1][2])
        out[key] = add_metapath(hops, attrs=attrs, row_reduce=row_reduce,
                                group_reduce=group_reduce, directed=directed)
    return out
