"""U7 — driver-side graph collectors (SURVEY §2.4; reference
/root/reference/city2graph/conversion.py:1759-1990 ``gdf_to_nx``/``nx_to_gdf``).

These are deliberately DRIVER-SIDE: the distributed engine's results are
DataFrames; round-tripping into an in-memory graph object only makes sense
for street-scale subgraphs (parity tests, notebook inspection).  The
node-link dict is the stable exchange format (it is exactly what
``networkx.node_link_graph`` consumes); ``to_networkx`` is gated behind an
import-try because this sandbox does not ship networkx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def to_node_link(nodes: DataFrame | None, edges: DataFrame, *,
                 node_id: str = "node_id", src: str = "src",
                 dst: str = "dst", directed: bool = False,
                 max_rows: int = 1_000_000) -> dict:
    """Collect a (small) graph into node-link format: ``{"directed",
    "nodes": [{"id", **attrs}], "links": [{"source", "target", **attrs}]}``.

    Raises if the edge list — or the node table — exceeds ``max_rows``:
    this is the documented guard against accidentally gathering a
    planet-sized result on either side."""
    n_edges = edges.count()
    if n_edges > max_rows:
        raise ValueError(f"to_node_link collects to the driver; {n_edges} "
                         f"edges > max_rows={max_rows} — filter/clip first")
    if nodes is not None:
        n_nodes = nodes.count()
        if n_nodes > max_rows:
            raise ValueError(
                f"to_node_link collects to the driver; {n_nodes} "
                f"nodes > max_rows={max_rows} — filter/clip first")
    link_rows = edges.collect()
    links = []
    for r in link_rows:
        d = r.asDict()
        d["source"] = d.pop(src)
        d["target"] = d.pop(dst)
        links.append(d)
    if nodes is None:
        ids = sorted({l["source"] for l in links}
                     | {l["target"] for l in links})
        node_list = [{"id": i} for i in ids]
    else:
        node_list = []
        for r in nodes.collect():
            d = r.asDict()
            d["id"] = d.pop(node_id)
            node_list.append(d)
    return {"directed": bool(directed), "multigraph": False,
            "graph": {}, "nodes": node_list, "links": links}


def to_networkx(nodes: DataFrame | None, edges: DataFrame, **kw):
    """Node-link collect → ``networkx.Graph``/``DiGraph`` (the reference's
    gdf_to_nx round-trip surface).  Requires networkx at runtime."""
    try:
        import networkx as nx
    except ImportError as e:   # pragma: no cover - sandbox has no networkx
        raise ImportError(
            "to_networkx needs the optional networkx dependency; "
            "use to_node_link for a dependency-free export") from e
    return nx.node_link_graph(to_node_link(nodes, edges, **kw))


def from_node_link(spark: SparkSession, data: dict, *,
                   node_id: str = "node_id", src: str = "src",
                   dst: str = "dst") -> tuple[DataFrame, DataFrame]:
    """Inverse of :func:`to_node_link`: node-link dict → (nodes, edges)
    DataFrames (the reference's nx_to_gdf analogue)."""
    nrows = [dict(d) for d in data.get("nodes", [])]
    for d in nrows:
        d[node_id] = d.pop("id")
    erows = [dict(d) for d in data.get("links", [])]
    for d in erows:
        d[src] = d.pop("source")
        d[dst] = d.pop("target")
    nodes = spark.createDataFrame(nrows) if nrows else \
        spark.createDataFrame([], f"{node_id} long")
    edges = spark.createDataFrame(erows) if erows else \
        spark.createDataFrame([], f"{src} long, {dst} long")
    return nodes, edges
