"""city2graph_spark — a from-scratch PySpark-native spatial-graph + tiling engine.

Reimplements the query/data-processing semantics of the reference library
``yu-ta-sato/city2graph`` (surveyed in ``SURVEY.md``) as distributed,
grid-cell-indexed spatial joins over Spark DataFrames, plus the
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB corpus job needs.

Design rules (see SURVEY.md §7.0):

- DataFrame/SQL first; Catalyst does pushdown/pruning/join selection.
- Geometry lives in WKB/WKT columns and numpy arrays inside Arrow-batched
  pandas UDFs — never per-row Python.  (The sandbox has no shapely/scipy;
  ``city2graph_spark.geo`` is a pure-numpy geometry kernel library.)
- Spatial joins are grid-cell (Z-order) equi-joins with halo rings; skewed
  cells are salted/split.
- Exact neighbor graphs use two-phase local-search → boundary-exchange.
"""

__version__ = "0.1.0"
