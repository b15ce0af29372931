"""whitebox_tools_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the operator families of the reference geospatial toolbox
(geoinfobyran/whitebox-tools, see SURVEY.md) as idiomatic Spark DataFrame
pipelines: grid/H3-style cell indexing, point-in-polygon overlay joins,
fixed-radius / kNN neighbour joins, IDW & nearest-neighbour gridding,
vector<->raster conversion, tile-parallel raster transforms (focal stencils
with halo exchange), zonal statistics, hex binning, and attribute-table
relational ops — plus large-scale training-data pipeline operators
(dedup, similarity search, text stats, multimodal plumbing).

Architecture (Spark-first, NOT a port):
- All hot-path expressions are JVM-side ``pyspark.sql.functions`` columns;
  geometry kernels that need numpy run as Arrow-vectorized pandas UDFs /
  ``mapInPandas`` (never per-row Python).
- Spatial joins are cell-id equi-joins (bucket = radius/2, 5x5 neighbour
  probe — the reference's FixedRadiusSearch contract,
  src/structures/fixed_radius_search.rs:58-133) with AQE skew handling and
  optional salting; small polygon layers broadcast as per-executor R-tree
  style indexes inside the UDF (no shuffle at all for PIP overlay).
- Exact parity semantics (NoData, cell-center transforms, winding-number
  even-odd edge-outside PIP, record-order-dependent aggregates) live in
  ``kernels/`` as pure-numpy functions, unit-tested against the reference's
  own pinned expectations (SURVEY.md section 5).
"""

__version__ = "0.1.0"

from whitebox_tools_spark.session import get_spark  # noqa: F401
