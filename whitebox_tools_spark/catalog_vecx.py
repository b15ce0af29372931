"""Query catalog: vector structure tools (SURVEY.md §2.4; reference
data_tools/* and gis_analysis one-file-per-tool) — CleanVector,
LinesToPolygons, PolygonsToLines, MultiPartToSinglePart,
SinglePartToMultiPart, ExtractNodes, LayerFootprint,
MinimumBoundingEnvelope, RemovePolygonHoles, ReinitializeAttributeTable,
CsvPointsToVector, ExportTableToCsv.

The geometry fixture is the rect_layer polygon layer (plus one
degenerate zero-area feature so CleanVector has something to remove),
flattened to a per-vertex relation (fid, part, is_hole, idx, x, y,
zone). The Spark side builds it as a LocalRelation, the oracle as a
VALUES CTE — identical rows by construction, and every operation here
is integer-coordinate arithmetic, so all rows hash bit-exact.

The two CSV tools are true round-trips through Spark's CSV codec
(format/parse via to_csv/from_csv on the executors — the same code path
the file sink uses, minus the filesystem): the oracle checks the
round-tripped values equal the originals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.catalog_grid import _PTS_CTE
from whitebox_tools_spark.sources import vectors

# ------------------------------------------------------------ the fixture

_VERTEX_SCHEMA = T.StructType(
    [
        T.StructField("fid", T.LongType()),
        T.StructField("part", T.LongType()),
        T.StructField("is_hole", T.BooleanType()),
        T.StructField("idx", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("zone", T.LongType()),
    ]
)


def _vertex_rows() -> list[tuple]:
    rows = []
    for feat in vectors.rect_layer():
        for part, (ring, hole) in enumerate(zip(feat.rings, feat.holes)):
            for i, (x, y) in enumerate(ring):
                rows.append(
                    (feat.fid, part, bool(hole), i, float(x), float(y),
                     int(feat.attrs.get("zone", feat.fid)))
                )
    # degenerate zero-area feature (all vertices coincident) for CleanVector
    for i in range(4):
        rows.append((9, 0, False, i, 123.0, 456.0, 9))
    return rows


def _verts(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_vertex_rows(), _VERTEX_SCHEMA)


def _vert_cte() -> str:
    vals = ", ".join(
        f"({fid}, {part}, {str(hole).upper()}, {i}, {x!r}, {y!r}, {zone})"
        for fid, part, hole, i, x, y, zone in _vertex_rows()
    )
    # DuckDB float VALUES literals are DECIMAL; cast to DOUBLE so min/max
    # and pass-through columns hash like Spark doubles
    return (
        "verts AS (SELECT fid, part, is_hole, idx, CAST(x AS DOUBLE) AS x, "
        "CAST(y AS DOUBLE) AS y, zone FROM (VALUES " + vals + ") "
        "t(fid, part, is_hole, idx, x, y, zone))"
    )


# shoelace 2A per (fid, part): rings are closed, so the lead-pair sum over
# idx covers every edge exactly once (the last vertex has no successor)
def _area2(df: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("fid", "part").orderBy("idx")
    nx, ny = F.lead("x").over(w), F.lead("y").over(w)
    term = F.when(nx.isNotNull(), F.col("x") * ny - nx * F.col("y")).otherwise(F.lit(0.0))
    return df.withColumn("_t", term).groupBy("fid", "part").agg(
        F.sum("_t").alias("area2"), F.min("is_hole").alias("is_hole")
    )


_AREA2_CTE = """areas AS (
  SELECT fid, part, min(is_hole) AS is_hole,
         sum(CASE WHEN nx IS NULL THEN 0.0 ELSE x * ny - nx * y END) AS area2
  FROM (SELECT *, lead(x) OVER (PARTITION BY fid, part ORDER BY idx) AS nx,
                  lead(y) OVER (PARTITION BY fid, part ORDER BY idx) AS ny
        FROM verts)
  GROUP BY fid, part)"""


# ---------------------------------------------------------------- queries


def q_clean_vector(spark, sf_dir):
    """CleanVector (clean_vector.rs): drop null/degenerate geometries —
    features whose shell ring has zero area."""
    a = _area2(_verts(spark))
    keep = (
        a.where(~F.col("is_hole"))
        .groupBy("fid")
        .agg(F.max(F.abs(F.col("area2"))).alias("_mx"))
        .where(F.col("_mx") > 0.0)
        .select("fid")
    )
    return (
        _verts(spark)
        .join(keep, "fid", "left_semi")
        .groupBy("fid")
        .agg(F.count_distinct("part").alias("n_parts"))
    )


def q_remove_polygon_holes(spark, sf_dir):
    """RemovePolygonHoles (remove_polygon_holes.rs): strip hole parts."""
    return (
        _verts(spark)
        .where(~F.col("is_hole"))
        .groupBy("fid")
        .agg(
            F.count_distinct("part").alias("n_parts"),
            F.count(F.lit(1)).alias("n_vertices"),
        )
    )


def q_multipart_to_singlepart(spark, sf_dir):
    """MultiPartToSinglePart (multipart_to_singlepart.rs): one output
    feature per part; new FIDs are the (fid, part) scan order."""
    from pyspark.sql import Window

    parts = _verts(spark).groupBy("fid", "part").agg(
        F.count(F.lit(1)).alias("n_vertices")
    )
    w = Window.orderBy("fid", "part")
    return parts.select(
        F.row_number().over(w).cast("long").alias("new_fid"),
        F.col("fid").alias("orig_fid"), "part", "n_vertices",
    )


def q_singlepart_to_multipart(spark, sf_dir):
    """SinglePartToMultiPart (singlepart_to_multipart.rs): merge features
    sharing an attribute value into one multipart feature."""
    return _verts(spark).groupBy("zone").agg(
        F.count_distinct("fid", "part").alias("n_parts"),
        F.count(F.lit(1)).alias("n_vertices"),
    )


def q_extract_nodes(spark, sf_dir):
    """ExtractNodes (extract_nodes.rs): one point per vertex."""
    return _verts(spark).select("fid", "part", "idx", "x", "y")


def q_layer_footprint(spark, sf_dir):
    """LayerFootprint (layer_footprint.rs): whole-layer bounding box."""
    return _verts(spark).agg(
        F.min("x").alias("min_x"), F.min("y").alias("min_y"),
        F.max("x").alias("max_x"), F.max("y").alias("max_y"),
    )


def q_min_bounding_envelope(spark, sf_dir):
    """MinimumBoundingEnvelope (minimum_bounding_envelope.rs): per-feature
    bounding box."""
    return _verts(spark).groupBy("fid").agg(
        F.min("x").alias("xmin"), F.min("y").alias("ymin"),
        F.max("x").alias("xmax"), F.max("y").alias("ymax"),
    )


def q_reinitialize_attribute_table(spark, sf_dir):
    """ReinitializeAttributeTable (reinitialize_attribute_table.rs): strip
    every attribute, keep sequential FIDs."""
    from pyspark.sql import Window

    fids = _verts(spark).select("fid").distinct()
    return fids.select(
        F.row_number().over(Window.orderBy("fid")).cast("long").alias("new_fid"),
        F.col("fid").alias("orig_fid"),
    )


def q_polygons_to_lines(spark, sf_dir):
    """PolygonsToLines (polygons_to_lines.rs): ring paths become
    polylines; perimeter per part (axis-aligned fixture -> exact)."""
    from pyspark.sql import Window

    w = Window.partitionBy("fid", "part").orderBy("idx")
    v = _verts(spark)
    nx, ny = F.lead("x").over(w), F.lead("y").over(w)
    seg = F.when(
        nx.isNotNull(),
        F.sqrt((nx - F.col("x")) * (nx - F.col("x")) + (ny - F.col("y")) * (ny - F.col("y"))),
    ).otherwise(F.lit(0.0))
    return v.withColumn("_s", seg).groupBy("fid", "part").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("_s").alias("length"),
    )


def q_lines_to_polygons(spark, sf_dir):
    """LinesToPolygons (lines_to_polygons.rs): close each open path (the
    fixture paths are the rings with the closing vertex dropped); output
    per part the closed vertex count and the first==last closure."""
    v = _verts(spark)
    mx = v.groupBy("fid", "part").agg(F.max("idx").alias("_mx"))
    open_path = v.join(mx, ["fid", "part"]).where(F.col("idx") < F.col("_mx"))
    first = open_path.where(F.col("idx") == 0).select(
        "fid", "part", F.col("x").alias("close_x"), F.col("y").alias("close_y")
    )
    return (
        open_path.groupBy("fid", "part")
        .agg((F.count(F.lit(1)) + F.lit(1)).alias("n_vertices_closed"))
        .join(first, ["fid", "part"])
    )


def q_csv_points_to_vector(spark, sf_dir):
    """CsvPointsToVector (csv_points_to_vector.rs): parse id,x,y CSV lines
    into a point layer — a real executor-side from_csv parse of lines
    formatted by the CSV writer codepath."""
    from whitebox_tools_spark.catalog_local import _geo

    pts = _geo(spark, sf_dir).select("doc_id", "x", "y")
    lines = pts.select(
        F.to_csv(F.struct("doc_id", "x", "y")).alias("line")
    )
    parsed = lines.select(
        F.from_csv(
            F.col("line"), "doc_id BIGINT, x DOUBLE, y DOUBLE"
        ).alias("p")
    )
    return parsed.select("p.doc_id", "p.x", "p.y")


def q_export_table_to_csv(spark, sf_dir):
    """ExportTableToCsv (export_table_to_csv.rs): attribute table ->
    CSV -> parse back; the oracle pins the round-trip lossless."""
    from whitebox_tools_spark.sources.tables import load

    t = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lines = t.select(F.to_csv(F.struct("o_orderkey", "o_totalprice")).alias("line"))
    parsed = lines.select(
        F.from_csv(F.col("line"), "o_orderkey BIGINT, o_totalprice DOUBLE").alias("p")
    )
    return parsed.select("p.o_orderkey", "p.o_totalprice")


QUERIES = {
    "clean_vector": q_clean_vector,
    "remove_polygon_holes": q_remove_polygon_holes,
    "multipart_to_singlepart": q_multipart_to_singlepart,
    "singlepart_to_multipart": q_singlepart_to_multipart,
    "extract_nodes": q_extract_nodes,
    "layer_footprint": q_layer_footprint,
    "min_bounding_envelope": q_min_bounding_envelope,
    "reinitialize_attribute_table": q_reinitialize_attribute_table,
    "polygons_to_lines": q_polygons_to_lines,
    "lines_to_polygons": q_lines_to_polygons,
    "csv_points_to_vector": q_csv_points_to_vector,
    "export_table_to_csv": q_export_table_to_csv,
}

_V = _vert_cte()

ORACLE_SQL = {
    "clean_vector": f"""
WITH {_V},
{_AREA2_CTE},
keep AS (SELECT fid FROM areas WHERE NOT is_hole
         GROUP BY fid HAVING max(abs(area2)) > 0.0)
SELECT fid, count(DISTINCT part) AS n_parts
FROM verts WHERE fid IN (SELECT fid FROM keep) GROUP BY fid
""",
    "remove_polygon_holes": f"""
WITH {_V}
SELECT fid, count(DISTINCT part) AS n_parts, count(*) AS n_vertices
FROM verts WHERE NOT is_hole GROUP BY fid
""",
    "multipart_to_singlepart": f"""
WITH {_V},
parts AS (SELECT fid, part, count(*) AS n_vertices FROM verts GROUP BY fid, part)
SELECT row_number() OVER (ORDER BY fid, part) AS new_fid,
       fid AS orig_fid, part, n_vertices
FROM parts
""",
    "singlepart_to_multipart": f"""
WITH {_V}
SELECT zone, count(DISTINCT (fid, part)) AS n_parts, count(*) AS n_vertices
FROM verts GROUP BY zone
""",
    "extract_nodes": f"""
WITH {_V}
SELECT fid, part, idx, x, y FROM verts
""",
    "layer_footprint": f"""
WITH {_V}
SELECT min(x) AS min_x, min(y) AS min_y, max(x) AS max_x, max(y) AS max_y
FROM verts
""",
    "min_bounding_envelope": f"""
WITH {_V}
SELECT fid, min(x) AS xmin, min(y) AS ymin, max(x) AS xmax, max(y) AS ymax
FROM verts GROUP BY fid
""",
    "reinitialize_attribute_table": f"""
WITH {_V}
SELECT row_number() OVER (ORDER BY fid) AS new_fid, fid AS orig_fid
FROM (SELECT DISTINCT fid FROM verts)
""",
    "polygons_to_lines": f"""
WITH {_V}
SELECT fid, part, count(*) AS n_vertices,
       CAST(sum(CASE WHEN nx IS NULL THEN 0.0
                ELSE sqrt((nx - x) * (nx - x) + (ny - y) * (ny - y)) END) AS DOUBLE) AS length
FROM (SELECT *, lead(x) OVER (PARTITION BY fid, part ORDER BY idx) AS nx,
                lead(y) OVER (PARTITION BY fid, part ORDER BY idx) AS ny
      FROM verts)
GROUP BY fid, part
""",
    "lines_to_polygons": f"""
WITH {_V},
mx AS (SELECT fid, part, max(idx) AS m FROM verts GROUP BY fid, part),
open_path AS (SELECT v.* FROM verts v JOIN mx USING (fid, part) WHERE v.idx < mx.m)
SELECT fid, part, count(*) + 1 AS n_vertices_closed,
       CAST(min(CASE WHEN idx = 0 THEN x END) AS DOUBLE) AS close_x,
       CAST(min(CASE WHEN idx = 0 THEN y END) AS DOUBLE) AS close_y
FROM open_path GROUP BY fid, part
""",
    "csv_points_to_vector": f"""
WITH {_PTS_CTE}
SELECT doc_id, x, y FROM pts
""",
    "export_table_to_csv": """
SELECT o_orderkey, o_totalprice FROM orders
""",
}
