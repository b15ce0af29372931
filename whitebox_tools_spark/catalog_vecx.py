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
from whitebox_tools_spark.operators import vector_structure as vstruct
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


# ---------------------------------------------------------------- queries
# (all bodies delegate to operators.vector_structure — the facade-visible
# DataFrame-in/DataFrame-out implementations; the oracle rows below
# therefore certify the operator code itself)


def q_clean_vector(spark, sf_dir):
    """CleanVector (clean_vector.rs): drop null/degenerate geometries —
    features whose shell ring has zero area."""
    return vstruct.clean_vector(_verts(spark))


def q_remove_polygon_holes(spark, sf_dir):
    """RemovePolygonHoles (remove_polygon_holes.rs): strip hole parts."""
    return vstruct.remove_polygon_holes(_verts(spark))


def q_multipart_to_singlepart(spark, sf_dir):
    """MultiPartToSinglePart (multipart_to_singlepart.rs): one output
    feature per part; new FIDs are the (fid, part) scan order."""
    return vstruct.multipart_to_singlepart(_verts(spark))


def q_singlepart_to_multipart(spark, sf_dir):
    """SinglePartToMultiPart (singlepart_to_multipart.rs): merge features
    sharing an attribute value into one multipart feature."""
    return vstruct.singlepart_to_multipart(_verts(spark), "zone")


def q_extract_nodes(spark, sf_dir):
    """ExtractNodes (extract_nodes.rs): one point per vertex."""
    return vstruct.extract_nodes(_verts(spark))


def q_layer_footprint(spark, sf_dir):
    """LayerFootprint (layer_footprint.rs): whole-layer bounding box."""
    return vstruct.layer_footprint(_verts(spark))


def q_min_bounding_envelope(spark, sf_dir):
    """MinimumBoundingEnvelope (minimum_bounding_envelope.rs): per-feature
    bounding box."""
    return vstruct.minimum_bounding_envelope(_verts(spark))


def q_reinitialize_attribute_table(spark, sf_dir):
    """ReinitializeAttributeTable (reinitialize_attribute_table.rs): strip
    every attribute, keep sequential FIDs."""
    return vstruct.reinitialize_attribute_table(_verts(spark))


def q_polygons_to_lines(spark, sf_dir):
    """PolygonsToLines (polygons_to_lines.rs): ring paths become
    polylines; perimeter per part (axis-aligned fixture -> exact)."""
    return vstruct.polygons_to_lines(_verts(spark))


def q_lines_to_polygons(spark, sf_dir):
    """LinesToPolygons (lines_to_polygons.rs): close each open path (the
    fixture paths are the rings with the closing vertex dropped); output
    per part the closed vertex count and the first==last closure."""
    return vstruct.lines_to_polygons(_verts(spark))


def q_csv_points_to_vector(spark, sf_dir):
    """CsvPointsToVector (csv_points_to_vector.rs): parse id,x,y CSV lines
    into a point layer — a real executor-side from_csv parse of lines
    formatted by the CSV writer codepath."""
    from whitebox_tools_spark.catalog_local import _geo

    pts = _geo(spark, sf_dir).select("doc_id", "x", "y")
    lines = vstruct.export_table_to_csv(pts)
    return vstruct.csv_points_to_vector(lines, "doc_id BIGINT, x DOUBLE, y DOUBLE")


def q_export_table_to_csv(spark, sf_dir):
    """ExportTableToCsv (export_table_to_csv.rs): attribute table ->
    CSV -> parse back; the oracle pins the round-trip lossless."""
    from whitebox_tools_spark.sources.tables import load

    t = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lines = vstruct.export_table_to_csv(t)
    return vstruct.csv_points_to_vector(lines, "o_orderkey BIGINT, o_totalprice DOUBLE")


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

_AREA2_CTE = """areas AS (
  SELECT fid, part, min(is_hole) AS is_hole,
         sum(CASE WHEN nx IS NULL THEN 0.0 ELSE x * ny - nx * y END) AS area2
  FROM (SELECT *, lead(x) OVER (PARTITION BY fid, part ORDER BY idx) AS nx,
                  lead(y) OVER (PARTITION BY fid, part ORDER BY idx) AS ny
        FROM verts)
  GROUP BY fid, part)"""

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
