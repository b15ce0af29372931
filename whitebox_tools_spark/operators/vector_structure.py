"""Vector-structure tools over the per-vertex relation (SURVEY.md §2.4;
reference data_tools/* one-file-per-tool: clean_vector.rs,
remove_polygon_holes.rs, multipart_to_singlepart.rs,
singlepart_to_multipart.rs, extract_nodes.rs, layer_footprint.rs,
minimum_bounding_envelope.rs, reinitialize_attribute_table.rs,
polygons_to_lines.rs, lines_to_polygons.rs, csv_points_to_vector.rs,
export_table_to_csv.rs, add_point_coordinates_to_table.rs).

All operators are DataFrame-in / DataFrame-out over the flattened
vertex relation ``(fid, part, is_hole, idx, x, y, <attrs…>)`` — the
Spark-long-form equivalent of the reference's ShapefileGeometry
(parts/points arrays, src/vector/shapefile/geometry.rs:14-30). Every
operation here is a projection, window, or groupBy over that relation:
narrow or single-shuffle plans that scale with vertex count, never with
driver memory. The catalog rows in catalog_vecx.py / catalog_lidarx.py
call these functions directly, so the DuckDB oracles certify this code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ring_area2",
    "clean_vector",
    "remove_polygon_holes",
    "multipart_to_singlepart",
    "singlepart_to_multipart",
    "extract_nodes",
    "layer_footprint",
    "minimum_bounding_envelope",
    "reinitialize_attribute_table",
    "polygons_to_lines",
    "lines_to_polygons",
    "export_table_to_csv",
    "csv_points_to_vector",
    "add_point_coordinates_to_table",
]


def ring_area2(verts: DataFrame) -> DataFrame:
    """Shoelace 2A per (fid, part) ring: ``(fid, part, is_hole, area2)``.

    Rings are closed (first vertex repeated last), so summing the
    lead-pair cross terms over idx covers every edge exactly once — the
    last vertex has no successor and contributes 0.
    """
    w = Window.partitionBy("fid", "part").orderBy("idx")
    nx, ny = F.lead("x").over(w), F.lead("y").over(w)
    term = F.when(nx.isNotNull(), F.col("x") * ny - nx * F.col("y")).otherwise(F.lit(0.0))
    return verts.withColumn("_t", term).groupBy("fid", "part").agg(
        F.sum("_t").alias("area2"), F.min("is_hole").alias("is_hole")
    )


def clean_vector(verts: DataFrame) -> DataFrame:
    """CleanVector (data_tools/clean_vector.rs): drop null/degenerate
    geometries — features whose every shell ring has zero area. Returns
    the surviving features' ``(fid, n_parts)``."""
    a = ring_area2(verts)
    keep = (
        a.where(~F.col("is_hole"))
        .groupBy("fid")
        .agg(F.max(F.abs(F.col("area2"))).alias("_mx"))
        .where(F.col("_mx") > 0.0)
        .select("fid")
    )
    return (
        verts.join(keep, "fid", "left_semi")
        .groupBy("fid")
        .agg(F.count_distinct("part").alias("n_parts"))
    )


def remove_polygon_holes(verts: DataFrame) -> DataFrame:
    """RemovePolygonHoles (data_tools/remove_polygon_holes.rs): strip
    hole parts; per feature the surviving part/vertex counts."""
    return (
        verts.where(~F.col("is_hole"))
        .groupBy("fid")
        .agg(
            F.count_distinct("part").alias("n_parts"),
            F.count(F.lit(1)).alias("n_vertices"),
        )
    )


def multipart_to_singlepart(verts: DataFrame) -> DataFrame:
    """MultiPartToSinglePart (data_tools/multipart_to_singlepart.rs):
    one output feature per part; new FIDs are the (fid, part) scan
    order — the reference's sequential re-number of the split parts."""
    parts = verts.groupBy("fid", "part").agg(F.count(F.lit(1)).alias("n_vertices"))
    # global row_number: the sequential-FID contract forces a total
    # order, but it runs over the per-PART relation (one row per part,
    # orders of magnitude smaller than the vertex table) — feature-scale,
    # not data-scale
    w = Window.orderBy("fid", "part")
    return parts.select(
        F.row_number().over(w).cast("long").alias("new_fid"),
        F.col("fid").alias("orig_fid"), "part", "n_vertices",
    )


def singlepart_to_multipart(verts: DataFrame, field: str = "zone") -> DataFrame:
    """SinglePartToMultiPart (data_tools/singlepart_to_multipart.rs):
    merge features sharing ``field`` into one multipart feature."""
    return verts.groupBy(field).agg(
        F.count_distinct("fid", "part").alias("n_parts"),
        F.count(F.lit(1)).alias("n_vertices"),
    )


def extract_nodes(verts: DataFrame) -> DataFrame:
    """ExtractNodes (data_tools/extract_nodes.rs): one point per vertex."""
    return verts.select("fid", "part", "idx", "x", "y")


def layer_footprint(verts: DataFrame) -> DataFrame:
    """LayerFootprint (gis_analysis/layer_footprint.rs): whole-layer
    bounding box (single partial-aggregable pass)."""
    return verts.agg(
        F.min("x").alias("min_x"), F.min("y").alias("min_y"),
        F.max("x").alias("max_x"), F.max("y").alias("max_y"),
    )


def minimum_bounding_envelope(verts: DataFrame) -> DataFrame:
    """MinimumBoundingEnvelope (gis_analysis/minimum_bounding_envelope.rs):
    per-feature bounding box."""
    return verts.groupBy("fid").agg(
        F.min("x").alias("xmin"), F.min("y").alias("ymin"),
        F.max("x").alias("xmax"), F.max("y").alias("ymax"),
    )


def reinitialize_attribute_table(verts: DataFrame) -> DataFrame:
    """ReinitializeAttributeTable (data_tools/reinitialize_attribute_table.rs):
    strip every attribute, keep sequential FIDs."""
    fids = verts.select("fid").distinct()
    # sequential-FID contract: total order over the per-FEATURE relation
    # (one row per fid), feature-scale not vertex-scale
    return fids.select(
        F.row_number().over(Window.orderBy("fid")).cast("long").alias("new_fid"),
        F.col("fid").alias("orig_fid"),
    )


def polygons_to_lines(verts: DataFrame) -> DataFrame:
    """PolygonsToLines (data_tools/polygons_to_lines.rs): ring paths
    become polylines; per part the vertex count and path length."""
    w = Window.partitionBy("fid", "part").orderBy("idx")
    nx, ny = F.lead("x").over(w), F.lead("y").over(w)
    seg = F.when(
        nx.isNotNull(),
        F.sqrt((nx - F.col("x")) * (nx - F.col("x")) + (ny - F.col("y")) * (ny - F.col("y"))),
    ).otherwise(F.lit(0.0))
    return verts.withColumn("_s", seg).groupBy("fid", "part").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("_s").alias("length"),
    )


def lines_to_polygons(verts: DataFrame) -> DataFrame:
    """LinesToPolygons (data_tools/lines_to_polygons.rs): close each open
    path; per part the closed vertex count and the closure vertex (the
    first point, which the closing edge returns to)."""
    mx = verts.groupBy("fid", "part").agg(F.max("idx").alias("_mx"))
    open_path = verts.join(mx, ["fid", "part"]).where(F.col("idx") < F.col("_mx"))
    first = open_path.where(F.col("idx") == 0).select(
        "fid", "part", F.col("x").alias("close_x"), F.col("y").alias("close_y")
    )
    return (
        open_path.groupBy("fid", "part")
        .agg((F.count(F.lit(1)) + F.lit(1)).alias("n_vertices_closed"))
        .join(first, ["fid", "part"])
    )


def export_table_to_csv(table: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """ExportTableToCsv (data_tools/export_table_to_csv.rs): attribute
    table -> CSV lines, formatted executor-side by Spark's CSV codec
    (the same code path the file sink uses, minus the filesystem).
    Returns a one-column ``line`` DataFrame."""
    if cols:
        table = table.select(*cols)
    return table.select(F.to_csv(F.struct(*table.columns)).alias("line"))


def csv_points_to_vector(lines: DataFrame, schema: str) -> DataFrame:
    """CsvPointsToVector (data_tools/csv_points_to_vector.rs): parse CSV
    lines (one-column ``line`` DataFrame) into a typed point layer via
    an executor-side from_csv with the given DDL ``schema``."""
    parsed = lines.select(F.from_csv(F.col("line"), schema).alias("p"))
    return parsed.select("p.*")


def add_point_coordinates_to_table(points: DataFrame,
                                   attr_cols: list[str] | None = None) -> DataFrame:
    """AddPointCoordinatesToTable (data_tools/add_point_coordinates_to_table.rs):
    append the XY coordinate columns to the attribute table."""
    attrs = attr_cols if attr_cols is not None else [
        c for c in points.columns if c not in ("x", "y")
    ]
    return points.select(*attrs, "x", "y")
