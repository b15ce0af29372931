"""Query catalog: per-tool oracle rows for the lidar utility family
(SURVEY.md §2.7; reference lidar_analysis one-file-per-tool) — the tools
previously covered only as registry expr one-liners.

Points are the derived (x, y, z, cls) cloud over the documents table;
scan angle is synthesized with integer arithmetic ((doc_id*7) % 181 -
90) so it is bit-identical in Spark and SQL. All rows are exact except
the per-cell mean (round-6: double sum order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import GRID, _IN_GRID_SQL, _COL_SQL, _PTS_CTE, _ROW_SQL
from whitebox_tools_spark.catalog_local import _geo, _r
from whitebox_tools_spark.operators import lidar_utils as lu
from whitebox_tools_spark.operators.raster import rowcol_cols

CELL_AREA = GRID.res_x * GRID.res_y

_CELL_CTE = f"""cells AS (
  SELECT doc_id, x, y, z, cls,
         {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col
  FROM pts WHERE {_IN_GRID_SQL})"""


def _cells_df(spark, sf_dir) -> DataFrame:
    geo = _geo(spark, sf_dir)
    row, col = rowcol_cols(GRID)
    out = geo.select(
        "doc_id", "x", "y", "z", "cls",
        row.alias("row"), col.alias("col"),
    )
    return out.where(
        (F.col("row") >= 0) & (F.col("row") < GRID.rows)
        & (F.col("col") >= 0) & (F.col("col") < GRID.cols)
    )


def q_filter_classes(spark, sf_dir):
    """FilterLidarClasses (filter_lidar_classes.rs): keep points whose
    class is in the exclusion-complement set."""
    pts = _geo(spark, sf_dir).select("doc_id", "x", "y", "z", "cls")
    return lu.filter_lidar_classes(pts, [2, 3, 5])


_SCAN_ANGLE = "(CAST((doc_id * 7) % 181 AS DOUBLE) - 90.0)"


def q_filter_scan_angles(spark, sf_dir):
    """FilterLidarScanAngles (filter_lidar_scan_angles.rs): band-pass on
    the (synthetic, integer-derived) scan angle."""
    ang = (F.pmod(F.col("doc_id") * F.lit(7), F.lit(181)).cast("double") - F.lit(90.0))
    pts = _geo(spark, sf_dir).withColumn("scan_angle", ang).select(
        "doc_id", "x", "y", "z", "scan_angle"
    )
    return lu.filter_lidar_scan_angles(pts, 15.0)


def q_elevation_slice(spark, sf_dir):
    """LidarElevationSlice (lidar_elevation_slice.rs): z in [minz, maxz)."""
    pts = _geo(spark, sf_dir).select("doc_id", "x", "y", "z")
    return lu.lidar_elevation_slice(pts, 20.0, 60.0)


def q_lidar_histogram(spark, sf_dir):
    """LidarHistogram (lidar_histogram.rs): elevation histogram."""
    return lu.lidar_histogram(_geo(spark, sf_dir), 10.0)


def q_lidar_info(spark, sf_dir):
    """LidarInfo (lidar_info.rs): header-style summary row."""
    return lu.lidar_info(_geo(spark, sf_dir))


def q_point_density(spark, sf_dir):
    """LidarPointDensity (lidar_point_density.rs): per-cell points/area."""
    return lu.lidar_point_density(_cells_df(spark, sf_dir), CELL_AREA)


def q_point_stats(spark, sf_dir):
    """LidarPointStats (lidar_point_stats.rs): per-cell n/min/max/mean z."""
    return lu.lidar_point_stats(_cells_df(spark, sf_dir))


def q_tile_footprint(spark, sf_dir):
    """LidarTileFootprint (lidar_tile_footprint.rs): per 250m tile, point
    count + bbox (the convex-hull output degenerates to the bbox for the
    footprint-summary contract here)."""
    return lu.lidar_tile_footprint(_geo(spark, sf_dir), 250.0)


def q_flightline_overlap(spark, sf_dir):
    """FlightlineOverlap (flightline_overlap.rs): per cell, number of
    distinct flightlines (synthetic flightline = doc_id % 4)."""
    cells = _cells_df(spark, sf_dir).withColumn("fl", F.pmod(F.col("doc_id"), F.lit(4)))
    return lu.flightline_overlap(cells)


def q_lidar_colourize(spark, sf_dir):
    """LidarColourize (lidar_colourize.rs): attach (r, g, b) sampled from
    the registered image rasters at each point's cell."""
    return lu.lidar_colourize(
        _cells_df(spark, sf_dir),
        _r(spark, sf_dir, "last"), _r(spark, sf_dir, "min"), _r(spark, sf_dir, "max"),
    )


def q_lowest_highest_points(spark, sf_dir):
    """FindLowestOrHighestPoints (find_lowest_or_highest_points.rs): the
    argmin and argmax elevation points (doc_id tie-break)."""
    g = _geo(spark, sf_dir).select("doc_id", "x", "y", "z")
    return lu.find_lowest_or_highest_points(g)


def q_add_point_coords(spark, sf_dir):
    """AddPointCoordinatesToTable (add_point_coordinates_to_table.rs):
    append XY columns to the attribute table."""
    from whitebox_tools_spark.operators.vector_structure import (
        add_point_coordinates_to_table,
    )

    pts = _geo(spark, sf_dir).select("doc_id", "n_chars", "x", "y")
    return add_point_coordinates_to_table(pts, ["doc_id", "n_chars"])


def q_attribute_histogram(spark, sf_dir):
    """AttributeHistogram (attribute_histogram.rs) over orders.o_totalprice."""
    from whitebox_tools_spark.sources.tables import load

    return lu.attribute_histogram(load(spark, sf_dir, "orders"), "o_totalprice", 10000.0)


def q_attribute_scattergram(spark, sf_dir):
    """AttributeScattergram (attribute_scattergram.rs): paired attribute
    series (x = o_totalprice, y = o_custkey)."""
    from whitebox_tools_spark.sources.tables import load

    return lu.attribute_scattergram(
        load(spark, sf_dir, "orders"), "o_orderkey", "o_totalprice", "o_custkey"
    )


QUERIES = {
    "filter_lidar_classes": q_filter_classes,
    "filter_lidar_scan_angles": q_filter_scan_angles,
    "lidar_elevation_slice": q_elevation_slice,
    "lidar_histogram": q_lidar_histogram,
    "lidar_info": q_lidar_info,
    "lidar_point_density": q_point_density,
    "lidar_point_stats": q_point_stats,
    "lidar_tile_footprint": q_tile_footprint,
    "flightline_overlap": q_flightline_overlap,
    "lidar_colourize": q_lidar_colourize,
    "lowest_highest_points": q_lowest_highest_points,
    "add_point_coords": q_add_point_coords,
    "attribute_histogram": q_attribute_histogram,
    "attribute_scattergram": q_attribute_scattergram,
}

_R_CTE = """r{n} AS (SELECT {row} AS row, {col} AS col, {agg} AS value
      FROM pts WHERE {ing} GROUP BY row, col)"""


def _rcte(n, agg):
    return _R_CTE.format(n=n, row=_ROW_SQL, col=_COL_SQL, agg=agg, ing=_IN_GRID_SQL)


ORACLE_SQL = {
    "filter_lidar_classes": f"""
WITH {_PTS_CTE}
SELECT doc_id, x, y, z, cls FROM pts WHERE cls IN (2, 3, 5)
""",
    "filter_lidar_scan_angles": f"""
WITH {_PTS_CTE}
SELECT doc_id, x, y, z, {_SCAN_ANGLE} AS scan_angle
FROM pts WHERE abs({_SCAN_ANGLE}) <= 15.0
""",
    "lidar_elevation_slice": f"""
WITH {_PTS_CTE}
SELECT doc_id, x, y, z FROM pts WHERE z >= 20.0 AND z < 60.0
""",
    "lidar_histogram": f"""
WITH {_PTS_CTE}
SELECT CAST(floor(z / 10.0) AS BIGINT) AS bin, count(*) AS n
FROM pts GROUP BY 1
""",
    "lidar_info": f"""
WITH {_PTS_CTE}
SELECT count(*) AS n_points,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y,
       min(z) AS min_z, max(z) AS max_z
FROM pts
""",
    "lidar_point_density": f"""
WITH {_PTS_CTE}, {_CELL_CTE}
SELECT cell_row, cell_col,
       CAST(count(*) AS DOUBLE) / {CELL_AREA!r} AS density
FROM cells GROUP BY cell_row, cell_col
""",
    "lidar_point_stats": f"""
WITH {_PTS_CTE}, {_CELL_CTE}
SELECT cell_row, cell_col, count(*) AS n,
       min(z) AS min_z, max(z) AS max_z, round(avg(z), 6) AS mean_z
FROM cells GROUP BY cell_row, cell_col
""",
    "lidar_tile_footprint": f"""
WITH {_PTS_CTE}
SELECT CAST(floor(y / 250.0) AS BIGINT) AS tile_row,
       CAST(floor(x / 250.0) AS BIGINT) AS tile_col,
       count(*) AS n,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y
FROM pts GROUP BY 1, 2
""",
    "flightline_overlap": f"""
WITH {_PTS_CTE}, {_CELL_CTE}
SELECT cell_row, cell_col, count(DISTINCT doc_id % 4) AS n_flightlines
FROM cells GROUP BY cell_row, cell_col
""",
    "lidar_colourize": f"""
WITH {_PTS_CTE}, {_CELL_CTE},
{_rcte("r", "arg_max(z, doc_id)")},
{_rcte("g", "min(z)")},
{_rcte("b", "max(z)")}
SELECT c.doc_id, c.x, c.y, rr.value AS r, rg.value AS g, rb.value AS b
FROM cells c
JOIN rr ON rr.row = c.cell_row AND rr.col = c.cell_col
JOIN rg ON rg.row = c.cell_row AND rg.col = c.cell_col
JOIN rb ON rb.row = c.cell_row AND rb.col = c.cell_col
""",
    "lowest_highest_points": f"""
WITH {_PTS_CTE}
SELECT 'lowest' AS kind, doc_id, x, y, z FROM pts
QUALIFY row_number() OVER (ORDER BY z, doc_id) = 1
UNION ALL
SELECT 'highest' AS kind, doc_id, x, y, z FROM pts
QUALIFY row_number() OVER (ORDER BY z DESC, doc_id DESC) = 1
""",
    "add_point_coords": f"""
WITH {_PTS_CTE}
SELECT p.doc_id, d.n_chars, p.x, p.y
FROM pts p JOIN documents d ON d.doc_id = p.doc_id
""",
    "attribute_histogram": """
SELECT CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin, count(*) AS n
FROM orders GROUP BY 1
""",
    "attribute_scattergram": """
SELECT o_orderkey AS key, o_totalprice AS sx, CAST(o_custkey AS DOUBLE) AS sy
FROM orders
""",
}
