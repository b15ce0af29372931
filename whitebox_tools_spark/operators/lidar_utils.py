"""LiDAR utility tools over the flat point table (SURVEY.md §2.7;
reference lidar_analysis one-file-per-tool: filter_lidar_classes.rs,
filter_lidar_scan_angles.rs, lidar_elevation_slice.rs,
lidar_histogram.rs, lidar_info.rs, lidar_point_density.rs,
lidar_point_stats.rs, lidar_tile_footprint.rs, flightline_overlap.rs,
lidar_colourize.rs, find_lowest_or_highest_points.rs) plus the
attribute-plot pair (attribute_histogram.rs, attribute_scattergram.rs).

Points are one row each (the LasFile PointData layout flattened to
columns, src/lidar/point_data.rs:183-195). Every operator is a filter,
projection, or partial-aggregable groupBy — single-shuffle plans whose
state is per-cell/per-bin, never per-point, so they hold at 10^12
points. The catalog rows in catalog_lidarx.py call these functions
directly, so the DuckDB oracles certify this code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "filter_lidar_classes",
    "filter_lidar_scan_angles",
    "lidar_elevation_slice",
    "lidar_histogram",
    "lidar_info",
    "lidar_point_density",
    "lidar_point_stats",
    "lidar_tile_footprint",
    "flightline_overlap",
    "lidar_colourize",
    "find_lowest_or_highest_points",
    "attribute_histogram",
    "attribute_scattergram",
]


def filter_lidar_classes(points: DataFrame, keep_classes: list[int],
                         cls_col: str = "cls") -> DataFrame:
    """FilterLidarClasses (filter_lidar_classes.rs): keep points whose
    classification is in the exclusion-complement set."""
    return points.where(F.col(cls_col).isin(*keep_classes))


def filter_lidar_scan_angles(points: DataFrame, max_abs_angle: float,
                             angle_col: str = "scan_angle") -> DataFrame:
    """FilterLidarScanAngles (filter_lidar_scan_angles.rs): band-pass on
    the scan angle (|angle| <= threshold)."""
    return points.where(F.abs(F.col(angle_col)) <= F.lit(float(max_abs_angle)))


def lidar_elevation_slice(points: DataFrame, minz: float, maxz: float) -> DataFrame:
    """LidarElevationSlice (lidar_elevation_slice.rs): z in [minz, maxz)."""
    return points.where(
        (F.col("z") >= F.lit(float(minz))) & (F.col("z") < F.lit(float(maxz)))
    )


def lidar_histogram(points: DataFrame, bin_width: float,
                    field: str = "z") -> DataFrame:
    """LidarHistogram (lidar_histogram.rs): fixed-width histogram of an
    attribute (default elevation): ``(bin, n)`` — the same binning as
    :func:`attribute_histogram`, delegated so the logic lives once."""
    return attribute_histogram(points, field, bin_width)


def lidar_info(points: DataFrame) -> DataFrame:
    """LidarInfo (lidar_info.rs): header-style one-row summary (count +
    XYZ bbox), the distributed analogue of the LasHeader dump."""
    return points.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("x").alias("min_x"), F.max("x").alias("max_x"),
        F.min("y").alias("min_y"), F.max("y").alias("max_y"),
        F.min("z").alias("min_z"), F.max("z").alias("max_z"),
    )


def lidar_point_density(cells: DataFrame, cell_area: float) -> DataFrame:
    """LidarPointDensity (lidar_point_density.rs): per-cell points/area
    over a point table already carrying (row, col) cell ids."""
    return (
        cells.groupBy("row", "col")
        .agg((F.count(F.lit(1)).cast("double") / F.lit(float(cell_area))).alias("density"))
        .select(F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "density")
    )


def lidar_point_stats(cells: DataFrame) -> DataFrame:
    """LidarPointStats (lidar_point_stats.rs): per-cell n/min/max/mean z
    (mean rounded to 6 dp — double sum order is partition-dependent)."""
    return (
        cells.groupBy("row", "col")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
            F.round(F.avg("z"), 6).alias("mean_z"),
        )
        .select(
            F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
            "n", "min_z", "max_z", "mean_z",
        )
    )


def lidar_tile_footprint(points: DataFrame, tile_size: float) -> DataFrame:
    """LidarTileFootprint (lidar_tile_footprint.rs): per tile, point
    count + bbox (the convex-hull output degenerates to the bbox for
    the footprint-summary contract)."""
    t = points.select(
        "x", "y",
        F.floor(F.col("x") / F.lit(float(tile_size))).alias("tile_col"),
        F.floor(F.col("y") / F.lit(float(tile_size))).alias("tile_row"),
    )
    return t.groupBy("tile_row", "tile_col").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("min_x"), F.max("x").alias("max_x"),
        F.min("y").alias("min_y"), F.max("y").alias("max_y"),
    )


def flightline_overlap(cells: DataFrame, fl_col: str = "fl") -> DataFrame:
    """FlightlineOverlap (flightline_overlap.rs): per cell, the number of
    distinct flightlines (``fl_col``, usually point_source_id) seen."""
    return (
        cells.groupBy("row", "col")
        .agg(F.count_distinct(fl_col).alias("n_flightlines"))
        .select(
            F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
            "n_flightlines",
        )
    )


def lidar_colourize(cells: DataFrame, red: DataFrame, green: DataFrame,
                    blue: DataFrame) -> DataFrame:
    """LidarColourize (lidar_colourize.rs): attach (r, g, b) sampled from
    the registered image rasters at each point's cell — three cell-id
    equi-joins (broadcastable when the image is small)."""
    out = cells
    for name, r in (("r", red), ("g", green), ("b", blue)):
        out = out.join(
            r.select("row", "col", F.col("value").alias(name)), ["row", "col"], "inner"
        )
    return out.select("doc_id", "x", "y", "r", "g", "b")


def find_lowest_or_highest_points(points: DataFrame,
                                  id_col: str = "doc_id") -> DataFrame:
    """FindLowestOrHighestPoints (find_lowest_or_highest_points.rs): the
    argmin and argmax elevation points (id tie-break), via map-side
    combinable min_by/max_by — one pass, no sort."""
    key = F.struct("z", id_col)
    pt = F.struct(id_col, "x", "y", "z")
    lo = points.agg(F.min_by(pt, key).alias("p")).select(
        F.lit("lowest").alias("kind"), f"p.{id_col}", "p.x", "p.y", "p.z"
    )
    hi = points.agg(F.max_by(pt, key).alias("p")).select(
        F.lit("highest").alias("kind"), f"p.{id_col}", "p.x", "p.y", "p.z"
    )
    return lo.unionAll(hi)


def attribute_histogram(table: DataFrame, field: str, bin_width: float) -> DataFrame:
    """AttributeHistogram (attribute_histogram.rs): fixed-width histogram
    of one attribute column: ``(bin, n)``."""
    return (
        table.groupBy(F.floor(F.col(field) / F.lit(float(bin_width))).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def attribute_scattergram(table: DataFrame, key: str, xf: str, yf: str) -> DataFrame:
    """AttributeScattergram (attribute_scattergram.rs): the paired
    attribute series ``(key, sx, sy)`` behind the plot."""
    return table.select(
        F.col(key).alias("key"),
        F.col(xf).alias("sx"),
        F.col(yf).cast("double").alias("sy"),
    )
