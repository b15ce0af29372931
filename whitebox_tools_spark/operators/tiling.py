"""Tile assignment + population filter (LidarTile family).

Parity contract: src/tools/lidar_analysis/lidar_tile.rs:257-282 (grid
arithmetic, grid-relative col/row) and :314-319 (keep tile iff
count > min_points, min_points clamped >= 2). See kernels/tile.py for the
formulas.

Scale design:
- tile/col/row are pure JVM column expressions (whole-stage codegen);
- the dataset extent is one cheap agg (or passed in when known — at 100 TB
  the extent is metadata you already have);
- the population filter computes per-tile counts (shuffle on tile id — the
  count table is tiny, #tiles <= 32767 in the reference) and broadcasts it
  back, so the big side is filtered map-side with NO second shuffle;
- the final write partitions by tile id (one output per tile, exactly the
  reference's one-LAS-per-tile layout).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compute_extent(df: DataFrame, x: str = "x", y: str = "y") -> tuple:
    r = df.agg(
        F.min(x).alias("min_x"),
        F.max(x).alias("max_x"),
        F.min(y).alias("min_y"),
        F.max(y).alias("max_y"),
    ).collect()[0]
    return r["min_x"], r["max_x"], r["min_y"], r["max_y"]


def assign_tiles(
    df: DataFrame,
    origin_x: float = 0.0,
    origin_y: float = 0.0,
    width: float = 250.0,
    height: float = 250.0,
    extent: tuple | None = None,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Adds ``tile_col``, ``tile_row``, ``tile`` columns (grid-relative)."""
    min_x, max_x, min_y, max_y = extent or compute_extent(df, x, y)
    start_x = math.floor((min_x - origin_x) / width)
    end_x = math.ceil((max_x - origin_x) / width)
    start_y = math.floor((min_y - origin_y) / height)
    end_y = math.ceil((max_y - origin_y) / height)
    cols = abs(end_x - start_x)

    tile_col = F.floor((F.col(x) - F.lit(origin_x)) / F.lit(width) - F.lit(start_x))
    tile_row = F.floor((F.col(y) - F.lit(origin_y)) / F.lit(height) - F.lit(start_y))
    return (
        df.withColumn("tile_col", tile_col.cast("long"))
        .withColumn("tile_row", tile_row.cast("long"))
        .withColumn("tile", (F.col("tile_row") * F.lit(cols) + F.col("tile_col")))
    )


def tile_counts(df: DataFrame) -> DataFrame:
    return df.groupBy("tile").agg(F.count(F.lit(1)).alias("n_points"))


def filter_populated(df: DataFrame, min_points: int = 2) -> DataFrame:
    """Keep rows of tiles with count > clamp(min_points, 2).

    The count table is tiny (bounded by #tiles); broadcast it so the big
    side joins map-side (no shuffle of the document table).
    """
    min_points = max(min_points, 2)
    keep = tile_counts(df).where(F.col("n_points") > min_points).select("tile")
    return df.join(F.broadcast(keep), "tile", "left_semi")


def lidar_tile(
    df: DataFrame,
    origin_x: float = 0.0,
    origin_y: float = 0.0,
    width: float = 250.0,
    height: float = 250.0,
    min_points: int = 2,
    extent: tuple | None = None,
) -> DataFrame:
    """Full LidarTile pipeline: assign -> population filter."""
    return filter_populated(
        assign_tiles(df, origin_x, origin_y, width, height, extent), min_points
    )


def write_tiles(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """One output partition dir per surviving tile (reference: one LAS/tile)."""
    df.write.partitionBy("tile").mode("overwrite").format(fmt).save(path)
