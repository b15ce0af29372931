"""Zonal statistics (group-by over a zone raster).

Parity contract (src/tools/math_stat_analysis/zonal_statistics.rs:346-436):
- zone id = round(zone_value) per cell; cells where either raster is
  NoData are skipped;
- per zone: n, total, mean = total/n, min, max, range = max - min;
- stddev = sqrt(sum((v - mean)^2) / (n - 1)) and median = exact middle
  (average of the two middles for even n) — both computed ONLY when n > 1,
  else left 0.0 (reference quirk, zonal_statistics.rs:421-435).

Spark mapping: one equi-join on (row, col) + one groupBy(zone) — both
map-side combinable except the exact median, which uses the built-in exact
``median`` (matches the reference's sorted-vector middle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zonal_statistics(data: DataFrame, zones: DataFrame) -> DataFrame:
    """``data``/``zones``: long-form rasters (row, col, value). Output one
    row per zone with the reference's statistics."""
    z = zones.select("row", "col", F.round("value").cast("long").alias("zone"))
    j = data.join(z, ["row", "col"], "inner").where(F.col("value").isNotNull())
    g = j.groupBy("zone").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.avg("value").alias("mean"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.stddev_samp("value").alias("_std"),
        F.median("value").alias("_med"),
    )
    return g.select(
        "zone",
        "n",
        "total",
        "mean",
        "min_v",
        "max_v",
        (F.col("max_v") - F.col("min_v")).alias("range_v"),
        F.when(F.col("n") > 1, F.col("_std")).otherwise(F.lit(0.0)).alias("stddev"),
        F.when(F.col("n") > 1, F.col("_med")).otherwise(F.lit(0.0)).alias("median"),
    )


def cross_tabulation(r1: DataFrame, r2: DataFrame) -> DataFrame:
    """CrossTabulation (math_stat_analysis/cross_tabulation.rs):
    contingency counts of co-located cell values."""
    a = r1.select("row", "col", F.round("value").cast("long").alias("v1"))
    b = r2.select("row", "col", F.round("value").cast("long").alias("v2"))
    return a.join(b, ["row", "col"], "inner").groupBy("v1", "v2").agg(
        F.count(F.lit(1)).alias("n")
    )


def raster_summary_stats(raster: DataFrame) -> DataFrame:
    """RasterSummaryStats: whole-raster aggregate (n, total, mean, min,
    max, stddev_samp)."""
    return raster.where(F.col("value").isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.avg("value").alias("mean"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.stddev_samp("value").alias("stddev"),
    )


def raster_histogram(raster: DataFrame, num_bins: int, lo: float, hi: float) -> DataFrame:
    """RasterHistogram: fixed-range equal-width binning."""
    width = (hi - lo) / num_bins
    b = F.least(
        F.lit(num_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col("value") - F.lit(lo)) / F.lit(width))),
    ).cast("long")
    return (
        raster.where(F.col("value").isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
