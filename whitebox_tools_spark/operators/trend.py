"""Trend surface fitting + per-class radius of gyration + stream extraction.

Parity contracts:
- TrendSurface (math_stat_analysis/trend_surface.rs, order-1 plane):
  least-squares z = b0 + b1*x + b2*y. The reference fits through
  ``polynomial_regression_2d.rs`` (internally normalized basis); the
  fitted SURFACE is identical — we solve the plain normal equations via
  Cramer's rule (the same closed form is inlined in the SQL oracle) and
  emit the fitted grid.
- RadiusOfGyration (gis_analysis/radius_of_gyration.rs:265-315): class
  centroid = mean cell (col, row); BUT the reference's worker ASSIGNS
  (not accumulates) the per-row squared distance, so only the LAST cell
  of each class in each row contributes to the sum, which is then divided
  by the class's TOTAL cell count and sqrt'd — transcribed exactly, quirk
  and all. Cells with z <= 0 pass through unchanged.
- ExtractStreams (stream_network_analysis/extract_streams.rs:250-258):
  flow_accum > threshold -> 1.0, else background (0 or NoData).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.gridding import GridConfig, cell_centers


def plane_coeffs(moments: dict) -> tuple[float, float, float]:
    """Cramer's-rule solution of the order-1 normal equations. The exact
    same formula text is used in the SQL oracle."""
    n, sx, sy, sz = moments["n"], moments["sx"], moments["sy"], moments["sz"]
    sxx, sxy, syy = moments["sxx"], moments["sxy"], moments["syy"]
    sxz, syz = moments["sxz"], moments["syz"]
    det = n * (sxx * syy - sxy * sxy) - sx * (sx * syy - sxy * sy) + sy * (
        sx * sxy - sxx * sy
    )
    b0 = (
        sz * (sxx * syy - sxy * sxy)
        - sx * (sxz * syy - sxy * syz)
        + sy * (sxz * sxy - sxx * syz)
    ) / det
    b1 = (
        n * (sxz * syy - sxy * syz)
        - sz * (sx * syy - sxy * sy)
        + sy * (sx * syz - sxz * sy)
    ) / det
    b2 = (
        n * (sxx * syz - sxz * sxy)
        - sx * (sx * syz - sxz * sy)
        + sz * (sx * sxy - sxx * sy)
    ) / det
    return b0, b1, b2


def trend_surface(points: DataFrame, cfg: GridConfig, x="x", y="y", z="z") -> DataFrame:
    """Order-1 trend surface of a point layer, evaluated on the grid."""
    xc, yc, zc = F.col(x), F.col(y), F.col(z)
    m = points.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(zc).alias("sz"),
        F.sum(xc * xc).alias("sxx"),
        F.sum(xc * yc).alias("sxy"),
        F.sum(yc * yc).alias("syy"),
        F.sum(xc * zc).alias("sxz"),
        F.sum(yc * zc).alias("syz"),
    ).collect()[0].asDict()
    b0, b1, b2 = plane_coeffs(m)
    cells = cell_centers(points.sparkSession, cfg)
    fitted = F.lit(b0) + F.lit(b1) * F.col("x") + F.lit(b2) * F.col("y")
    return cells.select("row", "col", fitted.alias("value"))


def radius_of_gyration(raster: DataFrame, cfg: GridConfig) -> DataFrame:
    """Per-class RoG painted back onto the raster (reference quirk
    included: only each row's last cell of a class enters the sum)."""
    cells = raster.where(F.col("value").isNotNull())
    pos = cells.where(F.col("value") > 0.0).withColumn(
        "cls", F.col("value").cast("long")
    )
    cent = pos.groupBy("cls").agg(
        (F.sum("col").cast("double") / F.count(F.lit(1))).alias("cx"),
        (F.sum("row").cast("double") / F.count(F.lit(1))).alias("cy"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    # last cell of the class in each row = max col (row-major scan)
    last = pos.groupBy("cls", "row").agg(F.max("col").alias("col"))
    d = last.join(cent, "cls")
    dx = (F.col("col").cast("double") - F.col("cx")) * F.lit(cfg.res_x)
    dy = (F.col("row").cast("double") - F.col("cy")) * F.lit(cfg.res_y)
    g = d.groupBy("cls").agg(F.sum(dx * dx + dy * dy).alias("gsum"))
    rog = (
        g.join(cent, "cls")
        .select(
            "cls",
            F.when(
                F.col("gsum") > 0.0, F.sqrt(F.col("gsum") / F.col("n_tot").cast("double"))
            )
            .otherwise(F.lit(0.0))
            .alias("rog"),
        )
    )
    out_pos = pos.join(F.broadcast(rog), "cls").select(
        "row", "col", F.col("rog").alias("value")
    )
    out_rest = cells.where(~(F.col("value") > 0.0)).select("row", "col", "value")
    return out_pos.unionByName(out_rest)


def extract_streams(
    flow_accum: DataFrame, threshold: float, zero_background: bool = True
) -> DataFrame:
    """ExtractStreams over a flow-accumulation raster."""
    bg = F.lit(0.0) if zero_background else F.lit(None).cast("double")
    return flow_accum.select(
        "row",
        "col",
        F.when(F.col("value") > threshold, F.lit(1.0)).otherwise(bg).alias("value"),
    )
