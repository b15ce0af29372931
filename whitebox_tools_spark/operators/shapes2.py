"""Per-feature / per-patch shape indices, batch 2 (SURVEY.md §2.4 +
§2.3 raster patch ops).

Vector indices run as array-column pandas UDFs over the relational layer
form (one row per part, open vertex rings); raster patch ops are
class-keyed aggregations / stencils.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.kernels.geometry import polygon_area
from whitebox_tools_spark.kernels.hull import convex_hull, smallest_enclosing_circle
from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.operators.measures import part_area


def _hull_area_fn(xs: pd.Series, ys: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(xs, ys):
        pts = np.column_stack([np.asarray(x), np.asarray(y)])
        out.append(float(polygon_area(convex_hull(pts))))
    return pd.Series(out)


def _mbc_area_fn(xs: pd.Series, ys: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(xs, ys):
        pts = np.column_stack([np.asarray(x), np.asarray(y)])
        _cx, _cy, r = smallest_enclosing_circle(pts)
        out.append(math.pi * r * r)
    return pd.Series(out)


def _hull_area_udf(xs, ys):
    # udf built lazily: pandas_udf needs an active session to parse DDL
    return F.pandas_udf(_hull_area_fn, "double")(xs, ys)


def _mbc_area_udf(xs, ys):
    return F.pandas_udf(_mbc_area_fn, "double")(xs, ys)


def hole_proportion(layer: DataFrame) -> DataFrame:
    """HoleProportion (hole_proportion.rs:190-215): per feature,
    sum(hole part areas) / sum(shell part areas)."""
    m = layer.select(
        "fid", "is_hole", part_area(F.col("xs"), F.col("ys")).alias("area")
    )
    g = m.groupBy("fid").agg(
        F.sum(F.when(F.col("is_hole"), F.col("area")).otherwise(0.0)).alias("holes"),
        F.sum(F.when(~F.col("is_hole"), F.col("area")).otherwise(0.0)).alias("shells"),
    )
    return g.select("fid", (F.col("holes") / F.col("shells")).alias("hole_prop"))


def shape_complexity_index(layer: DataFrame) -> DataFrame:
    """ShapeComplexityIndex (shape_complexity_index.rs:210-238):
    1 - (shell areas - hole areas) / sum(per-shell convex hull areas)."""
    m = layer.select(
        "fid",
        "is_hole",
        part_area(F.col("xs"), F.col("ys")).alias("area"),
        F.when(~F.col("is_hole"), _hull_area_udf("xs", "ys")).otherwise(0.0).alias(
            "hull_area"
        ),
    )
    g = m.groupBy("fid").agg(
        F.sum(
            F.when(F.col("is_hole"), -F.col("area")).otherwise(F.col("area"))
        ).alias("area"),
        F.sum("hull_area").alias("hull_area"),
    )
    return g.select("fid", (1.0 - F.col("area") / F.col("hull_area")).alias("sci"))


def related_circumscribing_circle(layer: DataFrame) -> DataFrame:
    """RelatedCircumscribingCircle (related_circumscribing_circle.rs
    :206-231): 1 - area / sum(per-shell minimum-enclosing-circle areas)."""
    m = layer.select(
        "fid",
        "is_hole",
        part_area(F.col("xs"), F.col("ys")).alias("area"),
        F.when(~F.col("is_hole"), _mbc_area_udf("xs", "ys")).otherwise(0.0).alias(
            "circ_area"
        ),
    )
    g = m.groupBy("fid").agg(
        F.sum(
            F.when(F.col("is_hole"), -F.col("area")).otherwise(F.col("area"))
        ).alias("area"),
        F.sum("circ_area").alias("circ_area"),
    )
    return g.select("fid", (1.0 - F.col("area") / F.col("circ_area")).alias("rcc"))


def linearity_index(layer_closed: DataFrame) -> DataFrame:
    """LinearityIndex (linearity_index.rs:210-250): r^2 of the x/y
    regression over the FIRST part's vertices (closing vertex included),
    coordinates shifted by the record's half bbox range (the reference's
    literal midpoint quirk)."""
    bbox = layer_closed.select(
        "fid", F.explode(F.arrays_zip("xs_c", "ys_c")).alias("v")
    ).groupBy("fid").agg(
        ((F.max("v.xs_c") - F.min("v.xs_c")) / 2.0).alias("midx"),
        ((F.max("v.ys_c") - F.min("v.ys_c")) / 2.0).alias("midy"),
    )
    first = layer_closed.where(F.col("part") == 0).select(
        "fid", F.explode(F.arrays_zip("xs_c", "ys_c")).alias("v")
    )
    pts = first.join(bbox, "fid").select(
        "fid",
        (F.col("v.xs_c") - F.col("midx")).alias("x"),
        (F.col("v.ys_c") - F.col("midy")).alias("y"),
    )
    a = pts.groupBy("fid").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    sxx = F.col("sxx") / F.col("n") - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))
    syy = F.col("syy") / F.col("n") - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))
    sxy = F.col("sxy") / F.col("n") - (F.col("sx") * F.col("sy")) / (F.col("n") * F.col("n"))
    r2 = F.when(
        F.sqrt(sxx * syy) != 0.0, (sxy / F.sqrt(sxx * syy)) * (sxy / F.sqrt(sxx * syy))
    ).otherwise(0.0)
    return a.select("fid", r2.alias("linearity"))


# ----------------------------------------------------- raster patch ops


def centroid_raster(raster: DataFrame) -> DataFrame:
    """Centroid (gis_analysis/centroid.rs:209-233): per positive class,
    the cell at (sum(rows)//n, sum(cols)//n); output (row, col, value)."""
    pos = raster.where(F.col("value") > 0.0)
    g = pos.groupBy("value").agg(
        F.floor(F.sum("row") / F.count(F.lit(1))).cast("long").alias("row"),
        F.floor(F.sum("col") / F.count(F.lit(1))).cast("long").alias("col"),
    )
    return g.select("row", "col", "value")


def edge_proportion(raster: DataFrame, cfg: GridConfig, tile_size: int = 128) -> DataFrame:
    """EdgeProportion (edge_proportion.rs): per class (value > 0), the
    proportion of its cells that touch a different value (missing / out
    of grid counts as different); each cell is painted with its class
    proportion."""
    D8_DX = (1, 1, 1, 0, -1, -1, -1, 0)
    D8_DY = (-1, 0, 1, 1, 1, 0, -1, -1)

    def stencil(block, valid, base_r, base_c, cfg_):
        edge = np.zeros_like(valid)
        for dx, dy in zip(D8_DX, D8_DY):
            size_r, size_c = block.shape
            sh = np.full_like(block, np.nan)
            vm = np.zeros_like(valid)
            src_r = slice(max(dy, 0), size_r + min(dy, 0))
            dst_r = slice(max(-dy, 0), size_r + min(-dy, 0))
            src_c = slice(max(dx, 0), size_c + min(dx, 0))
            dst_c = slice(max(-dx, 0), size_c + min(-dx, 0))
            sh[dst_r, dst_c] = block[src_r, src_c]
            vm[dst_r, dst_c] = valid[src_r, src_c]
            with np.errstate(invalid="ignore"):
                edge |= ~vm | (vm & (sh != block))
        return np.where(valid & (block > 0), edge.astype(np.float64), np.nan)

    flags = focal_apply(raster, cfg, stencil, 1, tile_size)
    per = (
        raster.where(F.col("value") > 0.0)
        .join(flags.withColumnRenamed("value", "is_edge"), ["row", "col"])
        .groupBy("value")
        .agg(
            (F.sum("is_edge") / F.count(F.lit(1))).alias("prop")
        )
    )
    return (
        raster.where(F.col("value") > 0.0)
        .join(F.broadcast(per), "value")
        .select("row", "col", F.col("prop").alias("value"))
    )


def find_patch_edge_cells(
    raster: DataFrame, cfg: GridConfig, tile_size: int = 128
) -> DataFrame:
    """FindPatchOrClassEdgeCells (find_patch_edge_cells.rs:195-210):
    value where the positive cell touches a different value (missing /
    out of grid counts as different), else 0."""
    D8_DX = (1, 1, 1, 0, -1, -1, -1, 0)
    D8_DY = (-1, 0, 1, 1, 1, 0, -1, -1)

    def stencil(block, valid, base_r, base_c, cfg_):
        edge = np.zeros_like(valid)
        for dx, dy in zip(D8_DX, D8_DY):
            size_r, size_c = block.shape
            sh = np.full_like(block, np.nan)
            vm = np.zeros_like(valid)
            src_r = slice(max(dy, 0), size_r + min(dy, 0))
            dst_r = slice(max(-dy, 0), size_r + min(-dy, 0))
            src_c = slice(max(dx, 0), size_c + min(dx, 0))
            dst_c = slice(max(-dx, 0), size_c + min(-dx, 0))
            sh[dst_r, dst_c] = block[src_r, src_c]
            vm[dst_r, dst_c] = valid[src_r, src_c]
            with np.errstate(invalid="ignore"):
                edge |= ~vm | (vm & (sh != block))
        return np.where(
            valid & (block > 0), np.where(edge, block, 0.0), np.nan
        )

    return focal_apply(raster, cfg, stencil, 1, tile_size)


def shape_complexity_index_raster(raster: DataFrame) -> DataFrame:
    """ShapeComplexityIndexRaster (gis_analysis/shape_complexity_raster.rs
    :230-295, exact): per object bin (floor(value - raster min)), the
    number of horizontal + vertical transect entries (cells whose left /
    upper neighbour differs, missing neighbour counts as an entry)
    divided by (bbox height + bbox width); painted onto object cells,
    0.0 elsewhere. Pure joins + one per-bin aggregate."""
    mn = raster.agg(F.min("value").alias("m"))
    pos = raster.join(F.broadcast(mn), F.lit(True)).select(
        "row", "col", "value", F.floor(F.col("value") - F.col("m")).alias("bin")
    ).where(F.col("value") > 0.0)
    left = raster.select(
        F.col("row").alias("row"), (F.col("col") + 1).alias("col"),
        F.col("value").alias("lv"),
    )
    up = raster.select(
        (F.col("row") + 1).alias("row"), F.col("col").alias("col"),
        F.col("value").alias("uv"),
    )
    marked = (
        pos.join(left, ["row", "col"], "left")
        .join(up, ["row", "col"], "left")
        .select(
            "row", "col", "bin",
            (F.col("lv").isNull() | (F.col("lv") != F.col("value"))).cast("int").alias("eh"),
            (F.col("uv").isNull() | (F.col("uv") != F.col("value"))).cast("int").alias("ev"),
        )
    )
    per = marked.groupBy("bin").agg(
        (F.sum("eh") + F.sum("ev")).alias("freq"),
        (F.max("row") - F.min("row") + 1 + F.max("col") - F.min("col") + 1).alias("extent"),
    ).select("bin", (F.col("freq") / F.col("extent")).alias("idx"))
    out_pos = pos.join(F.broadcast(per), "bin").select(
        "row", "col", F.col("idx").alias("value")
    )
    bg = raster.where(~(F.col("value") > 0.0)).select(
        "row", "col", F.lit(0.0).alias("value")
    )
    return out_pos.unionByName(bg)
