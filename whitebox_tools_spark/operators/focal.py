"""Tile-parallel focal (neighbourhood) raster transforms.

The raster long-form (row, col, value) is bucketed into TxT tiles; each
tile is joined with a ``halo`` of neighbouring cells (one 9-way explode of
edge cells — a narrow op — then ONE shuffle on the tile key), and a numpy
stencil runs per tile in ``applyInPandas``. Interior results are seam-free
by construction because every window a tile's own cells need is fully
inside its padded block.

Parity contracts:
- MeanFilter (src/tools/image_analysis/mean_filter.rs:276-400): integral
  image of (value - min_val) with NoData as 0 + a count integral; window
  ``y1 = clamp(row-mid_y-1, 0), y2 = clamp(row+mid_y, rows-1)`` (same for
  x), value = sum/n + min_val where n > 0 and the center is valid. NOTE
  the reference's clamped lower bound still subtracts the row-0/col-0
  prefix, so windows that clamp EXCLUDE row 0 / col 0 — transcribed
  exactly (quirk and all) for bit parity.
- Slope (src/tools/terrain_analysis/slope.rs:263-291, Horn 1981): 8
  neighbours in d_x/d_y order; NoData or out-of-grid neighbours take the
  center value; fx/fy third-order finite differences over 8*res_x;
  slope = degrees(atan(sqrt(fx^2+fy^2))); NoData centers stay NoData.
- AggregateRaster (src/tools/gis_analysis/aggregate_raster.rs:20-23,
  75-81): factor-k block agg (mean/sum/min/max/range) — a plain groupBy,
  included here for family completeness.
- Mosaic (src/tools/image_analysis/mosaic.rs:20-24): first raster in the
  input list wins per cell -> coalesce in input order.

Scale design: one explode (<=9x on EDGE cells only; interior cells emit
once) + one shuffle on (tile_row, tile_col). Halo width = stencil radius.
At 100 TB the tile key is also the storage partition key, so the shuffle
degenerates to an almost-local exchange.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.operators.gridding import GridConfig

_TILE_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def with_halo(raster: DataFrame, tile_size: int, halo: int) -> DataFrame:
    """Replicate each cell to every tile whose padded block needs it.

    Adds (tile_row, tile_col, is_halo). Interior cells emit exactly once;
    cells within ``halo`` of a tile edge also emit to the adjacent tile(s).
    """
    t = tile_size
    offs = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
    )
    ex = raster.select("*", F.explode(offs).alias("_o"))
    tr = (F.col("row") / t).cast("long") + F.col("_o.di")
    tc = (F.col("col") / t).cast("long") + F.col("_o.dj")
    out = (
        ex.withColumn("tile_row", tr)
        .withColumn("tile_col", tc)
        .where(
            (F.col("row") >= F.col("tile_row") * t - halo)
            & (F.col("row") < (F.col("tile_row") + 1) * t + halo)
            & (F.col("col") >= F.col("tile_col") * t - halo)
            & (F.col("col") < (F.col("tile_col") + 1) * t + halo)
            & (F.col("tile_row") >= 0)
            & (F.col("tile_col") >= 0)
        )
        .withColumn(
            "is_halo",
            ((F.col("row") / t).cast("long") != F.col("tile_row"))
            | ((F.col("col") / t).cast("long") != F.col("tile_col")),
        )
        .drop("_o")
    )
    return out


def focal_apply(
    raster: DataFrame,
    cfg: GridConfig,
    stencil: Callable[[np.ndarray, np.ndarray, int, int, GridConfig], np.ndarray],
    halo: int,
    tile_size: int = 128,
) -> DataFrame:
    """Generic tile+halo stencil runner.

    ``stencil(block, valid, base_r, base_c, cfg) -> values`` receives the
    dense padded block (np.nan where missing), its validity mask and the
    global (row, col) of block[0, 0]; must return the full block-shaped
    result; only the tile-interior cells are emitted. Cells whose result is
    NaN are dropped (NoData)."""
    t = tile_size
    haloed = with_halo(raster, t, halo)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        tile_r = int(pdf["tile_row"].iloc[0])
        tile_c = int(pdf["tile_col"].iloc[0])
        base_r = tile_r * t - halo
        base_c = tile_c * t - halo
        size = t + 2 * halo
        block = np.full((size, size), np.nan, dtype=np.float64)
        lr = pdf["row"].to_numpy(dtype=np.int64) - base_r
        lc = pdf["col"].to_numpy(dtype=np.int64) - base_c
        block[lr, lc] = pdf["value"].to_numpy(dtype=np.float64)
        valid = ~np.isnan(block)
        res = stencil(block, valid, base_r, base_c, cfg)
        # emit interior (non-halo) cells that exist in the input and are not NaN
        own = ~pdf["is_halo"].to_numpy()
        orows = pdf["row"].to_numpy(dtype=np.int64)[own]
        ocols = pdf["col"].to_numpy(dtype=np.int64)[own]
        vals = res[orows - base_r, ocols - base_c]
        keep = ~np.isnan(vals)
        return pd.DataFrame({"row": orows[keep], "col": ocols[keep], "value": vals[keep]})

    return haloed.groupBy("tile_row", "tile_col").applyInPandas(run, schema=_TILE_SCHEMA)


# ------------------------------------------------------------------ stencils


def mean_filter_stencil(filter_x: int, filter_y: int, min_val: float):
    """MeanFilter semantics (mean_filter.rs:276-400) incl. the clamped-edge
    integral quirk. min_val = the raster minimum (configs.minimum)."""
    mid_x = filter_x // 2
    mid_y = filter_y // 2

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        size_r, size_c = block.shape
        # integral images over (value - min_val), NoData as 0 — computed on
        # the padded block but indexed with GLOBAL clamped bounds.
        a = np.where(valid, block - min_val, 0.0)
        n = valid.astype(np.int64)
        S = np.zeros((size_r + 1, size_c + 1))
        N = np.zeros((size_r + 1, size_c + 1), dtype=np.int64)
        S[1:, 1:] = np.cumsum(np.cumsum(a, axis=0), axis=1)
        N[1:, 1:] = np.cumsum(np.cumsum(n, axis=0), axis=1)

        g_rows = np.arange(base_r, base_r + size_r)
        g_cols = np.arange(base_c, base_c + size_c)
        y1 = np.clip(g_rows - mid_y - 1, 0, None)
        y2 = np.clip(g_rows + mid_y, None, cfg.rows - 1)
        x1 = np.clip(g_cols - mid_x - 1, 0, None)
        x2 = np.clip(g_cols + mid_x, None, cfg.cols - 1)
        # reference window = global rows y1+1..y2 (y1's prefix subtracted)
        lo_r = np.clip(y1 + 1 - base_r, 0, size_r)
        hi_r = np.clip(y2 + 1 - base_r, 0, size_r)
        lo_c = np.clip(x1 + 1 - base_c, 0, size_c)
        hi_c = np.clip(x2 + 1 - base_c, 0, size_c)

        sum_w = (
            S[np.ix_(hi_r, hi_c)]
            - S[np.ix_(lo_r, hi_c)]
            - S[np.ix_(hi_r, lo_c)]
            + S[np.ix_(lo_r, lo_c)]
        )
        n_w = (
            N[np.ix_(hi_r, hi_c)]
            - N[np.ix_(lo_r, hi_c)]
            - N[np.ix_(hi_r, lo_c)]
            + N[np.ix_(lo_r, lo_c)]
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = sum_w / n_w + min_val
        out = np.where(valid & (n_w > 0), mean, np.nan)
        return out

    return stencil


# slope neighbour offsets, slope.rs:263-264 (d_x, d_y pairs)
_SLOPE_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_SLOPE_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def horn_fxfy(block, valid, z_factor: float, res_x: float):
    """Horn 1981 finite differences (slope.rs:263-291): the 8 neighbours
    in d_x/d_y order, NoData/out-of-grid neighbours replaced by the center
    value; returns (fx, fy) over 8*res_x."""
    size_r, size_c = block.shape
    eight_res = res_x * 8.0
    z = block
    n = []
    for dx, dy in zip(_SLOPE_DX, _SLOPE_DY):
        shifted = np.full_like(block, np.nan)
        vmask = np.zeros_like(valid)
        src_r = slice(max(dy, 0), size_r + min(dy, 0))
        dst_r = slice(max(-dy, 0), size_r + min(-dy, 0))
        src_c = slice(max(dx, 0), size_c + min(dx, 0))
        dst_c = slice(max(-dx, 0), size_c + min(-dx, 0))
        shifted[dst_r, dst_c] = block[src_r, src_c]
        vmask[dst_r, dst_c] = valid[src_r, src_c]
        n.append(np.where(vmask, shifted * z_factor, z * z_factor))
    fy = (n[6] - n[4] + 2.0 * (n[7] - n[3]) + n[0] - n[2]) / eight_res
    fx = (n[2] - n[4] + 2.0 * (n[1] - n[5]) + n[0] - n[6]) / eight_res
    return fx, fy


def slope_stencil(z_factor: float = 1.0):
    """Horn slope (slope.rs:269-291): degrees(atan(sqrt(fx^2+fy^2)))."""

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        fx, fy = horn_fxfy(block, valid, z_factor, cfg.res_x)
        out = np.degrees(np.arctan(np.sqrt(fx * fx + fy * fy)))
        return np.where(valid, out, np.nan)

    return stencil


def aspect_stencil(z_factor: float = 1.0):
    """Aspect (terrain_analysis/aspect.rs:275-282), transcribed literally
    from this reference version: fx > 0 -> 180 - degrees(atan(fy/fx)) +
    90*sign(fx); otherwise -1 (flat/negative-fx sentinel)."""

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        fx, fy = horn_fxfy(block, valid, z_factor, cfg.res_x)
        with np.errstate(invalid="ignore", divide="ignore"):
            val = 180.0 - np.degrees(np.arctan(fy / fx)) + 90.0 * np.sign(fx)
        out = np.where(fx > 0.0, val, -1.0)
        return np.where(valid, out, np.nan)

    return stencil


def hillshade_stencil(azimuth: float = 315.0, altitude: float = 30.0, z_factor: float = 1.0):
    """Hillshade (terrain_analysis/hillshade.rs:260-330): azimuth rotated
    -90deg, altitude trig precomputed; fx != 0 -> term1*(term2-term3) else
    0.5; scaled by 32767, clamped >= 0, rounded half-away-from-zero."""
    az = np.radians(azimuth - 90.0)
    alt = np.radians(altitude)
    sin_theta = np.sin(alt)
    cos_theta = np.cos(alt)

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        fx, fy = horn_fxfy(block, valid, z_factor, cfg.res_x)
        with np.errstate(invalid="ignore", divide="ignore"):
            tan_slope = np.sqrt(fx * fx + fy * fy)
            aspect = np.pi - np.arctan(fy / fx) + (np.pi / 2.0) * np.sign(fx)
            term1 = tan_slope / np.sqrt(1.0 + tan_slope * tan_slope)
            term2 = sin_theta / tan_slope
            term3 = cos_theta * np.sin(az - aspect)
            z = term1 * (term2 - term3)
        z = np.where(fx != 0.0, z, 0.5)
        z = z * 32767.0
        z = np.where(z < 0.0, 0.0, z)
        out = np.floor(z + 0.5)  # f64::round = half away from zero (z >= 0)
        return np.where(valid, out, np.nan)

    return stencil


def mean_filter(
    raster: DataFrame,
    cfg: GridConfig,
    filter_x: int = 3,
    filter_y: int = 3,
    min_val: float | None = None,
    tile_size: int = 128,
) -> DataFrame:
    if min_val is None:
        min_val = raster.agg(F.min("value")).collect()[0][0]
    halo = max(filter_x // 2, filter_y // 2) + 1
    return focal_apply(
        raster, cfg, mean_filter_stencil(filter_x, filter_y, float(min_val)), halo, tile_size
    )


def slope(
    raster: DataFrame, cfg: GridConfig, z_factor: float = 1.0, tile_size: int = 128
) -> DataFrame:
    return focal_apply(raster, cfg, slope_stencil(z_factor), 1, tile_size)


def aspect(
    raster: DataFrame, cfg: GridConfig, z_factor: float = 1.0, tile_size: int = 128
) -> DataFrame:
    return focal_apply(raster, cfg, aspect_stencil(z_factor), 1, tile_size)


def hillshade(
    raster: DataFrame,
    cfg: GridConfig,
    azimuth: float = 315.0,
    altitude: float = 30.0,
    z_factor: float = 1.0,
    tile_size: int = 128,
) -> DataFrame:
    return focal_apply(
        raster, cfg, hillshade_stencil(azimuth, altitude, z_factor), 1, tile_size
    )


# ------------------------------------------------------- block aggregation


def aggregate_raster(raster: DataFrame, factor: int, stat: str = "mean") -> DataFrame:
    """AggregateRaster: factor-k block mean/sum/min/max/range
    (aggregate_raster.rs:20-23, 75-81). Output rows/cols are input // k."""
    g = raster.groupBy(
        (F.col("row") / factor).cast("long").alias("row"),
        (F.col("col") / factor).cast("long").alias("col"),
    )
    aggs = {
        "mean": F.avg("value"),
        "sum": F.sum("value"),
        "min": F.min("value"),
        "max": F.max("value"),
        "range": F.max("value") - F.min("value"),
    }
    return g.agg(aggs[stat].alias("value"))


def mosaic(rasters: list[DataFrame]) -> DataFrame:
    """Mosaic: first raster in the list wins per cell (mosaic.rs:20-24).
    Same-grid rasters; outer-join + input-order coalesce."""
    renamed = [
        r.select("row", "col", F.col("value").alias(f"_v{i}")) for i, r in enumerate(rasters)
    ]
    joined = reduce(lambda a, b: a.join(b, ["row", "col"], "full_outer"), renamed)
    return joined.select(
        "row", "col", F.coalesce(*[F.col(f"_v{i}") for i in range(len(rasters))]).alias("value")
    )
