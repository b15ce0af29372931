"""Final easy-wins batch: flood order, lake flattening, wall raising,
stream-at-road burning, turning-bands simulation, LiDAR subset
classification, flow-length difference."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.gridding import GridConfig

TB_A1, TB_B1 = 1103515245, 12345
TB_A2, TB_B2 = 69069, 362437
_M32 = 2**32


def flood_order(raster: DataFrame, cfg: GridConfig, fill_rounds: int = 64) -> DataFrame:
    """FloodOrder (hydro_analysis/flood_order.rs): the order cells are
    popped by the priority flood — nondecreasing filled (spill)
    elevation; the reference breaks ties by heap insertion order, here
    canonically by cell id."""
    from whitebox_tools_spark.operators.hydro2 import fill_depressions

    w = fill_depressions(raster, cfg, max_rounds=fill_rounds)
    cell = F.col("row") * cfg.cols + F.col("col")
    win = Window.orderBy(F.col("value").asc(), cell.asc())
    return w.withColumn("ord", F.row_number().over(win)).select(
        "row", "col", F.col("ord").cast("double").alias("value")
    )


def flatten_lakes(raster: DataFrame, lake_rects: DataFrame, cfg: GridConfig) -> DataFrame:
    """FlattenLakes (hydro_analysis/flatten_lakes.rs): cells whose centre
    falls in a lake polygon take the lake's minimum elevation.
    ``lake_rects``: (fid, xmin, ymin, xmax, ymax) with the fixture's
    half-open box membership."""
    x = F.lit(cfg.west) + (F.col("col").cast("double") + 0.5) * cfg.res_x
    y = F.lit(cfg.north) - (F.col("row").cast("double") + 0.5) * cfg.res_y
    cells = raster.select("row", "col", "value", x.alias("x"), y.alias("y"))
    j = cells.join(
        F.broadcast(lake_rects),
        (F.col("x") >= F.col("xmin")) & (F.col("x") < F.col("xmax"))
        & (F.col("y") >= F.col("ymin")) & (F.col("y") < F.col("ymax")),
        "left",
    )
    lake_min = (
        j.where(F.col("fid").isNotNull())
        .groupBy("fid")
        .agg(F.min("value").alias("lmin"))
    )
    return (
        j.join(F.broadcast(lake_min), "fid", "left")
        .select(
            "row", "col",
            F.when(F.col("fid").isNotNull(), F.col("lmin")).otherwise(F.col("value")).alias("value"),
        )
    )


def raise_walls(
    raster: DataFrame, wall_segments: DataFrame, cfg: GridConfig, height: float = 100.0
) -> DataFrame:
    """RaiseWalls (hydro_analysis/raise_walls.rs): add ``height`` to the
    cells crossed by the wall lines (engine sampled-walk rasterization)."""
    from whitebox_tools_spark.operators.streams2 import rasterize_streams

    wall_cells = rasterize_streams(wall_segments, cfg).select("row", "col")
    return (
        raster.join(wall_cells.withColumn("_w", F.lit(1)), ["row", "col"], "left")
        .select(
            "row", "col",
            F.when(F.col("_w").isNotNull(), F.col("value") + height)
            .otherwise(F.col("value"))
            .alias("value"),
        )
    )


def burn_streams_at_roads(
    raster: DataFrame, streams_l: DataFrame, roads_l: DataFrame,
    cfg: GridConfig, burn: float = 20.0,
) -> DataFrame:
    """BurnStreamsAtRoads (hydro_analysis/burn_streams_at_roads.rs):
    decrement the DEM where streams cross roads (the exact intersection
    points' cells)."""
    from whitebox_tools_spark.operators.cost import line_intersections

    pts = line_intersections(streams_l, roads_l)
    cells = pts.select(
        F.floor((F.lit(cfg.north) - F.col("y")) / cfg.res_y).cast("long").alias("row"),
        F.floor((F.col("x") - F.lit(cfg.west)) / cfg.res_x).cast("long").alias("col"),
    ).distinct()
    return (
        raster.join(cells.withColumn("_c", F.lit(1)), ["row", "col"], "left")
        .select(
            "row", "col",
            F.when(F.col("_c").isNotNull(), F.col("value") - burn)
            .otherwise(F.col("value"))
            .alias("value"),
        )
    )


def turning_bands(spark, cfg: GridConfig, n_bands: int = 8, wavelength: float = 200.0) -> DataFrame:
    """TurningBandsSimulation (math_stat_analysis/turning_bands.rs) with
    a counter-based generator: z = sum_k cos(2 pi (x cos a_k + y sin a_k)
    / wavelength + phi_k), band angle/phase from LCG hashes of k —
    reproducible under any partitioning."""
    rows = spark.range(cfg.rows).select(F.col("id").alias("row"))
    cols = spark.range(cfg.cols).select(F.col("id").alias("col"))
    cells = rows.crossJoin(cols)
    x = F.lit(cfg.west) + (F.col("col").cast("double") + 0.5) * cfg.res_x
    y = F.lit(cfg.north) - (F.col("row").cast("double") + 0.5) * cfg.res_y
    z = None
    for k in range(n_bands):
        a = ((k * TB_A1 + TB_B1) % _M32) / float(_M32) * 2.0 * math.pi
        phi = ((k * TB_A2 + TB_B2) % _M32) / float(_M32) * 2.0 * math.pi
        t = F.cos(
            2.0 * math.pi * (x * math.cos(a) + y * math.sin(a)) / wavelength + phi
        )
        z = t if z is None else z + t
    return cells.select("row", "col", z.alias("value"))


def lidar_classify_subset(geo: DataFrame, rects: DataFrame) -> DataFrame:
    """LidarClassifySubset (lidar_analysis/lidar_classify_subset.rs):
    points inside the subset polygons get class 2, others keep their
    class. ``rects``: the fixture half-open boxes."""
    j = geo.join(
        F.broadcast(rects),
        (F.col("x") >= F.col("xmin")) & (F.col("x") < F.col("xmax"))
        & (F.col("y") >= F.col("ymin")) & (F.col("y") < F.col("ymax")),
        "left",
    )
    return j.select(
        "doc_id",
        F.when(F.col("fid").isNotNull(), F.lit(2.0))
        .otherwise(F.col("cls").cast("double"))
        .alias("cls_out"),
    )


def flow_length_diff(raster: DataFrame, cfg: GridConfig, tile_size: int = 128) -> DataFrame:
    """FlowLengthDiff (hydro_analysis/flow_length_diff.rs): local maximum
    absolute difference in downslope flow-path length against the valid
    8-neighbours (0 where no neighbours)."""
    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY
    from whitebox_tools_spark.operators.hydro2 import downslope_flowpath_length

    dfl = downslope_flowpath_length(raster, cfg, tile_size).localCheckpoint(eager=True)
    offs = F.array(
        *[
            F.struct(F.lit(D8_DY[i]).alias("dr"), F.lit(D8_DX[i]).alias("dc"))
            for i in range(8)
        ]
    )
    ex = dfl.select("row", "col", F.col("value").alias("v"), F.explode(offs).alias("o"))
    nb = ex.join(
        dfl.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"), F.col("value").alias("nv")
        ),
        (F.col("row") + F.col("o.dr") == F.col("nr"))
        & (F.col("col") + F.col("o.dc") == F.col("nc")),
        "left",
    )
    return nb.groupBy("row", "col").agg(
        F.coalesce(F.max(F.abs(F.col("v") - F.col("nv"))), F.lit(0.0)).alias("value")
    )
