"""ImpoundmentSizeIndex (hydro_analysis/impoundment_index.rs).

Per cell: the highest dam of length L placeable through it (crest =
max over the 4 profile directions of min(left-side max, right-side
max) — the two-pass water-fill of :320-360 reduces to exactly that at
the profile centre), then the impoundment metric over all strictly
upstream cells u with z(u) < crest(c):
    area   = count * cell_area;   volume = sum(crest - z(u)).
The reference's elevation-list propagation with the max-downstream-dam
cutoff computes the same set (the cutoff only prunes elements that can
never satisfy any downstream threshold), so the direct definition over
the D8 path closure is equivalent — one join + aggregate instead of a
sequential priority flood.

Engine form (documented deviation): flow directions come from the
epsilon-filled surface (fill_depressions + D8, as in breach), not the
reference's priority-flood pop order; 'depth' out_type (a per-neighbour
ratio sum) is not provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.branch import _path_closure
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.operators.hydro2 import d8_graph, fill_depressions

IDX = [1, 1, 1, 0, -1, -1, -1, 0]
IDY = [-1, 0, 1, 1, 1, 0, -1, -1]
PERP1 = [2, 3, 4, 1]
PERP2 = [6, 7, 0, 5]


def dam_crest(raster: DataFrame, cfg: GridConfig, dam_length: float = 11.0) -> DataFrame:
    """(row, col, crest): highest dam (water-fill level at centre) over
    the four profile directions; missing profile cells read -inf."""
    half = int(dam_length / 2.0)
    probes = []
    for d in range(4):
        for side, p in ((1, PERP1[d]), (2, PERP2[d])):
            for i in range(1, half + 1):
                probes.append(
                    F.struct(
                        F.lit(d).alias("dir"),
                        F.lit(side).alias("side"),
                        (F.col("row") + IDY[p] * i).alias("nr"),
                        (F.col("col") + IDX[p] * i).alias("nc"),
                    )
                )
    ex = raster.select(
        "row", "col", F.col("value").alias("z"), F.explode(F.array(*probes)).alias("p")
    ).select("row", "col", "z", "p.dir", "p.side", "p.nr", "p.nc")
    j = ex.join(
        raster.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"),
            F.col("value").alias("zn"),
        ),
        ["nr", "nc"],
        "left",
    ).withColumn("zn", F.coalesce("zn", F.lit(float("-inf"))))
    per_dir = j.groupBy("row", "col", "z", "dir").agg(
        F.greatest(
            F.col("z"), F.max(F.when(F.col("side") == 1, F.col("zn")))
        ).alias("mx1"),
        F.greatest(
            F.col("z"), F.max(F.when(F.col("side") == 2, F.col("zn")))
        ).alias("mx2"),
    )
    return per_dir.groupBy("row", "col").agg(
        F.max(F.least("mx1", "mx2")).alias("crest")
    )


def impoundment_size_index(
    raster: DataFrame,
    cfg: GridConfig,
    dam_length: float = 11.0,
    out_type: str = "volume",
    epsilon: float = 1e-5,
    tile_size: int = 128,
    max_rounds: int = 200,
) -> DataFrame:
    """(row, col, value, dam_height): metric + crest - z."""
    crest = dam_crest(raster, cfg, dam_length).localCheckpoint(eager=True)
    w = fill_depressions(
        raster, cfg, max_rounds=max_rounds, tile_size=tile_size, epsilon=epsilon
    )
    nodes, edges = d8_graph(w, cfg, tile_size)
    clo = _path_closure(nodes, edges)
    strict = clo.where(F.col("src") != F.col("cur"))
    z = raster.select(
        (F.col("row") * cfg.cols + F.col("col")).alias("src"),
        F.col("value").alias("zu"),
    )
    c = crest.select(
        (F.col("row") * cfg.cols + F.col("col")).alias("cur"),
        F.col("crest").alias("ct"),
    )
    flooded = (
        strict.join(z, "src").join(c, "cur").where(F.col("zu") < F.col("ct"))
    )
    cell_area = cfg.res_x * cfg.res_y
    if out_type == "area":
        agg = (F.count(F.lit(1)) * F.lit(cell_area)).alias("metric")
    elif out_type == "depth":
        # max depth of the impounded water body (impoundment_index.rs
        # out_type=mean/max depth family; engine provides the max form)
        agg = F.max(F.col("ct") - F.col("zu")).alias("metric")
    else:
        agg = F.sum(F.col("ct") - F.col("zu")).alias("metric")
    per = flooded.groupBy("cur").agg(agg)
    base = raster.select(
        "row", "col", F.col("value").alias("z"),
        (F.col("row") * cfg.cols + F.col("col")).alias("cur"),
    )
    return (
        base.join(crest, ["row", "col"])
        .join(per, "cur", "left")
        .select(
            "row", "col",
            F.coalesce("metric", F.lit(0.0)).alias("value"),
            (F.col("crest") - F.col("z")).alias("dam_height"),
        )
    )
