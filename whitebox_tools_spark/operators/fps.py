"""FeaturePreservingSmoothing (terrain_analysis/
feature_preserving_smoothing.rs, Sun et al. 2007 adapted to rasters).

Stages (all relational, zero Python in the plan):
1. plane normals (a, b) from the Horn 3x3 (reference :355-380; nodata
   neighbours fall back to the centre z);
2. normal-field smoothing over the filter window with weights
   w = (cos_angle - threshold)^2 for cos_angle > threshold
   (:416-476; the centre always contributes, so sum_w > 0);
3. elevation updates: num_iter rounds of the weighted plane-consensus
   z <- sum(-(a_n*x_n + b_n*y_n - z_n) * w) / sum(w), clamped to
   max_z_diff (:512-575). Weights depend only on the SMOOTHED normals,
   so the 8-neighbour weight-edge table is built once and every round
   is a single join + aggregate.

Deviation (documented): the reference updates elevations in place
during its row-major scan (later cells see earlier writes); the engine
runs the synchronous (Jacobi) variant. Arithmetic here is f64 where the
reference uses f32.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.gridding import GridConfig

FDX = [1, 1, 1, 0, -1, -1, -1, 0]
FDY = [-1, 0, 1, 1, 1, 0, -1, -1]


def _pivot_neighbors(raster: DataFrame, offsets, tag: str):
    """Explode each cell to its offset probes, join the raster once,
    pivot neighbour values back to columns v{tag}{i}."""
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("oi"),
                (F.col("row") + dy).alias("nr"),
                (F.col("col") + dx).alias("nc"),
            )
            for i, (dx, dy) in enumerate(offsets)
        ]
    )
    ex = raster.select(
        "row", "col", F.col("value").alias("z"), F.explode(probes).alias("p")
    ).select("row", "col", "z", "p.oi", "p.nr", "p.nc")
    j = ex.join(
        raster.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"),
            F.col("value").alias("zn"),
        ),
        ["nr", "nc"],
        "left",
    )
    aggs = [
        F.max(F.when(F.col("oi") == i, F.col("zn"))).alias(f"v{tag}{i}")
        for i in range(len(offsets))
    ]
    return j.groupBy("row", "col", "z").agg(*aggs)


def normals(raster: DataFrame, cfg: GridConfig, z_factor: float = 1.0) -> DataFrame:
    """(row, col, a, b) Horn plane normals, nodata -> centre fallback."""
    nb = _pivot_neighbors(raster, list(zip(FDX, FDY)), "")
    v = [
        (F.coalesce(F.col(f"v{i}"), F.col("z")) * F.lit(z_factor)) for i in range(8)
    ]
    a = -(v[2] - v[4] + 2.0 * (v[1] - v[5]) + v[0] - v[6]) / (8.0 * cfg.res_x)
    b = -(v[6] - v[4] + 2.0 * (v[7] - v[3]) + v[0] - v[2]) / (8.0 * cfg.res_y)
    return nb.select("row", "col", a.alias("a"), b.alias("b"))


def _cos_angle(aa, ab, ba, bb):
    return (aa * ba + ab * bb + 1.0) / F.sqrt(
        (aa * aa + ab * ab + 1.0) * (ba * ba + bb * bb + 1.0)
    )


def feature_preserving_smoothing(
    raster: DataFrame,
    cfg: GridConfig,
    filter_size: int = 11,
    norm_diff: float = 8.0,
    num_iter: int = 3,
    max_z_diff: float = float("inf"),
    z_factor: float = 1.0,
) -> DataFrame:
    threshold = math.cos(math.radians(norm_diff))
    nv = normals(raster, cfg, z_factor).localCheckpoint(eager=True)

    # --- smooth the normal field over the filter window
    mid = filter_size // 2
    probes = F.array(
        *[
            F.struct(
                (F.col("row") + dy).alias("nr"), (F.col("col") + dx).alias("nc")
            )
            for dy in range(-mid, mid + 1)
            for dx in range(-mid, mid + 1)
        ]
    )
    ex = nv.select("row", "col", "a", "b", F.explode(probes).alias("p")).select(
        "row", "col", "a", "b", "p.nr", "p.nc"
    )
    jn = ex.join(
        nv.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"),
            F.col("a").alias("an"), F.col("b").alias("bn"),
        ),
        ["nr", "nc"],
    )
    cosang = _cos_angle(F.col("a"), F.col("b"), F.col("an"), F.col("bn"))
    w = F.when(cosang > threshold, (cosang - threshold) * (cosang - threshold))
    sm = (
        jn.select("row", "col", w.alias("w"), F.col("an"), F.col("bn"))
        .groupBy("row", "col")
        .agg(
            (F.sum(F.col("an") * F.col("w")) / F.sum("w")).alias("sa"),
            (F.sum(F.col("bn") * F.col("w")) / F.sum("w")).alias("sb"),
        )
        .localCheckpoint(eager=True)
    )

    # --- constant weight edges for the elevation updates
    xs = [-cfg.res_x, -cfg.res_x, -cfg.res_x, 0.0, cfg.res_x, cfg.res_x, cfg.res_x, 0.0]
    ys = [-cfg.res_y, 0.0, cfg.res_y, cfg.res_y, cfg.res_y, 0.0, -cfg.res_y, -cfg.res_y]
    eprobes = F.array(
        *[
            F.struct(
                F.lit(i).alias("oi"),
                (F.col("row") + dy).alias("nr"),
                (F.col("col") + dx).alias("nc"),
                F.lit(xs[i]).alias("xn"),
                F.lit(ys[i]).alias("yn"),
            )
            for i, (dx, dy) in enumerate(zip(FDX, FDY))
        ]
    )
    eex = sm.select("row", "col", "sa", "sb", F.explode(eprobes).alias("p")).select(
        "row", "col", "sa", "sb", "p.nr", "p.nc", "p.xn", "p.yn"
    )
    ej = eex.join(
        sm.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"),
            F.col("sa").alias("na"), F.col("sb").alias("nb"),
        ),
        ["nr", "nc"],
    )
    ecos = _cos_angle(F.col("sa"), F.col("sb"), F.col("na"), F.col("nb"))
    edges = (
        ej.withColumn(
            "w",
            F.when(ecos > threshold, (ecos - threshold) * (ecos - threshold)),
        )
        .where(F.col("w").isNotNull())
        .select("row", "col", "nr", "nc", "w", "na", "nb", "xn", "yn")
        .localCheckpoint(eager=True)
    )

    orig = raster.select("row", "col", F.col("value").alias("z0"))
    cur = raster.select("row", "col", F.col("value").alias("zc"))
    for _ in range(num_iter):
        contrib = edges.join(
            cur.select(
                F.col("row").alias("nr"), F.col("col").alias("nc"),
                F.col("zc").alias("zn"),
            ),
            ["nr", "nc"],
        )
        upd = contrib.groupBy("row", "col").agg(
            F.sum(
                -(F.col("na") * F.col("xn") + F.col("nb") * F.col("yn") - F.col("zn"))
                * F.col("w")
            ).alias("num"),
            F.sum("w").alias("den"),
        )
        cur = (
            orig.join(upd, ["row", "col"], "left")
            .select(
                "row",
                "col",
                F.when(
                    F.col("den").isNotNull()
                    & (F.col("den") > 0.0)
                    & (F.abs(F.col("num") / F.col("den") - F.col("z0")) <= max_z_diff),
                    F.col("num") / F.col("den"),
                )
                .otherwise(F.col("z0"))
                .alias("zc"),
            )
            .localCheckpoint(eager=True)
        )
    return cur.select("row", "col", F.col("zc").alias("value"))
