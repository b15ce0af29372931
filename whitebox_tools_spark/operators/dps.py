"""DrainagePreservingSmoothing (terrain_analysis/
drainage_preserving_smoothing.rs — registered but disabled upstream,
tools/mod.rs:418; implemented anyway, like Geomorphons).

FeaturePreservingSmoothing (operators/fps.py) plus a spatially-adaptive
normal-difference threshold driven by a difference-from-median-elevation
(DFM) surface, so cells sitting in local lows (drainage) are smoothed
less:

1. DFM (:357-540): elevations binned at 10^3 (num_sig_digits = 3,
   bin = floor(z*1000) - floor(min*1000)); per cell, the median bin of a
   (2*filter_size+1)^2 window ("the dfm filter is twice the size of the
   smoothing filter", :366) as the smallest bin with cumulative count >=
   floor(n/2); dfm = (bin - median) / 1000.
2. per-cell threshold (:670-680, with dfm_threshold negated at :321):
   dfm in (dfm_t, 0)  -> cos(norm_diff * (1 - reduction*dfm/dfm_t))
   dfm <= dfm_t       -> cos(norm_diff * (1 - reduction))
   else               -> cos(norm_diff)
3. unnormalised Horn normals (a, b, c=8*res_x) (:565-590), smoothed over
   the filter window with w = (cos_angle - thr(center))^2 when
   cos_angle > thr (:628-712); the smoothed c is held at the constant
   8*res_x (it is a weighted mean of a constant; exact in real
   arithmetic).
4. num_iter rounds of weighted plane-consensus elevation updates with
   the same per-center threshold, reverting to the input z where the
   update moves more than max_diff (:762-830).

Deviations (documented, status ``deviating``): synchronous (Jacobi)
elevation updates vs the reference's in-place row-major scan, f64 vs
f32, constant smoothed c, and the initial-window median rank statistic
applied uniformly (the reference's O(1) sliding-histogram update
branches are rank-equivalent for the initial-window definition).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators import fps
from whitebox_tools_spark.operators.gridding import GridConfig

MULT = 1000.0  # 10^num_sig_digits, drainage_preserving_smoothing.rs:359-360


def dfm_surface(raster: DataFrame, filter_size: int) -> DataFrame:
    """(row, col, dfm): difference from the windowed median elevation,
    computed in binned (1e-3-quantised) space. Window half-width is
    ``filter_size`` (twice the smoothing filter, :366)."""
    minrow = raster.agg(
        F.floor(F.min("value") * F.lit(MULT)).cast("long").alias("minbin")
    )
    binned = raster.crossJoin(F.broadcast(minrow)).select(
        "row", "col",
        (F.floor(F.col("value") * F.lit(MULT)).cast("long") - F.col("minbin")).alias("bo"),
    )
    mid = int(filter_size)
    probes = F.array(
        *[
            F.struct((F.col("row") + dy).alias("nr"), (F.col("col") + dx).alias("nc"))
            for dy in range(-mid, mid + 1)
            for dx in range(-mid, mid + 1)
        ]
    )
    ex = binned.select("row", "col", "bo", F.explode(probes).alias("p")).select(
        "row", "col", "bo", "p.nr", "p.nc"
    )
    j = ex.join(
        binned.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"), F.col("bo").alias("nbo")
        ),
        ["nr", "nc"],
    )
    g = j.groupBy("row", "col", "bo").agg(
        F.count(F.lit(1)).alias("n"),
        F.sort_array(F.collect_list("nbo")).alias("vals"),
    )
    target = F.floor(F.col("n").cast("double") / F.lit(2.0)).cast("int")
    med = F.when(target >= 1, F.element_at(F.col("vals"), target)).otherwise(F.lit(0))
    return g.select(
        "row", "col",
        ((F.col("bo") - med).cast("double") / F.lit(MULT)).alias("dfm"),
    )


def _thr_adj(dfm, norm_diff: float, reduction: float, dfm_t: float):
    """Per-cell cosine threshold (:670-680); dfm_t is the NEGATED
    dfm_threshold, reduction already /100."""
    base = math.cos(math.radians(norm_diff))
    reduced = math.cos(math.radians(norm_diff * (1.0 - reduction)))
    return (
        F.when(
            (dfm < 0.0) & (dfm > F.lit(dfm_t)),
            F.cos(F.radians(F.lit(norm_diff) * (F.lit(1.0) - F.lit(reduction) * dfm / F.lit(dfm_t)))),
        )
        .when(dfm <= F.lit(dfm_t), F.lit(reduced))
        .otherwise(F.lit(base))
    )


def drainage_preserving_smoothing(
    raster: DataFrame,
    cfg: GridConfig,
    filter_size: int = 11,
    norm_diff: float = 8.0,
    num_iter: int = 3,
    max_diff: float = float("inf"),
    reduction: float = 80.0,
    dfm_threshold: float = 0.15,
    z_factor: float = 1.0,
) -> DataFrame:
    filter_size = max(int(filter_size), 3)
    num_iter = max(int(num_iter), 1)
    norm_diff = min(float(norm_diff), 90.0)
    reduction = min(max(float(reduction), 1.0), 99.0) / 100.0
    dfm_t = -abs(float(dfm_threshold))
    c = 8.0 * cfg.res_x  # eight_grid_res, :575

    dfm = dfm_surface(raster, filter_size).localCheckpoint(eager=True)

    # --- unnormalised Horn normals (a, b); c is the shared constant
    nb = fps._pivot_neighbors(raster, list(zip(fps.FDX, fps.FDY)), "")
    v = [(F.coalesce(F.col(f"v{i}"), F.col("z")) * F.lit(z_factor)) for i in range(8)]
    a = -(v[2] - v[4] + 2.0 * (v[1] - v[5]) + v[0] - v[6])
    b = -(v[6] - v[4] + 2.0 * (v[7] - v[3]) + v[0] - v[2])
    nv = (
        nb.select("row", "col", a.alias("a"), b.alias("b"))
        .join(dfm, ["row", "col"])
        .withColumn("thr", _thr_adj(F.col("dfm"), norm_diff, reduction, dfm_t))
        .localCheckpoint(eager=True)
    )

    def cosang(aa, ab, ba, bb):
        c2 = F.lit(c * c)
        return (aa * ba + ab * bb + c2) / F.sqrt(
            (aa * aa + ab * ab + c2) * (ba * ba + bb * bb + c2)
        )

    # --- smooth the normal field over the filter window, per-center thr
    mid = filter_size // 2
    probes = F.array(
        *[
            F.struct((F.col("row") + dy).alias("nr"), (F.col("col") + dx).alias("nc"))
            for dy in range(-mid, mid + 1)
            for dx in range(-mid, mid + 1)
        ]
    )
    ex = nv.select("row", "col", "a", "b", "thr", F.explode(probes).alias("p")).select(
        "row", "col", "a", "b", "thr", "p.nr", "p.nc"
    )
    jn = ex.join(
        nv.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"),
            F.col("a").alias("an"), F.col("b").alias("bn"),
        ),
        ["nr", "nc"],
    )
    ca = cosang(F.col("a"), F.col("b"), F.col("an"), F.col("bn"))
    w = F.when(ca > F.col("thr"), (ca - F.col("thr")) * (ca - F.col("thr")))
    sm = (
        jn.select("row", "col", "thr", w.alias("w"), "an", "bn")
        .groupBy("row", "col", "thr")
        .agg(
            (F.sum(F.col("an") * F.col("w")) / F.sum("w")).alias("sa"),
            (F.sum(F.col("bn") * F.col("w")) / F.sum("w")).alias("sb"),
        )
        .localCheckpoint(eager=True)
    )

    # --- static weight edges for the elevation updates
    xs = [-cfg.res_x, -cfg.res_x, -cfg.res_x, 0.0, cfg.res_x, cfg.res_x, cfg.res_x, 0.0]
    ys = [-cfg.res_y, 0.0, cfg.res_y, cfg.res_y, cfg.res_y, 0.0, -cfg.res_y, -cfg.res_y]
    eprobes = F.array(
        *[
            F.struct(
                (F.col("row") + dy).alias("nr"),
                (F.col("col") + dx).alias("nc"),
                F.lit(xs[i]).alias("xn"),
                F.lit(ys[i]).alias("yn"),
            )
            for i, (dx, dy) in enumerate(zip(fps.FDX, fps.FDY))
        ]
    )
    eex = sm.select("row", "col", "sa", "sb", "thr", F.explode(eprobes).alias("p")).select(
        "row", "col", "sa", "sb", "thr", "p.nr", "p.nc", "p.xn", "p.yn"
    )
    ej = eex.join(
        sm.select(
            F.col("row").alias("nr"), F.col("col").alias("nc"),
            F.col("sa").alias("na"), F.col("sb").alias("nb"),
        ),
        ["nr", "nc"],
    )
    eca = cosang(F.col("sa"), F.col("sb"), F.col("na"), F.col("nb"))
    edges = (
        ej.withColumn(
            "w",
            F.when(eca > F.col("thr"), (eca - F.col("thr")) * (eca - F.col("thr"))),
        )
        .where(F.col("w").isNotNull())
        .select("row", "col", "nr", "nc", "w", "na", "nb", "xn", "yn")
        .localCheckpoint(eager=True)
    )

    orig = raster.select("row", "col", F.col("value").alias("z0"))
    cur = raster.select("row", "col", F.col("value").alias("zc"))
    cl = F.lit(c)
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
                -(F.col("na") * F.col("xn") + F.col("nb") * F.col("yn") - cl * F.col("zn"))
                / cl
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
                    & (F.abs(F.col("num") / F.col("den") - F.col("z0")) <= max_diff),
                    F.col("num") / F.col("den"),
                )
                .otherwise(F.col("z0"))
                .alias("zc"),
            )
            .localCheckpoint(eager=True)
        )
    return cur.select("row", "col", F.col("zc").alias("value"))
