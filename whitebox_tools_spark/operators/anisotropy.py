"""MaxAnisotropyDev (+Signature) — terrain_analysis/max_anisotropy_dev.rs.

Anisotropy of elevation deviation: per scale (window midpoint), DEV of
the full window and of four directional panes (N-S / E-W / NE-SW /
NW-SE, reference :394-520) from integral images; anisotropy =
sqrt(mean of squared pane DEV differences); across scales the value
with the largest magnitude wins (out_mag, out_scale).

Distributed shape — zero Python in the plan:
- integral images I / I2 / In as two chained window cumsums (the same
  sequential row-scan fold as the reference :269-293, so float-exact
  against the DuckDB transcription);
- the 16 window-corner lookups per cell as ONE explode + equi-join +
  pivot aggregation (not 16 joins);
- per-scale frames folded with the reference's z2^2 > z1^2 replace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.gridding import GridConfig

CORNER_Y = ("y1", "y2", "y3", "y4")
CORNER_X = ("x1", "x2", "x3", "x4")


def integral_images(raster: DataFrame, cfg: GridConfig) -> DataFrame:
    """Dense (row, col, i, i2, i_n): nodata cells contribute 0 to sums,
    0 to the count; same accumulation order as the reference scan."""
    spark = raster.sparkSession
    rows_df = spark.range(cfg.rows).select(F.col("id").alias("row"))
    cols_df = spark.range(cfg.cols).select(F.col("id").alias("col"))
    dense = rows_df.crossJoin(cols_df).join(raster, ["row", "col"], "left")
    val = F.coalesce(F.col("value"), F.lit(0.0))
    d = dense.select(
        "row", "col",
        val.alias("v"),
        (val * val).alias("v2"),
        F.col("value").isNotNull().cast("int").alias("vn"),
    )
    w_row = Window.partitionBy("row").orderBy("col").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rc = d.select(
        "row", "col",
        F.sum("v").over(w_row).alias("rs"),
        F.sum("v2").over(w_row).alias("rs2"),
        F.sum("vn").over(w_row).alias("rsn"),
    )
    w_col = Window.partitionBy("col").orderBy("row").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return rc.select(
        "row", "col",
        F.sum("rs").over(w_col).alias("i"),
        F.sum("rs2").over(w_col).alias("i2"),
        F.sum("rsn").over(w_col).alias("i_n"),
    )


def _corner_frame(raster: DataFrame, integ: DataFrame, cfg: GridConfig, midpoint: int):
    """One row per valid, edge-restricted cell with all 16 corner
    integral triplets pivoted to columns c{yi}{xj}_{i,i2,n}."""
    mpr = (midpoint * 2 + 1) // 6  # middle_pane_radius
    base = raster.select(
        "row", "col", F.col("value").alias("z"),
        (F.col("row") - midpoint - 1).alias("yc1"),
        (F.col("row") - mpr - 1).alias("yc2"),
        (F.col("row") + mpr).alias("yc3"),
        (F.col("row") + midpoint).alias("yc4"),
        (F.col("col") - midpoint - 1).alias("xc1"),
        (F.col("col") - mpr - 1).alias("xc2"),
        (F.col("col") + mpr).alias("xc3"),
        (F.col("col") + midpoint).alias("xc4"),
    ).where(
        (F.col("yc1") >= 0) & (F.col("yc4") < cfg.rows)
        & (F.col("xc1") >= 0) & (F.col("xc4") < cfg.cols)
    )
    corners = F.array(
        *[
            F.struct(
                F.lit(a + 1).alias("yi"), F.lit(b + 1).alias("xi"),
                F.col(f"yc{a + 1}").alias("lr"), F.col(f"xc{b + 1}").alias("lc"),
            )
            for a in range(4)
            for b in range(4)
        ]
    )
    ex = base.select("row", "col", "z", F.explode(corners).alias("c")).select(
        "row", "col", "z",
        F.col("c.yi").alias("yi"), F.col("c.xi").alias("xi"),
        F.col("c.lr").alias("lr"), F.col("c.lc").alias("lc"),
    )
    j = ex.join(
        integ.select(
            F.col("row").alias("lr"), F.col("col").alias("lc"), "i", "i2", "i_n"
        ),
        ["lr", "lc"],
    )
    aggs = []
    for a in range(1, 5):
        for b in range(1, 5):
            cond = (F.col("yi") == a) & (F.col("xi") == b)
            aggs += [
                F.max(F.when(cond, F.col("i"))).alias(f"i{a}{b}"),
                F.max(F.when(cond, F.col("i2"))).alias(f"q{a}{b}"),
                F.max(F.when(cond, F.col("i_n"))).alias(f"n{a}{b}"),
            ]
    return j.groupBy("row", "col", "z").agg(*aggs)


def _pane(prefix_terms):
    """(n, sum, ssq) expressions from corner-difference term lists:
    each term = (plus_a, plus_b, minus_c, minus_d) of corner tags."""

    def tot(kind):
        e = None
        for pa, pb, mc, md in prefix_terms:
            t = (
                F.col(f"{kind}{pa}") + F.col(f"{kind}{pb}")
                - F.col(f"{kind}{mc}") - F.col(f"{kind}{md}")
            )
            e = t if e is None else e + t
        return e

    return tot("n"), tot("i"), tot("q")


_FULL = [("44", "11", "14", "41")]
_NS = [("43", "12", "13", "42")]
_EW = [("34", "21", "24", "31")]
_NESW = [("24", "13", "14", "23"), ("33", "22", "23", "32"), ("42", "31", "32", "41")]
_NWSE = [("22", "11", "12", "21"), ("33", "22", "23", "32"), ("44", "33", "34", "43")]


def anisotropy_dev(
    raster: DataFrame, cfg: GridConfig, midpoint: int, integ: DataFrame | None = None
) -> DataFrame:
    """Single-scale anisotropy (row, col, value); cells failing the
    edge / n>3 / v>0 guards are absent (reference leaves them nodata)."""
    if integ is None:
        integ = integral_images(raster, cfg)
    cf = _corner_frame(raster, integ, cfg, midpoint)

    def dev(terms):
        n, s, q = _pane(terms)
        nn = n.cast("double")
        v = (q - (s * s) / nn) / nn
        ok = (n > 3) & (v > 0.0)
        return ok, F.when(ok, (F.col("z") - s / nn) / F.sqrt(v))

    ok0, dev0 = dev(_FULL)
    out = cf.where(ok0).withColumn("d0", dev0)
    panes = []
    for k, terms in enumerate([_NS, _EW, _NESW, _NWSE], start=1):
        okk, devk = dev(terms)
        out = out.withColumn(f"ok{k}", okk).withColumn(
            f"d{k}", F.when(okk, devk - F.col("d0")).otherwise(F.lit(0.0))
        )
        panes.append(k)
    nvalid = sum(F.col(f"ok{k}").cast("double") for k in panes)
    mag = F.sqrt(
        sum(F.col(f"d{k}") * F.col(f"d{k}") for k in panes) / nvalid
    )
    return out.where(nvalid > 0.0).select("row", "col", mag.alias("value"))


def max_anisotropy_dev(
    raster: DataFrame,
    cfg: GridConfig,
    min_scale: int = 3,
    max_scale: int = 5,
    step: int = 2,
) -> DataFrame:
    """(row, col, mag, scale): per cell the scale whose anisotropy has
    the largest magnitude (reference z2^2 > z1^2 replace, first scale
    seeds)."""
    integ = integral_images(raster, cfg).localCheckpoint(eager=True)
    acc: DataFrame | None = None
    for mid in range(min_scale, max_scale + 1):
        if (mid - min_scale) % step != 0:
            continue
        cur = anisotropy_dev(raster, cfg, mid, integ).select(
            "row", "col", F.col("value").alias("m2"), F.lit(mid).alias("s2")
        )
        if acc is None:
            acc = cur.select(
                "row", "col", F.col("m2").alias("mag"), F.col("s2").alias("scale")
            ).localCheckpoint(eager=True)
            continue
        acc = (
            acc.join(cur, ["row", "col"], "full")
            .select(
                "row",
                "col",
                F.when(
                    F.col("mag").isNull(), F.col("m2")
                ).when(
                    F.col("m2").isNotNull()
                    & (F.col("m2") * F.col("m2") > F.col("mag") * F.col("mag")),
                    F.col("m2"),
                ).otherwise(F.col("mag")).alias("mag"),
                F.when(
                    F.col("scale").isNull(), F.col("s2")
                ).when(
                    F.col("m2").isNotNull()
                    & (F.col("m2") * F.col("m2") > F.col("mag") * F.col("mag")),
                    F.col("s2"),
                ).otherwise(F.col("scale")).alias("scale"),
            )
            .localCheckpoint(eager=True)
        )
    return acc


def max_anisotropy_dev_signature(
    points: DataFrame,
    raster: DataFrame,
    cfg: GridConfig,
    min_scale: int = 3,
    max_scale: int = 5,
    step: int = 2,
) -> DataFrame:
    """Per sample point (pid, row, col): one row per scale with its
    anisotropy value (max_anisotropy_dev_signature.rs sampled form)."""
    integ = integral_images(raster, cfg).localCheckpoint(eager=True)
    outs = []
    for mid in range(min_scale, max_scale + 1):
        if (mid - min_scale) % step != 0:
            continue
        cur = anisotropy_dev(raster, cfg, mid, integ)
        outs.append(
            points.join(cur, ["row", "col"]).select(
                "pid", F.lit(mid).alias("scale"), "value"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
