"""Colour-composite / enhancement family (SURVEY.md §2.6 image
enhancement) + raster morphology + buffer, as pure column expressions
over per-cell band joins — everything stays in whole-stage codegen.

Band bytes: byte = floor(255*(v - min)/(max - min) + 0.5) clamped to
[0,255]; composite packing = (a<<24 | b<<16 | g<<8 | r) as double
(balance_contrast_enhancement.rs:395-432's layout).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.gridding import GridConfig

PI = math.pi


def _j3(r: DataFrame, g: DataFrame, b: DataFrame) -> DataFrame:
    return (
        r.select("row", "col", F.col("value").alias("r"))
        .join(g.select("row", "col", F.col("value").alias("g")), ["row", "col"])
        .join(b.select("row", "col", F.col("value").alias("b")), ["row", "col"])
    )


def _norm(df: DataFrame, cols=("r", "g", "b")) -> DataFrame:
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_mn"), F.max(c).alias(f"{c}_mx")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            c, (F.col(c) - F.col(f"{c}_mn")) / (F.col(f"{c}_mx") - F.col(f"{c}_mn"))
        )
    return out.drop(*[f"{c}_mn" for c in cols], *[f"{c}_mx" for c in cols])


def rgb_to_ihs(r: DataFrame, g: DataFrame, b: DataFrame) -> DataFrame:
    """RgbToIhs (rgb_to_ihs.rs:798-818, Haydn 1982): bands normalized to
    [0,1] by their min/max, then i=(r+g+b)/3, h from the acos form
    (reflected when b > g), s = 1 - 3*min(rn,gn,bn)."""
    j = _norm(_j3(r, g, b))
    tot = F.col("r") + F.col("g") + F.col("b")
    rn = F.col("r") / tot
    gn = F.col("g") / tot
    bn = F.col("b") / tot
    acos_arg = (0.5 * ((rn - gn) + (rn - bn))) / F.sqrt(
        (rn - gn) * (rn - gn) + (rn - bn) * (gn - bn)
    )
    h0 = F.when((rn != gn) | (rn != bn), F.acos(acos_arg)).otherwise(0.0)
    h = F.when(F.col("b") > F.col("g"), 2.0 * PI - h0).otherwise(h0)
    s = 1.0 - 3.0 * F.least(rn, gn, bn)
    i = tot / 3.0
    return j.select("row", "col", i.alias("i"), h.alias("h"), s.alias("s"))


def ihs_to_rgb(ihs: DataFrame) -> DataFrame:
    """IhsToRgb (ihs_to_rgb.rs:628-666): sector-wise inverse; byte
    outputs rounded half-away (floor(x+0.5), values >= 0) and clamped."""
    x = F.col("i") * (1.0 - F.col("s"))

    def sector(hh):
        y = F.col("i") * (
            1.0 + (F.col("s") * F.cos(hh)) / F.cos(PI / 3.0 - hh)
        )
        z = 3.0 * F.col("i") - (x + y)
        return y, z

    h = F.col("h")
    y1, z1 = sector(h)
    y2, z2 = sector(h - 2.0 * PI / 3.0)
    y3, z3 = sector(h - 4.0 * PI / 3.0)
    s1 = h < 2.0 * PI / 3.0
    s2 = (~s1) & (h < 4.0 * PI / 3.0)
    r = F.when(s1, y1).when(s2, x).otherwise(z3)
    g = F.when(s1, z1).when(s2, y2).otherwise(x)
    b = F.when(s1, x).when(s2, z2).otherwise(y3)

    def byte(c):
        return F.least(F.greatest(F.floor(c * 255.0 + 0.5), F.lit(0.0)), F.lit(255.0))

    return ihs.select(
        "row", "col", byte(r).alias("r"), byte(g).alias("g"), byte(b).alias("b")
    )


def _byte(c):
    return F.least(F.greatest(F.floor(F.col(c) * 255.0 + 0.5), F.lit(0.0)), F.lit(255.0))


def create_colour_composite(r: DataFrame, g: DataFrame, b: DataFrame) -> DataFrame:
    """CreateColourComposite (create_colour_composite.rs semantics):
    normalized band bytes packed (a=255)<<24 | b<<16 | g<<8 | r."""
    j = _norm(_j3(r, g, b))
    val = (
        F.lit(255.0) * 16777216.0
        + _byte("b") * 65536.0
        + _byte("g") * 256.0
        + _byte("r")
    )
    return j.select("row", "col", val.alias("value"))


def split_colour_composite(comp: DataFrame) -> DataFrame:
    """SplitColourComposite (split_colour_composite.rs): unpack the byte
    channels (long form: row, col, band in r/g/b, value)."""
    v = F.col("value").cast("long")
    r = F.pmod(v, F.lit(256)).cast("double")
    g = F.pmod(F.floor(v / 256), F.lit(256)).cast("double")
    b = F.pmod(F.floor(v / 65536), F.lit(256)).cast("double")
    bands = F.array(
        F.struct(F.lit("r").alias("band"), r.alias("bv")),
        F.struct(F.lit("g").alias("band"), g.alias("bv")),
        F.struct(F.lit("b").alias("band"), b.alias("bv")),
    )
    return comp.select("row", "col", F.explode(bands).alias("e")).select(
        "row", "col", F.col("e.band").alias("band"), F.col("e.bv").alias("value")
    )


def change_vector_analysis(
    d1: list[DataFrame], d2: list[DataFrame]
) -> DataFrame:
    """ChangeVectorAnalysis (change_vector_analysis.rs): per cell,
    change-vector magnitude sqrt(sum(diff^2)) and direction code
    sum(2^i where diff_i >= 0) over the band pairs."""
    j = None
    for i, (a, b) in enumerate(zip(d1, d2)):
        pair = a.select("row", "col", F.col("value").alias(f"a{i}")).join(
            b.select("row", "col", F.col("value").alias(f"b{i}")), ["row", "col"]
        )
        j = pair if j is None else j.join(pair, ["row", "col"])
    mag = None
    code = None
    for i in range(len(d1)):
        d = F.col(f"b{i}") - F.col(f"a{i}")
        t = d * d
        mag = t if mag is None else mag + t
        c = F.when(d >= 0.0, F.lit(float(2 ** i))).otherwise(0.0)
        code = c if code is None else code + c
    return j.select(
        "row", "col", F.sqrt(mag).alias("magnitude"), code.alias("direction")
    )


def direct_decorrelation_stretch(
    r: DataFrame, g: DataFrame, b: DataFrame, k: float = 0.5
) -> DataFrame:
    """DirectDecorrelationStretch (direct_decorrelation_stretch.rs:21-35):
    band' = band - k*min(r,g,b) on the normalized byte scale."""
    j = _norm(_j3(r, g, b))
    mn = F.least("r", "g", "b")
    return j.select(
        "row",
        "col",
        (F.col("r") - k * mn).alias("r"),
        (F.col("g") - k * mn).alias("g"),
        (F.col("b") - k * mn).alias("b"),
    )


def balance_contrast_enhancement(
    comp: DataFrame, band_mean: float = 100.0
) -> DataFrame:
    """BalanceContrastEnhancement (balance_contrast_enhancement.rs
    :361-432): per byte channel, the parabolic stretch
    y = a(x-b)^2 + c with (a,b,c) solved so the output spans [0,255]
    with mean band_mean; channels clamped and repacked."""
    v = F.col("value").cast("long")
    chans = {
        "r": F.pmod(v, F.lit(256)).cast("double"),
        "g": F.pmod(F.floor(v / 256), F.lit(256)).cast("double"),
        "b": F.pmod(F.floor(v / 65536), F.lit(256)).cast("double"),
    }
    x = comp.select("row", "col", *[e.alias(c) for c, e in chans.items()])
    aggs = []
    for c in chans:
        aggs += [
            F.min(c).alias(f"{c}_l"), F.max(c).alias(f"{c}_h"),
            F.avg(c).alias(f"{c}_e"),
            (F.sum(F.col(c) * F.col(c)) / F.count(F.lit(1))).alias(f"{c}_s"),
        ]
    st = x.agg(*aggs)
    j = x.crossJoin(F.broadcast(st))
    l, h, e = 0.0, 255.0, band_mean
    outs = []
    for c in chans:
        cl, ch_, ce, cs = (F.col(f"{c}_l"), F.col(f"{c}_h"), F.col(f"{c}_e"), F.col(f"{c}_s"))
        bb = (ch_ * ch_ * (e - l) - cs * (h - l) + cl * cl * (h - e)) / (
            2.0 * (ch_ * (e - l) - ce * (h - l) + cl * (h - e))
        )
        aa = (h - l) / ((ch_ - cl) * (ch_ + cl - 2.0 * bb))
        cc = l - aa * (cl - bb) * (cl - bb)
        y = aa * (F.col(c) - bb) * (F.col(c) - bb) + cc
        y = F.least(F.greatest(y, F.lit(0.0)), F.lit(255.0))
        outs.append(F.floor(y).alias(f"{c}_o"))
    packed = j.select("row", "col", *outs).select(
        "row",
        "col",
        (
            F.lit(255.0) * 16777216.0
            + F.col("b_o") * 65536.0
            + F.col("g_o") * 256.0
            + F.col("r_o")
        ).alias("value"),
    )
    return packed


def correct_vignetting(
    image: DataFrame,
    cfg: GridConfig,
    focal_length: float = 304.8,
    image_width: float = 228.6,
    n: float = 4.0,
) -> DataFrame:
    """CorrectVignetting (correct_vignetting.rs): out = v / cos^n(theta),
    theta = atan(d_mm / f) with d_mm the principal-point distance scaled
    so the raster width spans image_width mm (principal point = grid
    centre; engine definition)."""
    cx = cfg.cols / 2.0
    cy = cfg.rows / 2.0
    mm_per_cell = image_width / cfg.cols
    d = F.sqrt(
        (F.col("col") + 0.5 - cx) * (F.col("col") + 0.5 - cx)
        + (F.col("row") + 0.5 - cy) * (F.col("row") + 0.5 - cy)
    ) * mm_per_cell
    theta = F.atan(d / focal_length)
    return image.select(
        "row", "col", (F.col("value") / F.pow(F.cos(theta), F.lit(n))).alias("value")
    )


def histogram_equalization(raster: DataFrame, num_tones: int = 256) -> DataFrame:
    """HistogramEqualization (histogram_equalization.rs:313-369), exact
    (unbinned) engine variant: out = floor((cdf(z) - cdf_min) / (n - 1)
    * (num_tones - 1) + 0.5), cdf(z) = count of cells <= z, cdf_min =
    count of the minimum value."""
    per_v = raster.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cdf = per_v.select(
        "value", F.sum("cnt").over(w).cast("double").alias("cdf")
    )
    stats = raster.agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("mn"))
    mcount = raster.crossJoin(F.broadcast(stats)).where(
        F.col("value") == F.col("mn")
    ).groupBy().agg(F.count(F.lit(1)).cast("double").alias("cdf_min"))
    j = (
        raster.join(cdf, "value")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(mcount))
    )
    out = F.floor(
        (F.col("cdf") - F.col("cdf_min"))
        / (F.col("n").cast("double") - 1.0)
        * (num_tones - 1.0)
        + 0.5
    )
    return j.select("row", "col", out.alias("value"))


# ----------------------------------------------------- morphology family


def opening(raster: DataFrame, cfg: GridConfig, fx: int = 3, fy: int = 3, tile_size: int = 128):
    """Opening (image_analysis/opening.rs): dilation(erosion) — max
    filter of the min filter."""
    from whitebox_tools_spark.operators.filters import stat_filter

    ero = stat_filter(raster, cfg, "min", fx, fy, tile_size=tile_size)
    return stat_filter(ero, cfg, "max", fx, fy, tile_size=tile_size)


def closing(raster: DataFrame, cfg: GridConfig, fx: int = 3, fy: int = 3, tile_size: int = 128):
    """Closing (image_analysis/closing.rs): erosion(dilation)."""
    from whitebox_tools_spark.operators.filters import stat_filter

    dil = stat_filter(raster, cfg, "max", fx, fy, tile_size=tile_size)
    return stat_filter(dil, cfg, "min", fx, fy, tile_size=tile_size)


def tophat_transform(
    raster: DataFrame, cfg: GridConfig, fx: int = 3, fy: int = 3,
    variant: str = "white", tile_size: int = 128,
):
    """TophatTransform (image_analysis/tophat.rs): white = z - opening,
    black = closing - z."""
    if variant == "white":
        op = opening(raster, cfg, fx, fy, tile_size)
        return (
            raster.select("row", "col", F.col("value").alias("z"))
            .join(op.select("row", "col", F.col("value").alias("o")), ["row", "col"])
            .select("row", "col", (F.col("z") - F.col("o")).alias("value"))
        )
    cl = closing(raster, cfg, fx, fy, tile_size)
    return (
        raster.select("row", "col", F.col("value").alias("z"))
        .join(cl.select("row", "col", F.col("value").alias("c")), ["row", "col"])
        .select("row", "col", (F.col("c") - F.col("z")).alias("value"))
    )


def buffer_raster(raster: DataFrame, cfg: GridConfig, size: float) -> DataFrame:
    """BufferRaster (gis_analysis/buffer_raster.rs): 1.0 within ``size``
    map units of a nonzero cell (targets included), else 0.0 — via the
    exact euclidean distance transform."""
    from whitebox_tools_spark.operators.hydro import euclidean_distance

    d = euclidean_distance(raster, cfg)
    return d.select(
        "row", "col",
        F.when(F.col("value") <= size, 1.0).otherwise(0.0).alias("value"),
    )
