"""Image enhancement (global-stats + cell-wise map) and image comparison
statistics (SURVEY.md §2.6 enhancement block, §2.7 agreement block).

Parity contracts:
- MinMaxContrastStretch (image_analysis/min_max_contrast_stretch.rs:
  335-345): z_out = floor((z - min_val)/range * num_tones) clamped to
  [0, num_tones-1]; min/max are user clip values.
- GammaCorrection (gamma_correction.rs:261): z_out = z^gamma.
- SigmoidalContrastStretch (sigmoidal_contrast_stretch.rs:318-372):
  x = (z - min)/range; a = 1/(1+exp(gain*cutoff));
  b = 1/(1+exp(gain*(cutoff-1))) - a;
  z_out = floor(clamp((1/(1+exp(gain*(cutoff-x))) - a)/b, 0, 1) * tones).
  min/max default to the raster extremes (one agg pass, broadcast back).
- OlympicFilter (olympic_filter.rs:318-345): window mean excluding ONE
  min and ONE max occurrence: (sum - min - max)/(n - 2).
- PercentileFilter (percentile_filter.rs:339-371): percentile of the
  CENTER among window values (we compute the direct definition
  n_less/n*100; the reference bins values first — Huang et al. 1979 —
  which quantizes ties; engine-status, pytest-verified).
- MajorityFilter: modal window value; reference tie order follows a
  HashMap iteration (nondeterministic) — we break ties to the SMALLEST
  value (documented deviation).
- ImageCorrelation (math_stat_analysis/image_correlation.rs): Pearson r
  over co-valid cells of two rasters.
- RootMeanSquareError (root_mean_square_error.rs): sqrt(mean((a-b)^2)).
- KappaIndex (kappa_index.rs): Cohen's kappa + overall accuracy from the
  class contingency table.
- Resample nearest-neighbour (image_analysis/resample.rs): target cell
  center -> source (row, col) via the source transforms -> value.
- Resample bilinear / cubic-convolution (resample.rs:325-475): both are
  inverse-distance-squared weightings of the source neighbourhood around
  the fractional source coordinate — a 2x2 window (shifts 0..1) for
  "bilinear", a 4x4 window (shifts -1..2) for "cc"; w = 1/(dx^2+dy^2),
  z = sum(w*v)/sum(w). Exact-center hits (dx=dy=0) return the source
  value directly. Deviation: the reference's exact-hit test is
  ``dx + dy == 0`` (resample.rs:353, :438), which also fires on the
  measure-zero diagonal dx = -dy where it then reads an uninitialized
  stale weight — we use the well-defined dx^2+dy^2 == 0 test instead.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.filters import _window_reduce
from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.localrel import local_df


def _minmax(raster: DataFrame) -> tuple[float, float]:
    r = raster.agg(F.min("value"), F.max("value")).collect()[0]
    return float(r[0]), float(r[1])


def min_max_contrast_stretch(
    raster: DataFrame, min_val: float, max_val: float, num_tones: int = 256
) -> DataFrame:
    rng = max_val - min_val
    z = F.floor((F.col("value") - F.lit(min_val)) / F.lit(rng) * F.lit(float(num_tones)))
    z = F.greatest(F.lit(0.0), F.least(z.cast("double"), F.lit(float(num_tones - 1))))
    return raster.select("row", "col", z.alias("value"))


def gamma_correction(raster: DataFrame, gamma: float = 0.5) -> DataFrame:
    return raster.select(
        "row", "col", F.pow(F.col("value"), F.lit(float(gamma))).alias("value")
    )


def sigmoidal_contrast_stretch(
    raster: DataFrame,
    cutoff: float = 0.0,
    gain: float = 1.0,
    num_tones: int = 256,
    min_val: float | None = None,
    max_val: float | None = None,
) -> DataFrame:
    import math

    if min_val is None or max_val is None:
        min_val, max_val = _minmax(raster)
    rng = max_val - min_val
    a = 1.0 / (1.0 + math.exp(gain * cutoff))
    b = 1.0 / (1.0 + math.exp(gain * (cutoff - 1.0))) - a
    x = (F.col("value") - F.lit(min_val)) / F.lit(rng)
    z = (F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(gain) * (F.lit(cutoff) - x))) - F.lit(a)) / F.lit(b)
    z = F.greatest(F.lit(0.0), F.least(z, F.lit(1.0)))
    z = F.floor(z * F.lit(float(num_tones))).cast("double")
    return raster.select("row", "col", z.alias("value"))


# ------------------------------------------------------- window variants


def olympic_filter(
    raster: DataFrame, cfg: GridConfig, filter_x: int = 3, filter_y: int = 3,
    tile_size: int = 128,
) -> DataFrame:
    def fn(w):
        s = np.nansum(w, axis=-1)
        mn = np.nanmin(w, axis=-1)
        mx = np.nanmax(w, axis=-1)
        n = np.sum(~np.isnan(w), axis=-1)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = (s - mn - mx) / (n - 2)
        # windows with < 3 valid cells are undefined (the reference's
        # deque math degenerates there); suppressed on both sides
        return np.where(n > 2, out, np.nan)

    def stencil(block, valid, base_r, base_c, cfg_):
        return _window_reduce(block, valid, filter_y, filter_x, fn)

    halo = max(filter_x // 2, filter_y // 2)
    return focal_apply(raster, cfg, stencil, halo, tile_size)


def percentile_filter(
    raster: DataFrame, cfg: GridConfig, filter_x: int = 3, filter_y: int = 3,
    tile_size: int = 128,
) -> DataFrame:
    def stencil(block, valid, base_r, base_c, cfg_):
        mid_y, mid_x = filter_y // 2, filter_x // 2
        pb = np.pad(block, ((mid_y, mid_y), (mid_x, mid_x)), constant_values=np.nan)
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(pb, (filter_y, filter_x)).reshape(
            block.shape[0], block.shape[1], -1
        )
        with np.errstate(invalid="ignore"):
            n = np.sum(~np.isnan(win), axis=-1)
            n_less = np.sum(win < block[..., None], axis=-1)
            out = n_less / n * 100.0
        return np.where(valid, out, np.nan)

    halo = max(filter_x // 2, filter_y // 2)
    return focal_apply(raster, cfg, stencil, halo, tile_size)


def majority_filter(
    raster: DataFrame, cfg: GridConfig, filter_x: int = 3, filter_y: int = 3,
    tile_size: int = 128,
) -> DataFrame:
    def fn(w):
        s = np.sort(w, axis=-1)  # NaNs last; ties -> smallest value wins
        best_val = s[..., 0].copy()
        best_run = np.zeros(s.shape[:-1], dtype=np.int64)
        run = np.ones(s.shape[:-1], dtype=np.int64)
        cur = s[..., 0].copy()
        best_run = np.where(~np.isnan(cur), 1, 0)
        best_val = cur
        for i in range(1, s.shape[-1]):
            v = s[..., i]
            same = ~np.isnan(v) & (v == cur)
            run = np.where(same, run + 1, 1)
            cur = np.where(np.isnan(v), cur, v)
            better = ~np.isnan(v) & (run > best_run)
            best_run = np.where(better, run, best_run)
            best_val = np.where(better, v, best_val)
        return np.where(best_run > 0, best_val, np.nan)

    def stencil(block, valid, base_r, base_c, cfg_):
        return _window_reduce(block, valid, filter_y, filter_x, fn)

    halo = max(filter_x // 2, filter_y // 2)
    return focal_apply(raster, cfg, stencil, halo, tile_size)


# --------------------------------------------------- comparison statistics


def image_correlation(a: DataFrame, b: DataFrame) -> DataFrame:
    j = a.select("row", "col", F.col("value").alias("_a")).join(
        b.select("row", "col", F.col("value").alias("_b")), ["row", "col"], "inner"
    )
    return j.agg(F.corr("_a", "_b").alias("r"), F.count(F.lit(1)).alias("n"))


def rmse(a: DataFrame, b: DataFrame) -> DataFrame:
    j = a.select("row", "col", F.col("value").alias("_a")).join(
        b.select("row", "col", F.col("value").alias("_b")), ["row", "col"], "inner"
    )
    d = F.col("_a") - F.col("_b")
    return j.agg(
        F.sqrt(F.avg(d * d)).alias("rmse"),
        F.avg(d).alias("mean_error"),
        F.count(F.lit(1)).alias("n"),
    )


def kappa_index(classes_a: DataFrame, classes_b: DataFrame) -> DataFrame:
    """Cohen's kappa over co-located integer class rasters."""
    j = (
        classes_a.select("row", "col", F.round("value").cast("long").alias("ca"))
        .join(
            classes_b.select("row", "col", F.round("value").cast("long").alias("cb")),
            ["row", "col"],
            "inner",
        )
    )
    n = j.count()
    tab = j.groupBy("ca", "cb").agg(F.count(F.lit(1)).alias("cnt"))
    agree = tab.where(F.col("ca") == F.col("cb")).agg(F.sum("cnt")).collect()[0][0] or 0
    row_m = tab.groupBy("ca").agg(F.sum("cnt").alias("ra"))
    col_m = tab.groupBy("cb").agg(F.sum("cnt").alias("cb_n"))
    exp = (
        row_m.join(col_m, row_m.ca == col_m.cb, "inner")
        .agg(F.sum(F.col("ra") * F.col("cb_n")))
        .collect()[0][0]
        or 0
    )
    po = agree / n
    pe = exp / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    spark = classes_a.sparkSession
    return local_df(
        spark,
        [(float(kappa), float(po), int(n))],
        columns=["kappa", "overall_accuracy", "n"],
    )


def resample_nn(src: DataFrame, src_cfg: GridConfig, dst_cfg: GridConfig) -> DataFrame:
    """Nearest-neighbour resample into the destination grid: target cell
    center -> source (row, col) via the source transforms -> equi-join."""
    from whitebox_tools_spark.operators.gridding import cell_centers
    from whitebox_tools_spark.operators.raster import rowcol_cols

    dst = cell_centers(src.sparkSession, dst_cfg)
    srow, scol = rowcol_cols(src_cfg)
    d = dst.withColumn("_sr", srow).withColumn("_sc", scol)
    s = src.select(
        F.col("row").alias("_sr"), F.col("col").alias("_sc"), F.col("value")
    )
    return d.join(s, ["_sr", "_sc"], "left").select("row", "col", "value")


_IDW_SHIFTS = {
    # "bilinear": the 2x2 cell square around the fractional source coord
    # (resample.rs:406-407); "cc": the 4x4 square (resample.rs:320-321).
    "bilinear": [(dy, dx) for dy in (0, 1) for dx in (0, 1)],
    "cc": [(dy, dx) for dy in (-1, 0, 1, 2) for dx in (-1, 0, 1, 2)],
}


def resample_idw(
    src: DataFrame, src_cfg: GridConfig, dst_cfg: GridConfig, method: str = "bilinear"
) -> DataFrame:
    """Resample with the reference's inverse-distance-squared neighbourhood
    weighting (resample.rs:325-475): fractional source coordinate from the
    target cell center, floor() origin, w = 1/(dx^2+dy^2) over the window,
    NoData neighbours skipped (absent rows in the sparse frame). The window
    explode + equi-join keeps everything in whole-stage codegen and scales
    as one hash shuffle on (source row, col)."""
    if method not in _IDW_SHIFTS:
        raise ValueError(f"method must be one of {sorted(_IDW_SHIFTS)} or 'nn'")
    from whitebox_tools_spark.operators.gridding import cell_centers

    shifts = _IDW_SHIFTS[method]
    dst = cell_centers(src.sparkSession, dst_cfg)
    rsrc = (F.lit(src_cfg.north) - F.col("y")) / F.lit(src_cfg.res_y)
    csrc = (F.col("x") - F.lit(src_cfg.west)) / F.lit(src_cfg.res_x)
    d = dst.select(
        "row", "col", rsrc.alias("_rs"), csrc.alias("_cs"),
        F.floor(rsrc).alias("_or"), F.floor(csrc).alias("_oc"),
    )
    offs = F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx")) for dy, dx in shifts])
    e = d.select(
        "row", "col", "_rs", "_cs", "_or", "_oc",
        F.explode(offs).alias("_o"),
    ).select(
        "row", "col", "_rs", "_cs",
        (F.col("_or") + F.col("_o.dy")).alias("_sr"),
        (F.col("_oc") + F.col("_o.dx")).alias("_sc"),
    )
    s = src.select(F.col("row").alias("_sr"), F.col("col").alias("_sc"), "value")
    j = e.join(s, ["_sr", "_sc"], "inner")
    dy = F.col("_sr").cast("double") - F.col("_rs")
    dx = F.col("_sc").cast("double") - F.col("_cs")
    d2 = dx * dx + dy * dy
    agg = j.groupBy("row", "col").agg(
        F.max(F.when(d2 == 0.0, F.col("value"))).alias("_exact"),
        F.sum(F.when(d2 > 0.0, F.col("value") / d2)).alias("_swv"),
        F.sum(F.when(d2 > 0.0, F.lit(1.0) / d2)).alias("_sw"),
    )
    out = agg.select(
        "row", "col",
        F.coalesce(F.col("_exact"), F.col("_swv") / F.col("_sw")).alias("value"),
    )
    return dst.select("row", "col").join(out, ["row", "col"], "left")


# ---------------------------------------------- value-level CDF stretches

# Acklam's rational approximation of the inverse normal CDF; the same
# coefficient chain is rendered as a Spark Column here and as SQL text in
# the catalog oracle, so both engines evaluate an identical expression tree.
ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
ACK_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
ACK_PLOW = 0.02425


def horner_col(coeffs, var):
    out = F.lit(coeffs[0])
    for c in coeffs[1:]:
        out = out * var + F.lit(c)
    return out


def probit_col(p):
    """Inverse normal CDF as a pure codegen Column (Acklam 2003)."""
    ql = F.sqrt(-2.0 * F.log(p))
    qh = F.sqrt(-2.0 * F.log(1.0 - p))
    qm = p - 0.5
    rm = qm * qm
    low = horner_col(ACK_C, ql) / (horner_col(ACK_D, ql) * ql + 1.0)
    high = -(horner_col(ACK_C, qh) / (horner_col(ACK_D, qh) * qh + 1.0))
    mid = horner_col(ACK_A, rm) * qm / (horner_col(ACK_B, rm) * rm + 1.0)
    return F.when(p < ACK_PLOW, low).when(p > 1.0 - ACK_PLOW, high).otherwise(mid)


def _value_cdf(raster: DataFrame, half_up: bool) -> DataFrame:
    """(value, p) frame: p = P(v <= value), or the rank-center
    (cum - 0.5)/n when half_up. Value-level aggregation + running sum over
    DISTINCT values — never a whole-raster single-partition window."""
    from pyspark.sql import Window

    n = raster.count()
    counts = raster.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("c").over(w).cast("double")
    p = (cum - 0.5) / F.lit(float(n)) if half_up else cum / F.lit(float(n))
    return counts.withColumn("p", p).select("value", "p")


def histogram_matching_uniform(raster: DataFrame, num_tones: int = 256) -> DataFrame:
    """HistogramMatching (image_analysis/histogram_matching.rs) with a
    uniform target on [0, num_tones-1]: the target quantile function is
    t -> (num_tones-1) * t, so out = cdf(z) * (num_tones-1)."""
    cdf = _value_cdf(raster, half_up=False)
    return raster.join(cdf, "value").select(
        "row", "col", (F.col("p") * float(num_tones - 1)).alias("value")
    )


def gaussian_contrast_stretch(raster: DataFrame) -> DataFrame:
    """GaussianContrastStretch (gaussian_contrast_stretch.rs, engine
    form): histogram-match onto a standard gaussian — out =
    probit((rank - 0.5)/n) via Acklam's analytic approximation (the
    reference interpolates a binned gaussian CDF lookup; documented
    deviation)."""
    cdf = _value_cdf(raster, half_up=True)
    return raster.join(cdf, "value").select(
        "row", "col", probit_col(F.col("p")).alias("value")
    )


def mosaic_resample(
    inputs: list[tuple[DataFrame, GridConfig]], dst_cfg: GridConfig, method: str = "nn"
) -> DataFrame:
    """Mosaic with a resampling method (mosaic.rs:20-24, same kernels as
    resample.rs): each input is resampled onto the destination grid and the
    FIRST input that yields a value at a cell wins (the reference's
    per-file loop with early exit). Input-order coalesce over per-input
    resamples reproduces that exactly."""
    parts = []
    for src, cfg in inputs:
        if method == "nn":
            parts.append(resample_nn(src, cfg, dst_cfg))
        else:
            parts.append(resample_idw(src, cfg, dst_cfg, method))
    renamed = [
        p.select("row", "col", F.col("value").alias(f"_v{i}")) for i, p in enumerate(parts)
    ]
    from functools import reduce

    joined = reduce(lambda a, b: a.join(b, ["row", "col"], "full_outer"), renamed)
    return joined.select(
        "row", "col",
        F.coalesce(*[F.col(f"_v{i}") for i in range(len(renamed))]).alias("value"),
    )
