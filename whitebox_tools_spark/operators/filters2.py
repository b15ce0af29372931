"""Second filter batch (SURVEY.md §2.6 convolution / value-adaptive
family): Gaussian-kernel filters, fixed-mask derivatives, and
value-conditional smoothing filters, all on the tile+halo stencil runner;
plus IntegralImage as a pure window-function DataFrame op (the classic
distributed summed-area table).

NoData convention: missing cells are NaN in the padded block; Gaussian
family renormalizes over the valid weights (gaussian_filter.rs:331-340),
mask family substitutes the centre value (laplacian_filter.rs:364-368),
value-conditional family skips invalid neighbours.
"""

from __future__ import annotations

import math
import warnings

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.gridding import GridConfig


# ------------------------------------------------------- gaussian kernels


def gaussian_size(sigma: float) -> int:
    """Kernel sizing rule (gaussian_filter.rs:212-231): smallest odd size
    whose tail weight falls below 0.001, min 3."""
    recip = 1.0 / (math.sqrt(2.0 * math.pi) * sigma)
    two_sigma_sqr = 2.0 * sigma * sigma
    filter_size = 0
    for i in range(250):
        weight = recip * math.exp(-1.0 * (i * i) / two_sigma_sqr)
        if weight <= 0.001:
            filter_size = i * 2 + 1
            break
    if filter_size % 2 == 0:
        filter_size += 1
    return max(filter_size, 3)


def gaussian_offsets_weights(sigma: float):
    """(dx, dy, w) triples in the reference's row-major kernel order
    (gaussian_filter.rs:239-252)."""
    size = gaussian_size(sigma)
    mid = int(math.floor(size / 2.0))
    recip = 1.0 / (math.sqrt(2.0 * math.pi) * sigma)
    two_sigma_sqr = 2.0 * sigma * sigma
    out = []
    for r in range(size):
        for c in range(size):
            x, y = c - mid, r - mid
            out.append((x, y, recip * math.exp(-1.0 * (x * x + y * y) / two_sigma_sqr)))
    return out


def log_offsets_weights(sigma: float):
    """Laplacian-of-Gaussian weights (log_filter.rs:238-254); sizing uses
    the plain Gaussian rule."""
    size = gaussian_size(sigma)
    mid = int(math.floor(size / 2.0))
    term1 = -1.0 / (math.pi * sigma * sigma * sigma * sigma)
    two_sigma_sqr = 2.0 * sigma * sigma
    out = []
    for r in range(size):
        for c in range(size):
            x, y = c - mid, r - mid
            d2 = float(x * x + y * y)
            out.append((x, y, term1 * (1.0 - d2 / two_sigma_sqr) * math.exp(-d2 / two_sigma_sqr)))
    return out


def _shift(block, valid, dx: int, dy: int):
    size_r, size_c = block.shape
    shifted = np.full_like(block, np.nan)
    vmask = np.zeros_like(valid)
    src_r = slice(max(dy, 0), size_r + min(dy, 0))
    dst_r = slice(max(-dy, 0), size_r + min(-dy, 0))
    src_c = slice(max(dx, 0), size_c + min(dx, 0))
    dst_c = slice(max(-dx, 0), size_c + min(-dx, 0))
    shifted[dst_r, dst_c] = block[src_r, src_c]
    vmask[dst_r, dst_c] = valid[src_r, src_c]
    return shifted, vmask


def _weighted_normalized_stencil(oww):
    """Sum(w*zn)/Sum(w) over valid neighbours (gaussian_filter.rs:331-340,
    log_filter.rs apply loop)."""

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        num = np.zeros_like(block)
        den = np.zeros_like(block)
        for dx, dy, w in oww:
            sh, vm = _shift(block, valid, dx, dy)
            num += np.where(vm, w * sh, 0.0)
            den += np.where(vm, w, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = num / den
        return np.where(valid, out, np.nan)

    return stencil


def gaussian_filter(
    raster: DataFrame, cfg: GridConfig, sigma: float = 0.75, tile_size: int = 128
) -> DataFrame:
    oww = gaussian_offsets_weights(sigma)
    halo = gaussian_size(sigma) // 2
    return focal_apply(raster, cfg, _weighted_normalized_stencil(oww), halo, tile_size)


def log_filter(
    raster: DataFrame, cfg: GridConfig, sigma: float = 2.0, tile_size: int = 128
) -> DataFrame:
    oww = log_offsets_weights(sigma)
    halo = gaussian_size(sigma) // 2
    return focal_apply(raster, cfg, _weighted_normalized_stencil(oww), halo, tile_size)


def dog_filter(
    raster: DataFrame,
    cfg: GridConfig,
    sigma1: float = 2.0,
    sigma2: float = 4.0,
    tile_size: int = 128,
) -> DataFrame:
    """DiffOfGaussianFilter (dog_filter.rs): blur(sigma1) - blur(sigma2),
    each normalized over its valid weights."""
    o1 = gaussian_offsets_weights(sigma1)
    o2 = gaussian_offsets_weights(sigma2)
    s1 = _weighted_normalized_stencil(o1)
    s2 = _weighted_normalized_stencil(o2)

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        return s1(block, valid, base_r, base_c, cfg_) - s2(block, valid, base_r, base_c, cfg_)

    halo = max(gaussian_size(sigma1), gaussian_size(sigma2)) // 2
    return focal_apply(raster, cfg, stencil, halo, tile_size)


def unsharp_masking(
    raster: DataFrame,
    cfg: GridConfig,
    sigma: float = 0.75,
    amount: float = 100.0,
    threshold: float = 0.0,
    tile_size: int = 128,
) -> DataFrame:
    """UnsharpMasking (unsharp_masking.rs:232,375-384): gaussian blur,
    diff = z - blur; z + diff*(amount/100+1) where diff > |threshold|."""
    oww = gaussian_offsets_weights(sigma)
    amt = amount / 100.0 + 1.0
    blur = _weighted_normalized_stencil(oww)

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        b = blur(block, valid, base_r, base_c, cfg_)
        diff = block - b
        with np.errstate(invalid="ignore"):
            out = np.where(diff > abs(threshold), block + diff * amt, block)
        return np.where(valid, out, np.nan)

    halo = gaussian_size(sigma) // 2
    return focal_apply(raster, cfg, stencil, halo, tile_size)


# --------------------------------------------------------- fixed masks

LAPLACIAN_MASKS = {
    # laplacian_filter.rs:310-333 — (weights, dx, dy)
    "3x3(1)": ([0.0, -1.0, 0.0, -1.0, 4.0, -1.0, 0.0, -1.0, 0.0], 3),
    "3x3(2)": ([0.0, -1.0, 0.0, -1.0, 5.0, -1.0, 0.0, -1.0, 0.0], 3),
    "3x3(3)": ([-1.0, -1.0, -1.0, -1.0, 8.0, -1.0, -1.0, -1.0, -1.0], 3),
    "3x3(4)": ([1.0, -2.0, 1.0, -2.0, 4.0, -2.0, 1.0, -2.0, 1.0], 3),
    "5x5(1)": (
        [0.0, 0.0, -1.0, 0.0, 0.0, 0.0, -1.0, -2.0, -1.0, 0.0, -1.0, -2.0, 17.0,
         -2.0, -1.0, 0.0, -1.0, -2.0, -1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0], 5),
    "5x5(2)": (
        [0.0, 0.0, -1.0, 0.0, 0.0, 0.0, -1.0, -2.0, -1.0, 0.0, -1.0, -2.0, 16.0,
         -2.0, -1.0, 0.0, -1.0, -2.0, -1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0], 5),
}

LINE_DETECTION_MASKS = {
    # line_detection_filter.rs:289-297, row-major 3x3 (dx=-1,0,1 x dy=-1,0,1)
    "v": [-1.0, 2.0, -1.0, -1.0, 2.0, -1.0, -1.0, 2.0, -1.0],
    "h": [-1.0, -1.0, -1.0, 2.0, 2.0, 2.0, -1.0, -1.0, -1.0],
    "135": [2.0, -1.0, -1.0, -1.0, 2.0, -1.0, -1.0, -1.0, 2.0],
    "45": [-1.0, -1.0, 2.0, -1.0, 2.0, -1.0, 2.0, -1.0, -1.0],
}


def _mask_substitute_stencil(weights, size, absvals=False):
    """Mask with centre-substitution for NoData (laplacian_filter.rs
    :364-370, line_detection_filter.rs)."""
    mid = size // 2
    offs = [(c - mid, r - mid) for r in range(size) for c in range(size)]

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        acc = np.zeros_like(block)
        for (dx, dy), w in zip(offs, weights):
            if w == 0.0:
                continue
            sh, vm = _shift(block, valid, dx, dy)
            acc += w * np.where(vm, sh, block)
        if absvals:
            acc = np.abs(acc)
        return np.where(valid, acc, np.nan)

    return stencil


def laplacian_filter(
    raster: DataFrame, cfg: GridConfig, variant: str = "3x3(1)", tile_size: int = 128
) -> DataFrame:
    weights, size = LAPLACIAN_MASKS[variant]
    return focal_apply(
        raster, cfg, _mask_substitute_stencil(weights, size), size // 2, tile_size
    )


def line_detection_filter(
    raster: DataFrame,
    cfg: GridConfig,
    variant: str = "v",
    absvals: bool = False,
    tile_size: int = 128,
) -> DataFrame:
    weights = LINE_DETECTION_MASKS[variant]
    return focal_apply(
        raster, cfg, _mask_substitute_stencil(weights, 3, absvals), 1, tile_size
    )


def roberts_filter(raster: DataFrame, cfg: GridConfig, tile_size: int = 128) -> DataFrame:
    """RobertsCrossFilter (roberts_filter.rs:276-297):
    |z - z(r+1,c+1)| + |z(r,c+1) - z(r+1,c)| with centre substitution."""

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        z2, v2 = _shift(block, valid, 1, 0)
        z3, v3 = _shift(block, valid, 0, 1)
        z4, v4 = _shift(block, valid, 1, 1)
        z2 = np.where(v2, z2, block)
        z3 = np.where(v3, z3, block)
        z4 = np.where(v4, z4, block)
        out = np.abs(block - z4) + np.abs(z2 - z3)
        return np.where(valid, out, np.nan)

    return focal_apply(raster, cfg, stencil, 1, tile_size)


# ------------------------------------------- value-conditional smoothing


def _window_stack(block, valid, fy: int, fx: int):
    """(rows, cols, fy*fx) stack in row-major kernel order, NaN missing."""
    my, mx = fy // 2, fx // 2
    pb = np.pad(
        np.where(valid, block, np.nan), ((my, my), (mx, mx)), constant_values=np.nan
    )
    win = sliding_window_view(pb, (fy, fx))
    return win.reshape(win.shape[0], win.shape[1], -1)


def conservative_smoothing_filter(
    raster: DataFrame,
    cfg: GridConfig,
    filter_x: int = 3,
    filter_y: int = 3,
    tile_size: int = 128,
) -> DataFrame:
    """ConservativeSmoothingFilter (conservative_smoothing_filter.rs
    :356-381): centre kept when strictly inside the window range; a
    centre at the window min (max) is raised (lowered) to the second
    order statistic. Deviation: the reference's second value is the
    second-smallest *column minimum*; we use the true second-smallest
    window value (multiset semantics)."""

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        w = _window_stack(block, valid, filter_y, filter_x)
        sw = np.sort(w, axis=-1)  # NaNs go last
        mn = sw[..., 0]
        mn2 = sw[..., 1]
        with np.errstate(invalid="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN halo
            nvalid = np.sum(~np.isnan(w), axis=-1)
            mx = np.nanmax(w, axis=-1)
            # second largest: index nvalid-2 in the sorted (NaN-last) stack
            idx2 = np.clip(nvalid - 2, 0, w.shape[-1] - 1)
            mx2 = np.take_along_axis(sw, idx2[..., None], axis=-1)[..., 0]
            out = np.where(
                (block > mn) & (block < mx),
                block,
                np.where(
                    block == mn,
                    np.where(np.isnan(mn2), mn, mn2),
                    np.where(np.isnan(mx2), mx, mx2),
                ),
            )
        return np.where(valid, out, np.nan)

    return focal_apply(
        raster, cfg, stencil, max(filter_x // 2, filter_y // 2), tile_size
    )


def adaptive_filter(
    raster: DataFrame,
    cfg: GridConfig,
    filter_x: int = 3,
    filter_y: int = 3,
    threshold: float = 2.0,
    min_val: float | None = None,
    tile_size: int = 128,
) -> DataFrame:
    """AdaptiveFilter (adaptive_filter.rs:416-433): clamped-integral
    window mean/stdev (StandardDeviationFilter indexing, row/col 0
    excluded when clamped); centre replaced by the window mean where
    (z - mean)/sd > threshold (one-sided, as in the reference)."""
    if min_val is None:
        min_val = raster.agg(F.min("value")).collect()[0][0]
    mid_x, mid_y = filter_x // 2, filter_y // 2

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        size_r, size_c = block.shape
        a = np.where(valid, block - min_val, 0.0)
        n = valid.astype(np.int64)
        S = np.zeros((size_r + 1, size_c + 1))
        S2 = np.zeros((size_r + 1, size_c + 1))
        N = np.zeros((size_r + 1, size_c + 1), dtype=np.int64)
        S[1:, 1:] = np.cumsum(np.cumsum(a, axis=0), axis=1)
        S2[1:, 1:] = np.cumsum(np.cumsum(a * a, axis=0), axis=1)
        N[1:, 1:] = np.cumsum(np.cumsum(n, axis=0), axis=1)
        g_rows = np.arange(base_r, base_r + size_r)
        g_cols = np.arange(base_c, base_c + size_c)
        y1 = np.clip(g_rows - mid_y - 1, 0, None)
        y2 = np.clip(g_rows + mid_y, None, cfg_.rows - 1)
        x1 = np.clip(g_cols - mid_x - 1, 0, None)
        x2 = np.clip(g_cols + mid_x, None, cfg_.cols - 1)
        lo_r = np.clip(y1 + 1 - base_r, 0, size_r)
        hi_r = np.clip(y2 + 1 - base_r, 0, size_r)
        lo_c = np.clip(x1 + 1 - base_c, 0, size_c)
        hi_c = np.clip(x2 + 1 - base_c, 0, size_c)

        def boxsum(M):
            return (
                M[np.ix_(hi_r, hi_c)]
                - M[np.ix_(lo_r, hi_c)]
                - M[np.ix_(hi_r, lo_c)]
                + M[np.ix_(lo_r, lo_c)]
            )

        s, s2, nw = boxsum(S), boxsum(S2), boxsum(N)
        with np.errstate(invalid="ignore", divide="ignore"):
            v = (s2 - (s * s) / nw) / nw
            sd = np.sqrt(v)
            mean = s / nw + min_val
            replace = (v > 0) & ((block - mean) / sd > threshold)
        out = np.where((nw > 0) & replace, mean, block)
        return np.where(valid, out, np.nan)

    return focal_apply(raster, cfg, stencil, max(mid_x, mid_y) + 1, tile_size)


def bilateral_filter(
    raster: DataFrame,
    cfg: GridConfig,
    sigma_dist: float = 0.75,
    sigma_int: float = 1.0,
    tile_size: int = 128,
) -> DataFrame:
    """BilateralFilter (bilateral_filter.rs): spatial gaussian weight
    table x intensity gaussian of (zn - z); normalized over valid."""
    oww = gaussian_offsets_weights(sigma_dist)
    recip_i = 1.0 / (math.sqrt(2.0 * math.pi) * sigma_int)
    two_sigma_sqr_i = 2.0 * sigma_int * sigma_int

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        num = np.zeros_like(block)
        den = np.zeros_like(block)
        for dx, dy, wd in oww:
            sh, vm = _shift(block, valid, dx, dy)
            with np.errstate(invalid="ignore"):
                wi = recip_i * np.exp(-1.0 * ((sh - block) * (sh - block)) / two_sigma_sqr_i)
                w = np.where(vm, wd * wi, 0.0)
            num += np.where(vm, w * sh, 0.0)
            den += w
        with np.errstate(invalid="ignore", divide="ignore"):
            out = num / den
        return np.where(valid, out, np.nan)

    halo = gaussian_size(sigma_dist) // 2
    return focal_apply(raster, cfg, stencil, halo, tile_size)


def edge_preserving_mean_filter(
    raster: DataFrame,
    cfg: GridConfig,
    filter_x: int = 3,
    filter_y: int = 3,
    threshold: float = 15.0,
    tile_size: int = 128,
) -> DataFrame:
    """EdgePreservingMeanFilter (edge_preserving_mean_filter.rs:300-320):
    mean of valid window cells with |zn - z| <= threshold (centre always
    qualifies)."""

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        w = _window_stack(block, valid, filter_y, filter_x)
        with np.errstate(invalid="ignore"):
            keep = np.abs(w - block[..., None]) <= threshold
            s = np.nansum(np.where(keep, w, 0.0), axis=-1)
            n = np.sum(keep & ~np.isnan(w), axis=-1)
            out = s / n
        return np.where(valid, out, np.nan)

    return focal_apply(raster, cfg, stencil, max(filter_x // 2, filter_y // 2), tile_size)


def k_nearest_mean_filter(
    raster: DataFrame,
    cfg: GridConfig,
    filter_x: int = 3,
    filter_y: int = 3,
    k: int = 5,
    tile_size: int = 128,
) -> DataFrame:
    """KNearestMeanFilter (k_nearest_mean_filter.rs:325-361): mean of the
    k window values (centre included) closest in value to the centre;
    stable (row-major window order) tie-break as in the reference's
    stable sort; invalid neighbours sort last (INFINITY) and are excluded
    from the mean."""

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        w = _window_stack(block, valid, filter_y, filter_x)
        key = np.where(np.isnan(w), np.inf, (w - block[..., None]) ** 2)
        order = np.argsort(key, axis=-1, kind="stable")[..., :k]
        picked = np.take_along_axis(w, order, axis=-1)
        with np.errstate(invalid="ignore"):
            n = np.sum(~np.isnan(picked), axis=-1)
            s = np.nansum(picked, axis=-1)
            out = np.where(n > 0, s / n, np.nan)
        return np.where(valid, out, np.nan)

    return focal_apply(raster, cfg, stencil, max(filter_x // 2, filter_y // 2), tile_size)


def lee_filter(
    raster: DataFrame,
    cfg: GridConfig,
    filter_x: int = 9,
    filter_y: int = 9,
    sigma: float = 10.0,
    m: float = 5.0,
    tile_size: int = 128,
) -> DataFrame:
    """LeeSigmaFilter (lee_filter.rs:343-371): mean of window values in
    [z-sigma, z+sigma]; if that population is <= m, fall back to the mean
    of the valid 8-neighbours (NoData if none)."""
    m = min(m, float(filter_x * filter_y))

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        w = _window_stack(block, valid, filter_y, filter_x)
        with np.errstate(invalid="ignore"):
            inband = (
                ~np.isnan(w)
                & (w >= block[..., None] - sigma)
                & (w <= block[..., None] + sigma)
            )
            n = np.sum(inband, axis=-1)
            s = np.nansum(np.where(inband, w, 0.0), axis=-1)
            band_mean = s / n
        ring = _window_stack(block, valid, 3, 3)
        ring = np.delete(ring, 4, axis=-1)  # drop centre
        with np.errstate(invalid="ignore"):
            rn = np.sum(~np.isnan(ring), axis=-1)
            rs = np.nansum(ring, axis=-1)
            ring_mean = np.where(rn > 0, rs / rn, np.nan)
        out = np.where(n > m, band_mean, ring_mean)
        return np.where(valid, out, np.nan)

    return focal_apply(raster, cfg, stencil, max(filter_x // 2, filter_y // 2), tile_size)


def highpass_median_filter(
    raster: DataFrame,
    cfg: GridConfig,
    filter_x: int = 3,
    filter_y: int = 3,
    tile_size: int = 128,
) -> DataFrame:
    """HighPassMedianFilter (highpass_median_filter.rs:455-473): z minus
    the window median. Deviation: the reference medians over sig-digit
    bins (floor); we take the exact median of the valid window values
    (averaging convention for even counts, as MedianFilter here)."""

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        w = _window_stack(block, valid, filter_y, filter_x)
        with np.errstate(all="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN halo
            med = np.nanmedian(w, axis=-1)
        return np.where(valid, block - med, np.nan)

    return focal_apply(raster, cfg, stencil, max(filter_x // 2, filter_y // 2), tile_size)


# --------------------------------------------------- integral image (SAT)


def integral_image(raster: DataFrame, cfg: GridConfig) -> DataFrame:
    """IntegralImage (integral_image.rs:186-205): summed-area table,
    NoData treated as 0; defined for every grid cell.

    Spark-first: densify the grid (range cross-join + left join of the
    sparse cells), then two chained running-sum windows (row-wise then
    column-wise). Each window partition is a single grid row/column —
    sequential within, parallel across; for tile-partitioned rasters at
    scale the same result is the per-tile SAT + tile-offset broadcast."""
    spark = raster.sparkSession
    rows = spark.range(cfg.rows).select(F.col("id").alias("row"))
    cols = spark.range(cfg.cols).select(F.col("id").alias("col"))
    dense = rows.crossJoin(cols).join(raster, ["row", "col"], "left").select(
        "row", "col", F.coalesce("value", F.lit(0.0)).alias("v")
    )
    w_row = (
        Window.partitionBy("row").orderBy("col").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_col = (
        Window.partitionBy("col").orderBy("row").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        dense.withColumn("rc", F.sum("v").over(w_row))
        .withColumn("value", F.sum("rc").over(w_col))
        .select("row", "col", "value")
    )
