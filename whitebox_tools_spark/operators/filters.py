"""Focal statistic filters (SURVEY.md §2.6) on the tile+halo engine.

Two window conventions in the reference, both transcribed exactly:
- plain filters (MaximumFilter/MinimumFilter/RangeFilter/TotalFilter/
  MedianFilter/DiversityFilter, image_analysis/max_filter.rs:300-340 etc.):
  window = [row±mid_y]x[col±mid_x] read via get_value — out-of-grid reads
  are NoData and skipped; the center must be valid.
- integral-image filters (StandardDeviationFilter,
  image_analysis/stdev_filter.rs:300-360; MeanFilter in focal.py): the
  clamped lower bound still subtracts the row-0/col-0 prefix, so windows
  that clamp EXCLUDE row 0 / col 0; stddev is POPULATION
  ((sum2 - sum^2/n)/n), computed on (value - min_val) offsets, sqrt'd,
  negative variance snapped to 0.

All run as numpy stencils over padded tiles: one 9-way edge explode + one
shuffle regardless of filter size (halo = window radius).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.gridding import GridConfig


def _window_reduce(block, valid, ky, kx, fn):
    """fn over each (ky x kx) window of the padded block (NaN = skip)."""
    mid_y, mid_x = ky // 2, kx // 2
    # pad so every cell of the block has a full-size window
    pb = np.pad(block, ((mid_y, mid_y), (mid_x, mid_x)), constant_values=np.nan)
    win = sliding_window_view(pb, (ky, kx))
    with np.errstate(all="ignore"):
        out = fn(win.reshape(win.shape[0], win.shape[1], -1))
    return np.where(valid, out, np.nan)


def _stat_fn(stat: str):
    if stat == "max":
        return lambda w: np.nanmax(w, axis=-1)
    if stat == "min":
        return lambda w: np.nanmin(w, axis=-1)
    if stat == "range":
        return lambda w: np.nanmax(w, axis=-1) - np.nanmin(w, axis=-1)
    if stat == "total":
        return lambda w: np.nansum(w, axis=-1)
    if stat == "median":
        return lambda w: np.nanmedian(w, axis=-1)
    if stat == "diversity":

        def diversity(w):
            s = np.sort(w, axis=-1)  # NaNs sort to the end
            distinct = np.zeros(s.shape[:-1], dtype=np.float64)
            prev_valid = ~np.isnan(s[..., 0])
            distinct += prev_valid
            for i in range(1, s.shape[-1]):
                cur = s[..., i]
                newv = ~np.isnan(cur) & (np.isnan(s[..., i - 1]) | (cur != s[..., i - 1]))
                distinct += newv
            return np.where(distinct > 0, distinct, np.nan)

        return diversity
    raise ValueError(stat)


def stat_filter(
    raster: DataFrame,
    cfg: GridConfig,
    stat: str,
    filter_x: int = 3,
    filter_y: int = 3,
    tile_size: int = 128,
) -> DataFrame:
    """MaximumFilter / MinimumFilter / RangeFilter / TotalFilter /
    MedianFilter / DiversityFilter."""
    fn = _stat_fn(stat)

    def stencil(block, valid, base_r, base_c, cfg_):
        return _window_reduce(block, valid, filter_y, filter_x, fn)

    halo = max(filter_x // 2, filter_y // 2)
    return focal_apply(raster, cfg, stencil, halo, tile_size)


def stdev_filter_stencil(filter_x: int, filter_y: int, min_val: float):
    """StandardDeviationFilter (stdev_filter.rs:300-360): clamped-integral
    windows (row/col 0 excluded when clamped), population variance over
    (value - min_val), negative variance -> 0."""
    mid_x, mid_y = filter_x // 2, filter_y // 2

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
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
        y2 = np.clip(g_rows + mid_y, None, cfg.rows - 1)
        x1 = np.clip(g_cols - mid_x - 1, 0, None)
        x2 = np.clip(g_cols + mid_x, None, cfg.cols - 1)
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

        s = boxsum(S)
        s2 = boxsum(S2)
        nw = boxsum(N)
        with np.errstate(invalid="ignore", divide="ignore"):
            v = (s2 - (s * s) / nw) / nw
            sd = np.where(v > 0, np.sqrt(np.where(v > 0, v, 0.0)), 0.0)
        out = np.where(nw > 0, sd, 0.0)
        return np.where(valid, out, np.nan)

    return stencil


def stdev_filter(
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
        raster, cfg, stdev_filter_stencil(filter_x, filter_y, float(min_val)), halo, tile_size
    )


# ------------------------------------------------------ convolution masks

# D8 neighbour order used by the 3x3 gradient filters (sobel_filter.rs:290)
_G_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_G_DY = (-1, 0, 1, 1, 1, 0, -1, -1)

GRADIENT_MASKS = {
    # (mask_x, mask_y) in _G_DX/_G_DY order
    "sobel": ((1.0, 2.0, 1.0, 0.0, -1.0, -2.0, -1.0, 0.0),
              (1.0, 0.0, -1.0, -2.0, -1.0, 0.0, 1.0, 2.0)),   # sobel_filter.rs:292-293
    "prewitt": ((1.0, 1.0, 1.0, 0.0, -1.0, -1.0, -1.0, 0.0),
                (1.0, 0.0, -1.0, -1.0, -1.0, 0.0, 1.0, 1.0)),  # prewitt_filter.rs
    "scharr": ((-3.0, -10.0, -3.0, 0.0, 3.0, 10.0, 3.0, 0.0),
               (3.0, 0.0, -3.0, -10.0, -3.0, 0.0, 3.0, 10.0)),  # scharr_filter.rs
}


def _shifted(block, valid, dx, dy):
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


def gradient_filter(
    raster: DataFrame, cfg: GridConfig, variant: str = "sobel", tile_size: int = 128
) -> DataFrame:
    """SobelFilter / PrewittFilter / ScharrFilter (3x3 variants):
    out = sqrt(sx^2 + sy^2) with NoData/out-of-grid neighbours replaced by
    the center value (sobel_filter.rs:300-312)."""
    mask_x, mask_y = GRADIENT_MASKS[variant]

    def stencil(block, valid, base_r, base_c, cfg_):
        sx = np.zeros_like(block)
        sy = np.zeros_like(block)
        for i, (dx, dy) in enumerate(zip(_G_DX, _G_DY)):
            shifted, vmask = _shifted(block, valid, dx, dy)
            zn = np.where(vmask, shifted, block)
            sx = sx + zn * mask_x[i]
            sy = sy + zn * mask_y[i]
        out = np.sqrt(sx * sx + sy * sy)
        return np.where(valid, out, np.nan)

    return focal_apply(raster, cfg, stencil, 1, tile_size)


# emboss direction kernels (emboss_filter.rs), row-major 3x3 over
# dx=(-1,0,1)x3, dy=(-1,-1,-1,0,0,0,1,1,1)
EMBOSS_WEIGHTS = {
    "n": (0, -1, 0, 0, 0, 0, 0, 1, 0),
    "s": (0, 1, 0, 0, 0, 0, 0, -1, 0),
    "e": (0, 0, 0, 1, 0, -1, 0, 0, 0),
    "w": (0, 0, 0, -1, 0, 1, 0, 0, 0),
    "ne": (0, 0, -1, 0, 0, 0, 1, 0, 0),
    "sw": (0, 0, 1, 0, 0, 0, -1, 0, 0),
    "nw": (-1, 0, 0, 0, 0, 0, 0, 0, 1),
    "se": (1, 0, 0, 0, 0, 0, 0, 0, -1),
}
_M_DX = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
_M_DY = (-1, -1, -1, 0, 0, 0, 1, 1, 1)


def mask_filter(
    raster: DataFrame,
    cfg: GridConfig,
    weights,
    offsets_dx=_M_DX,
    offsets_dy=_M_DY,
    tile_size: int = 128,
) -> DataFrame:
    """Generic weighted-mask filter (EmbossFilter, HighPassFilter,
    LaplacianFilter kernels): out = sum(zn * w), NoData neighbours take
    the center value."""

    def stencil(block, valid, base_r, base_c, cfg_):
        acc = np.zeros_like(block)
        for w, dx, dy in zip(weights, offsets_dx, offsets_dy):
            if w == 0:
                continue
            shifted, vmask = _shifted(block, valid, dx, dy)
            zn = np.where(vmask, shifted, block)
            acc = acc + zn * float(w)
        return np.where(valid, acc, np.nan)

    halo = max(max(abs(d) for d in offsets_dx), max(abs(d) for d in offsets_dy))
    return focal_apply(raster, cfg, stencil, halo, tile_size)


def emboss_filter(
    raster: DataFrame, cfg: GridConfig, direction: str = "n", tile_size: int = 128
) -> DataFrame:
    return mask_filter(raster, cfg, EMBOSS_WEIGHTS[direction], tile_size=tile_size)
