"""Terrain-analysis kernels (SURVEY.md §2.6 terrain 3x3 family + windowed
multi-scale positions) on the shared tile+halo stencil runner
(`operators.focal.focal_apply`).

Reference semantics (cited per function; NoData deviations documented):
our rasters carry missing cells as absent rows / NaN in the padded block,
never the -32768 sentinel, so comparisons against NoData neighbours are
explicit `valid` tests here while the reference sometimes lets the
sentinel participate (e.g. num_downslope_neighbours counts a -32768
neighbour as "downslope"). We use the cleaner semantics and mirror them
exactly in the DuckDB oracles.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.gridding import GridConfig

# the canonical reference neighbour order (plan_curvature.rs:255-256 etc.):
# NE, E, SE, S, SW, W, NW, N
D_X = (1, 1, 1, 0, -1, -1, -1, 0)
D_Y = (-1, 0, 1, 1, 1, 0, -1, -1)


def _shift(block, valid, dx: int, dy: int):
    """Neighbour plane at (row+dy, col+dx); NaN/False outside."""
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


def _ring8(block, valid):
    return [_shift(block, valid, dx, dy) for dx, dy in zip(D_X, D_Y)]


# ------------------------------------------------------------- curvatures


def _curvature_stencil(kind: str, z_factor: float):
    """Gallant & Wilson curvatures (plan_curvature.rs:283-297,
    prof_curvature.rs:285-300, tan_curvature.rs:275-290,
    total_curvature.rs kernel): NoData neighbours replaced by the centre
    value, derivatives over res_x, result degrees*100; plan/profile/
    tangential are NoData where zx^2+zy^2 == 0 (flat), total is always
    defined."""

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        z = block * z_factor
        n = [
            np.where(vm, sh * z_factor, z) for sh, vm in _ring8(block, valid)
        ]
        cs2 = cfg.res_x * 2.0
        css = cfg.res_x * cfg.res_x
        with np.errstate(invalid="ignore", divide="ignore"):
            zx = (n[1] - n[5]) / cs2
            zy = (n[7] - n[3]) / cs2
            zxx = (n[1] - 2.0 * z + n[5]) / css
            zyy = (n[7] - 2.0 * z + n[3]) / css
            zxy = (-n[6] + n[0] + n[4] - n[2]) / (css * 4.0)
            zx2 = zx * zx
            zy2 = zy * zy
            p = zx2 + zy2
            q = p + 1.0
            if kind == "plan":
                out = np.degrees(
                    (zxx * zy2 - 2.0 * zxy * zx * zy + zyy * zx2) / p ** 1.5
                ) * 100.0
            elif kind == "profile":
                out = np.degrees(
                    (zxx * zx2 + 2.0 * zxy * zx * zy + zyy * zy2)
                    / (p * q ** 1.5)
                ) * 100.0
            elif kind == "tangential":
                out = np.degrees(
                    (zxx * zy2 + 2.0 * zxy * zx * zy + zyy * zx2)
                    / (p * np.sqrt(q))
                ) * 100.0
            elif kind == "total":
                out = np.degrees(zxx * zxx + 2.0 * zxy * zxy + zyy * zyy) * 100.0
            else:  # pragma: no cover
                raise ValueError(kind)
        if kind != "total":
            out = np.where(p > 0.0, out, np.nan)
        return np.where(valid, out, np.nan)

    return stencil


def curvature(
    raster: DataFrame,
    cfg: GridConfig,
    kind: str = "plan",
    z_factor: float = 1.0,
    tile_size: int = 128,
) -> DataFrame:
    return focal_apply(raster, cfg, _curvature_stencil(kind, z_factor), 1, tile_size)


# --------------------------------------------------- simple 3x3 kernels


def _ruggedness_stencil(z_factor: float):
    """RuggednessIndex (ruggedness_index.rs:240-263): RMS of elevation
    differences to the valid 8-neighbours."""

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        z = block * z_factor
        ss = np.zeros_like(block)
        cnt = np.zeros_like(block)
        for sh, vm in _ring8(block, valid):
            zn = np.where(vm, sh * z_factor, 0.0)
            d = np.where(vm, zn - z, 0.0)
            ss += d * d
            cnt += vm
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.sqrt(ss / cnt)
        return np.where(valid & (cnt > 0), out, np.nan)

    return stencil


def ruggedness_index(
    raster: DataFrame, cfg: GridConfig, z_factor: float = 1.0, tile_size: int = 128
) -> DataFrame:
    return focal_apply(raster, cfg, _ruggedness_stencil(z_factor), 1, tile_size)


def _updown_count_stencil(direction: str):
    """Num{Down,Up}slopeNeighbours (num_downslope_neighbours.rs:210-218):
    count of 8-neighbours strictly lower (resp. higher) than the centre.
    Deviation: the reference compares the raw sentinel (NoData = -32768
    counts as 'lower'); we count only valid neighbours."""

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        cnt = np.zeros_like(block)
        for sh, vm in _ring8(block, valid):
            if direction == "down":
                cnt += np.where(vm & (sh < block), 1.0, 0.0)
            else:
                cnt += np.where(vm & (sh > block), 1.0, 0.0)
        return np.where(valid, cnt, np.nan)

    return stencil


def num_downslope_neighbours(
    raster: DataFrame, cfg: GridConfig, tile_size: int = 128
) -> DataFrame:
    return focal_apply(raster, cfg, _updown_count_stencil("down"), 1, tile_size)


def num_upslope_neighbours(
    raster: DataFrame, cfg: GridConfig, tile_size: int = 128
) -> DataFrame:
    return focal_apply(raster, cfg, _updown_count_stencil("up"), 1, tile_size)


def _downslope_change_stencil(cfg: GridConfig, minimum: bool):
    """Max/MinDownslopeElevChange (max_downslope_elev_change.rs:240-276):
    elevation drop to the steepest (resp. gentlest non-negative) downslope
    neighbour; NoData where no qualifying neighbour exists."""
    diag = math.sqrt(cfg.res_x * cfg.res_x + cfg.res_y * cfg.res_y)
    lens = (diag, cfg.res_x, diag, cfg.res_y, diag, cfg.res_x, diag, cfg.res_y)

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        best_slope = np.full_like(block, -np.inf if not minimum else np.inf)
        change = np.full_like(block, np.nan)
        for (sh, vm), dist in zip(_ring8(block, valid), lens):
            with np.errstate(invalid="ignore"):
                slope = (block - sh) / dist
                if minimum:
                    better = vm & (slope >= 0.0) & (slope < best_slope)
                else:
                    better = vm & (sh < block) & (slope > best_slope)
            best_slope = np.where(better, slope, best_slope)
            change = np.where(better, block - sh, change)
        if minimum:
            ok = np.isfinite(best_slope)
        else:
            ok = best_slope > 0.0
        return np.where(valid & ok, change, np.nan)

    return stencil


def max_downslope_elev_change(
    raster: DataFrame, cfg: GridConfig, tile_size: int = 128
) -> DataFrame:
    return focal_apply(raster, cfg, _downslope_change_stencil(cfg, False), 1, tile_size)


def min_downslope_elev_change(
    raster: DataFrame, cfg: GridConfig, tile_size: int = 128
) -> DataFrame:
    return focal_apply(raster, cfg, _downslope_change_stencil(cfg, True), 1, tile_size)


def _find_ridges_stencil():
    """FindRidges (find_ridges.rs, no line-thinning): cell is a ridge
    (1.0) iff both N/S neighbours are valid and lower, or both W/E
    neighbours are valid and lower; other cells are NoData (background),
    as in the reference output raster."""

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        nN, vN = _shift(block, valid, 0, -1)
        nS, vS = _shift(block, valid, 0, 1)
        nW, vW = _shift(block, valid, -1, 0)
        nE, vE = _shift(block, valid, 1, 0)
        with np.errstate(invalid="ignore"):
            ns = vN & vS & (nN < block) & (nS < block)
            we = vW & vE & (nW < block) & (nE < block)
        return np.where(valid & (ns | we), 1.0, np.nan)

    return stencil


def find_ridges(raster: DataFrame, cfg: GridConfig, tile_size: int = 128) -> DataFrame:
    return focal_apply(raster, cfg, _find_ridges_stencil(), 1, tile_size)


def _relative_aspect_stencil(azimuth: float, z_factor: float):
    """RelativeAspect (relative_aspect.rs:250-278): Horn aspect minus the
    given azimuth, folded to [0,180]; flat cells (fx == 0) -> -1."""
    from whitebox_tools_spark.operators.focal import horn_fxfy

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        fx, fy = horn_fxfy(block, valid, z_factor, cfg.res_x)
        with np.errstate(invalid="ignore", divide="ignore"):
            a = np.abs(
                (180.0 - np.degrees(np.arctan(fy / fx)) + 90.0 * np.sign(fx))
                - azimuth
            )
            a = np.where(a > 180.0, 360.0 - a, a)
        out = np.where(fx != 0.0, a, -1.0)
        return np.where(valid, out, np.nan)

    return stencil


def relative_aspect(
    raster: DataFrame,
    cfg: GridConfig,
    azimuth: float = 0.0,
    z_factor: float = 1.0,
    tile_size: int = 128,
) -> DataFrame:
    return focal_apply(
        raster, cfg, _relative_aspect_stencil(azimuth, z_factor), 1, tile_size
    )


def _surface_area_ratio_stencil(cfg: GridConfig):
    """SurfaceAreaRatio (surface_area_ratio.rs:214-310, Jenness 2004):
    eight triangular facets from half-distances to the 3x3 neighbours;
    facets with a NoData vertex shrink the planar area by 1/8."""
    dx9 = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
    dy9 = (-1, -1, -1, 0, 0, 0, 1, 1, 1)
    dist_pairs = (
        (0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8),
        (0, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8),
        (4, 0), (4, 2), (4, 6), (4, 8),
    )
    tri = (
        (0, 7, 12), (1, 7, 13), (2, 6, 12), (3, 8, 13),
        (2, 9, 14), (3, 11, 15), (4, 10, 14), (5, 10, 15),
    )
    resx, resy = cfg.res_x, cfg.res_y
    res_diag = math.sqrt(resx * resx + resy * resy)
    planar = [resx] * 6 + [resy] * 6 + [res_diag] * 4
    cell_area = resx * resy
    eighth = cell_area / 8.0

    def stencil(block, valid, base_r, base_c, cfg_: GridConfig):
        zs, vs = [], []
        for dx, dy in zip(dx9, dy9):
            sh, vm = _shift(block, valid, dx, dy)
            zs.append(sh)
            vs.append(vm)
        dists = []
        for (a, b), dp in zip(dist_pairs, planar):
            ok = vs[a] & vs[b]
            with np.errstate(invalid="ignore"):
                zdiff = np.abs(np.where(ok, zs[a], 0.0) - np.where(ok, zs[b], 0.0))
                d = np.sqrt(dp * dp + zdiff * zdiff) / 2.0
            dists.append(np.where(ok, d, 0.0))
        area = np.zeros_like(block)
        planar_area = np.full_like(block, cell_area)
        for p_i, q_i, r_i in tri:
            p, q, r = dists[p_i], dists[q_i], dists[r_i]
            nonzero = (p * q * r) != 0.0
            s = (p + q + r) / 2.0
            with np.errstate(invalid="ignore"):
                a = np.sqrt(s * (s - p) * (s - q) * (s - r))
            area = np.where(nonzero, area + a, area)
            planar_area = np.where(nonzero, planar_area, planar_area - eighth)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = area / planar_area
        return np.where(valid & (planar_area > 0.0), out, np.nan)

    return stencil


def surface_area_ratio(
    raster: DataFrame, cfg: GridConfig, tile_size: int = 128
) -> DataFrame:
    return focal_apply(raster, cfg, _surface_area_ratio_stencil(cfg), 1, tile_size)


# ------------------------------------------------ windowed (radius) ops


def _window_position_stencil(rx: int, ry: int, mode: str):
    """Windowed relative-position family over the clamped
    (2*ry+1)x(2*rx+1) neighbourhood of valid cells (centre included):

    - dev:  DevFromMeanElev (dev_from_mean_elev.rs:400-435) —
      (z - mean)/population stdev, 0 where variance == 0.
    - diff: DiffFromMeanElev (diff_from_mean_elev.rs:405-414) — z - mean.
    - pctl: ElevPercentile (elev_percentile.rs:420-436) — percent of
      valid window cells strictly below z (the reference bins values at
      sig-digit precision; we compare exactly).
    - range: PercentElevRange (percent_elev_range.rs) —
      (z - min)/(max - min)*100, 0 where the window is flat.
    - rtp:  RelativeTopographicPosition
      (relative_topographic_position.rs:367-380).

    Deviation from the reference's integral-image edge clamp: its window
    lower bound drops the first row/col at the grid border (x1 clamp
    before the exclusive prefix index); we use the natural clamped
    window.
    """

    def stencil(block, valid, base_r, base_c, cfg: GridConfig):
        size_r, size_c = block.shape
        out = np.full_like(block, np.nan)
        z0 = np.where(valid, block, np.nan)
        # stack all window offsets (bounded: rx, ry small; vectorized per
        # offset, no per-cell python)
        n = np.zeros_like(block)
        s = np.zeros_like(block)
        ss = np.zeros_like(block)
        less = np.zeros_like(block)
        mn = np.full_like(block, np.inf)
        mx = np.full_like(block, -np.inf)
        for dy in range(-ry, ry + 1):
            for dx in range(-rx, rx + 1):
                sh, vm = _shift(block, valid, dx, dy)
                v = np.where(vm, sh, 0.0)
                n += vm
                s += v
                ss += v * v
                with np.errstate(invalid="ignore"):
                    less += vm & (sh < block)
                    mn = np.where(vm & (sh < mn), sh, mn)
                    mx = np.where(vm & (sh > mx), sh, mx)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
            if mode == "dev":
                var = (ss - (s * s) / n) / n
                sd = np.sqrt(var)
                out = np.where(var > 0.0, (z0 - mean) / sd, 0.0)
            elif mode == "diff":
                out = z0 - mean
            elif mode == "pctl":
                out = less / n * 100.0
            elif mode == "range":
                rng = mx - mn
                out = np.where(rng > 0.0, (z0 - mn) / rng * 100.0, 0.0)
            elif mode == "rtp":
                below = (z0 - mean) / (mean - mn)
                above = (z0 - mean) / (mx - mean)
                out = np.where(z0 < mean, below, np.where(mx > mean, above, 0.0))
            else:  # pragma: no cover
                raise ValueError(mode)
        return np.where(valid & (n > 0), out, np.nan)

    return stencil


def _windowed(mode: str):
    def op(
        raster: DataFrame,
        cfg: GridConfig,
        rx: int = 1,
        ry: int = 1,
        tile_size: int = 128,
    ) -> DataFrame:
        return focal_apply(
            raster, cfg, _window_position_stencil(rx, ry, mode), max(rx, ry), tile_size
        )

    return op


dev_from_mean_elev = _windowed("dev")
diff_from_mean_elev = _windowed("diff")
elev_percentile = _windowed("pctl")
percent_elev_range = _windowed("range")
relative_topographic_position = _windowed("rtp")


# ----------------------------------------------- global / two-raster ops


def elev_relative_to_min_max(raster: DataFrame) -> DataFrame:
    """ElevRelativeToMinMax (elev_relative_to_min_max.rs:207-210):
    (z - global_min)/(global_max - global_min) * 100. One agg + a
    broadcast scalar join — no shuffle of the cell table."""
    stats = raster.agg(
        F.min("value").alias("_mn"), F.max("value").alias("_mx")
    )
    return raster.crossJoin(F.broadcast(stats)).select(
        "row",
        "col",
        ((F.col("value") - F.col("_mn")) / (F.col("_mx") - F.col("_mn")) * 100.0).alias(
            "value"
        ),
    )


def standard_deviation_of_slope(
    raster: DataFrame,
    cfg: GridConfig,
    filter_x: int = 11,
    filter_y: int = 11,
    z_factor: float = 1.0,
    tile_size: int = 128,
) -> DataFrame:
    """StandardDeviationOfSlope (standard_deviation_of_slope.rs:278-437):
    Horn slope in degrees, then the clamped-integral population-stdev
    window (StandardDeviationFilter semantics) over the slope plane."""
    from whitebox_tools_spark.operators import focal as _focal
    from whitebox_tools_spark.operators.filters import stdev_filter

    sl = _focal.slope(raster, cfg, z_factor=z_factor, tile_size=tile_size)
    return stdev_filter(sl, cfg, filter_x, filter_y, tile_size=tile_size)


def _join_sca_slope(sca: DataFrame, slope: DataFrame) -> DataFrame:
    return sca.select("row", "col", F.col("value").alias("sca")).join(
        slope.select("row", "col", F.col("value").alias("slope")), ["row", "col"]
    )


def wetness_index(sca: DataFrame, slope: DataFrame) -> DataFrame:
    """WetnessIndex (wetness_index.rs:226): ln(SCA / tan(radians(slope)));
    NoData where slope == 0 or SCA <= 0 (ln/tan undefined)."""
    j = _join_sca_slope(sca, slope)
    return j.where((F.col("slope") != 0.0) & (F.col("sca") > 0.0)).select(
        "row",
        "col",
        F.log(F.col("sca") / F.tan(F.radians(F.col("slope")))).alias("value"),
    )


def stream_power_index(
    sca: DataFrame, slope: DataFrame, sca_exponent: float = 1.0
) -> DataFrame:
    """RelativeStreamPowerIndex (relative_stream_power_index.rs:262-263):
    SCA^exp * tan(radians(slope))."""
    j = _join_sca_slope(sca, slope)
    return j.select(
        "row",
        "col",
        (
            F.pow(F.col("sca"), F.lit(sca_exponent))
            * F.tan(F.radians(F.col("slope")))
        ).alias("value"),
    )


def sediment_transport_index(
    sca: DataFrame,
    slope: DataFrame,
    sca_exponent: float = 0.4,
    slope_exponent: float = 1.3,
) -> DataFrame:
    """SedimentTransportIndex (sediment_transport_index.rs:292-294):
    (exp+1) * (SCA/22.13)^exp * (sin(radians(slope))/0.0896)^slope_exp."""
    j = _join_sca_slope(sca, slope)
    return j.select(
        "row",
        "col",
        (
            F.lit(sca_exponent + 1.0)
            * F.pow(F.col("sca") / 22.13, F.lit(sca_exponent))
            * F.pow(F.sin(F.radians(F.col("slope"))) / 0.0896, F.lit(slope_exponent))
        ).alias("value"),
    )
