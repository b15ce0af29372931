"""Local (cell-wise) raster math — SURVEY.md §2.5.

Every tool in the reference's math_stat_analysis local family is
``output[r,c] = f(a[r,c], b[r,c])`` with NoData propagation and
constant-operand folding (add.rs:193-224). Long-form rasters make the
whole family joins + column expressions:

- unary ops: one projection;
- binary raster-raster: inner join on (row, col) — absent/null cells are
  NoData and propagate exactly like the reference's sentinel checks;
- raster-constant: the constant folds into the expression (Catalyst
  ConstantFolding does the two-constants short-circuit the reference
  hand-codes);
- the multi-raster folds (overlay family) stack inputs and reduce.

Registry keys are the reference tool names (lowercased), so the coverage
map in registry.py can point straight here.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ op registries

UNARY: dict[str, Callable[[Column], Column]] = {
    "negate": lambda c: -c,
    "abs": F.abs,
    "ceil": lambda c: F.ceil(c).cast("double"),
    "floor": lambda c: F.floor(c).cast("double"),
    "round": lambda c: F.round(c, 0),
    "truncate": lambda c: c.cast("long").cast("double"),
    "exp": F.exp,
    "exp2": lambda c: F.pow(F.lit(2.0), c),
    "ln": F.log,
    "log2": F.log2,
    "log10": F.log10,
    "sqrt": F.sqrt,
    "square": lambda c: c * c,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "arcsin": F.asin,
    "arccos": F.acos,
    "arctan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    "arsinh": lambda c: F.log(c + F.sqrt(c * c + 1.0)),
    "arcosh": lambda c: F.log(c + F.sqrt(c * c - 1.0)),
    "artanh": lambda c: F.lit(0.5) * F.log((F.lit(1.0) + c) / (F.lit(1.0) - c)),
    "todegrees": F.degrees,
    "toradians": F.radians,
    "reciprocal": lambda c: F.lit(1.0) / c,
    "increment": lambda c: c + F.lit(1.0),
    "decrement": lambda c: c - F.lit(1.0),
    "not": lambda c: F.when(c == 0.0, 1.0).otherwise(0.0),
    "isnodata": lambda c: F.when(c.isNull(), 1.0).otherwise(0.0),
}

BINARY: dict[str, Callable[[Column, Column], Column]] = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "modulo": lambda a, b: a % b,
    "integerdivision": lambda a, b: F.floor(a / b).cast("double"),
    "power": lambda a, b: F.pow(a, b),
    "max": F.greatest,
    "min": F.least,
    "atan2": F.atan2,
    "equalto": lambda a, b: F.when(a == b, 1.0).otherwise(0.0),
    "notequalto": lambda a, b: F.when(a != b, 1.0).otherwise(0.0),
    "greaterthan": lambda a, b: F.when(a > b, 1.0).otherwise(0.0),
    "lessthan": lambda a, b: F.when(a < b, 1.0).otherwise(0.0),
    "and": lambda a, b: F.when((a != 0.0) & (b != 0.0), 1.0).otherwise(0.0),
    "or": lambda a, b: F.when((a != 0.0) | (b != 0.0), 1.0).otherwise(0.0),
    "xor": lambda a, b: F.when((a != 0.0) != (b != 0.0), 1.0).otherwise(0.0),
}


def unary(raster: DataFrame, op: str) -> DataFrame:
    """One-input cell-wise op; null (NoData) rows propagate untouched —
    except ``isnodata``, the one op whose JOB is to look at the null:
    the reference writes 1.0 AT nodata cells and 0.0 elsewhere
    (isnodata.rs:200-205), so it bypasses the propagation wrapper."""
    f = UNARY[op]
    if op == "isnodata":
        return raster.select("row", "col", f(F.col("value")).alias("value"))
    return raster.select(
        "row", "col", F.when(F.col("value").isNotNull(), f(F.col("value"))).alias("value")
    )


def binary(a: DataFrame, b: DataFrame | float, op: str) -> DataFrame:
    """Two-input cell-wise op. ``b`` may be a constant (operand folding,
    add.rs:193-223). Raster-raster joins inner on (row, col): a cell
    missing on either side is NoData -> NoData out, like the sentinel."""
    f = BINARY[op]
    if isinstance(b, (int, float)):
        return a.select("row", "col", f(F.col("value"), F.lit(float(b))).alias("value"))
    l = a.select("row", "col", F.col("value").alias("_a"))
    r = b.select("row", "col", F.col("value").alias("_b"))
    return (
        l.join(r, ["row", "col"], "inner")
        .select("row", "col", f(F.col("_a"), F.col("_b")).alias("value"))
    )


# --------------------------------------------------------- overlay folds


def _stack(rasters: list[DataFrame]) -> DataFrame:
    """Full-outer align of N same-grid rasters into value columns _v0.._vn."""
    renamed = [
        r.select("row", "col", F.col("value").alias(f"_v{i}")) for i, r in enumerate(rasters)
    ]
    return reduce(lambda x, y: x.join(y, ["row", "col"], "full_outer"), renamed)


def overlay(rasters: list[DataFrame], stat: str) -> DataFrame:
    """AverageOverlay / SumOverlay / MaxOverlay / MinOverlay /
    MaxAbsoluteOverlay / MinAbsoluteOverlay (gis_analysis/*_overlay.rs):
    cell-wise fold across the stack, NoData-skipping like the reference."""
    n = len(rasters)
    s = _stack(rasters)
    vals = F.array(*[F.col(f"_v{i}") for i in range(n)])
    present = F.filter(vals, lambda v: v.isNotNull())
    if stat == "sum":
        out = F.aggregate(present, F.lit(0.0), lambda acc, v: acc + v)
    elif stat == "average":
        out = F.aggregate(present, F.lit(0.0), lambda acc, v: acc + v) / F.size(
            present
        ).cast("double")
    elif stat == "max":
        out = F.array_max(present)
    elif stat == "min":
        out = F.array_min(present)
    elif stat == "max_abs":
        idx = F.aggregate(
            F.sequence(F.lit(0), F.size(present) - 1),
            F.lit(0),
            lambda best, i: F.when(
                F.abs(F.element_at(present, i + 1))
                > F.abs(F.element_at(present, best + 1)),
                i,
            ).otherwise(best),
        )
        out = F.element_at(present, idx + 1)
    elif stat == "min_abs":
        idx = F.aggregate(
            F.sequence(F.lit(0), F.size(present) - 1),
            F.lit(0),
            lambda best, i: F.when(
                F.abs(F.element_at(present, i + 1))
                < F.abs(F.element_at(present, best + 1)),
                i,
            ).otherwise(best),
        )
        out = F.element_at(present, idx + 1)
    else:
        raise ValueError(stat)
    return s.select(
        "row", "col", F.when(F.size(present) > 0, out).alias("value")
    )


def weighted_sum(rasters: list[DataFrame], weights: list[float]) -> DataFrame:
    """WeightedSum (weighted_sum.rs): sum(w_i * v_i); any NoData input ->
    NoData (the reference requires all inputs valid)."""
    n = len(rasters)
    s = _stack(rasters)
    expr = None
    for i, w in enumerate(weights):
        term = F.col(f"_v{i}") * F.lit(float(w))
        expr = term if expr is None else expr + term
    return s.select("row", "col", expr.alias("value"))


def highest_position(rasters: list[DataFrame]) -> DataFrame:
    """HighestPosition (highest_pos.rs): 1-based index of the max input."""
    n = len(rasters)
    s = _stack(rasters)
    best = F.lit(1)
    for i in range(1, n):
        prev = (
            F.col("_v0") if i == 1
            else F.greatest(*[F.col(f"_v{j}") for j in range(i)])
        )
        best = F.when(F.col(f"_v{i}") > prev, F.lit(i + 1)).otherwise(best)
    valid = None
    for i in range(n):
        c = F.col(f"_v{i}").isNotNull()
        valid = c if valid is None else (valid & c)
    return s.select("row", "col", F.when(valid, best.cast("double")).alias("value"))


def pick_from_list(rasters: list[DataFrame], pos: DataFrame) -> DataFrame:
    """PickFromList (pick_from_list.rs): per cell, take value from the
    raster whose 1-based index the position raster names."""
    n = len(rasters)
    s = _stack(rasters).join(
        pos.select("row", "col", F.col("value").alias("_pos")), ["row", "col"], "inner"
    )
    vals = F.array(*[F.col(f"_v{i}") for i in range(n)])
    return s.select(
        "row", "col", F.element_at(vals, F.round("_pos").cast("int")).alias("value")
    )


def reclass(raster: DataFrame, triplets: list[tuple[float, float, float]]) -> DataFrame:
    """Reclass with (new, from, to) range triplets (reclass.rs:21-32):
    from <= v < to -> new; unmatched passes through."""
    expr = None
    v = F.col("value")
    for new, lo, hi in triplets:
        c = (v >= F.lit(float(lo))) & (v < F.lit(float(hi)))
        expr = F.when(c, F.lit(float(new))) if expr is None else expr.when(c, F.lit(float(new)))
    out = expr.otherwise(v) if expr is not None else v
    return raster.select("row", "col", F.when(v.isNotNull(), out).alias("value"))


def convert_nodata_to_zero(raster: DataFrame) -> DataFrame:
    return raster.select("row", "col", F.coalesce("value", F.lit(0.0)).alias("value"))


def z_scores(raster: DataFrame) -> DataFrame:
    """ZScores (z_scores.rs): (v - mean) / stddev over the whole raster —
    one global agg broadcast back (two narrow passes)."""
    stats = raster.agg(
        F.avg("value").alias("_m"), F.stddev_samp("value").alias("_s")
    )
    return raster.crossJoin(F.broadcast(stats)).select(
        "row", "col", ((F.col("value") - F.col("_m")) / F.col("_s")).alias("value")
    )


def rescale_value_range(
    raster: DataFrame, out_min: float, out_max: float
) -> DataFrame:
    """RescaleValueRange: linear map of the data range onto [out_min, out_max]."""
    stats = raster.agg(F.min("value").alias("_lo"), F.max("value").alias("_hi"))
    return raster.crossJoin(F.broadcast(stats)).select(
        "row",
        "col",
        (
            F.lit(float(out_min))
            + (F.col("value") - F.col("_lo"))
            / (F.col("_hi") - F.col("_lo"))
            * F.lit(float(out_max) - float(out_min))
        ).alias("value"),
    )


# --------------------------------------------- stack positional / percent


def lowest_position(rasters: list[DataFrame]) -> DataFrame:
    """LowestPosition (lowest_pos.rs): 1-based index of the min input."""
    n = len(rasters)
    s = _stack(rasters)
    best = F.lit(1)
    for i in range(1, n):
        prev = (
            F.col("_v0") if i == 1
            else F.least(*[F.col(f"_v{j}") for j in range(i)])
        )
        best = F.when(F.col(f"_v{i}") < prev, F.lit(i + 1)).otherwise(best)
    valid = None
    for i in range(n):
        c = F.col(f"_v{i}").isNotNull()
        valid = c if valid is None else (valid & c)
    return s.select("row", "col", F.when(valid, best.cast("double")).alias("value"))


def count_if(rasters: list[DataFrame], value: float) -> DataFrame:
    """CountIf (count_if.rs): per cell, how many stack inputs equal
    ``value`` (NoData inputs don't count). A cell with ZERO matches is
    NoData (NULL), not 0 — the reference writes the output only on the
    first match (guarded increment over a nodata-initialized raster,
    count_if.rs:243-248), so no-match cells stay nodata."""
    n = len(rasters)
    s = _stack(rasters)
    cnt = None
    for i in range(n):
        hit = F.when(F.col(f"_v{i}") == F.lit(float(value)), 1.0).otherwise(0.0)
        cnt = hit if cnt is None else cnt + hit
    return s.select("row", "col", F.when(cnt > 0.0, cnt).alias("value"))


def percent_stack(
    rasters: list[DataFrame], comparison: DataFrame, mode: str
) -> DataFrame:
    """PercentEqualTo / PercentGreaterThan / PercentLessThan
    (percent_equal_to.rs & friends): per cell, 100 * (#inputs <cmp>
    comparison) / #valid inputs."""
    n = len(rasters)
    s = _stack(rasters).join(
        comparison.select("row", "col", F.col("value").alias("_cmp")),
        ["row", "col"],
        "inner",
    )
    hits, valid = None, None
    for i in range(n):
        v = F.col(f"_v{i}")
        if mode == "eq":
            h = v == F.col("_cmp")
        elif mode == "gt":
            h = v > F.col("_cmp")
        elif mode == "lt":
            h = v < F.col("_cmp")
        else:
            raise ValueError(mode)
        hit = F.when(v.isNotNull() & h, 1.0).otherwise(0.0)
        ok = F.when(v.isNotNull(), 1.0).otherwise(0.0)
        hits = hit if hits is None else hits + hit
        valid = ok if valid is None else valid + ok
    out = F.when(valid > 0.0, hits * F.lit(100.0) / valid)
    return s.select("row", "col", out.alias("value"))


def weighted_overlay(
    rasters: list[DataFrame], weights: list[float], costs: list[bool] | None = None
) -> DataFrame:
    """WeightedOverlay (weighted_overlay.rs): rescale each factor onto
    [0,1] over its own data range (cost factors inverted), then weighted
    sum. Composes rescale_value_range + weighted_sum."""
    costs = costs or [False] * len(rasters)
    scaled = []
    for r, cost in zip(rasters, costs):
        s = rescale_value_range(r, 0.0, 1.0)
        if cost:
            s = s.select("row", "col", (F.lit(1.0) - F.col("value")).alias("value"))
        scaled.append(s)
    return weighted_sum(scaled, weights)


# ------------------------------------------------- grid-generator family


def create_plane(spark, cfg, gx: float, gy: float, c: float) -> DataFrame:
    """CreatePlane (create_plane.rs): value = gx*x_center + gy*y_center + c
    over every cell of the grid — generated distributed (range + int
    arithmetic), no driver-side grid."""
    n = cfg.rows * cfg.cols
    cells = spark.range(0, n).select(
        (F.col("id") / cfg.cols).cast("long").alias("row"),
        (F.col("id") % cfg.cols).alias("col"),
    )
    from whitebox_tools_spark.operators.raster import center_cols

    x, y = center_cols(cfg)
    val = x * F.lit(float(gx)) + y * F.lit(float(gy)) + F.lit(float(c))
    return cells.select("row", "col", val.alias("value"))


def new_raster_from_base(base: DataFrame, value: float) -> DataFrame:
    """NewRasterFromBase (new_raster.rs): constant raster over the base's
    occupied cells (long form: the cell set IS the raster)."""
    return base.select("row", "col", F.lit(float(value)).alias("value"))


def set_nodata_value(raster: DataFrame, nodata: float) -> DataFrame:
    """SetNodataValue (set_nodata_value.rs): declare ``nodata`` as the
    NoData sentinel — in null-encoded long form, NULLIF."""
    v = F.col("value")
    return raster.select(
        "row", "col", F.when(v == F.lit(float(nodata)), None).otherwise(v).alias("value")
    )


def modify_nodata_value(raster: DataFrame, new_sentinel: float) -> DataFrame:
    """ModifyNoDataValue (modify_nodata_value.rs): rewrite NoData cells to
    a new sentinel value (null -> sentinel; valid cells untouched)."""
    return raster.select(
        "row", "col", F.coalesce(F.col("value"), F.lit(float(new_sentinel))).alias("value")
    )


def raster_cell_assignment(raster: DataFrame, cfg, which: str) -> DataFrame:
    """RasterCellAssignment (raster_cell_assignment.rs): value = row / col /
    x-center / y-center of each occupied cell."""
    from whitebox_tools_spark.operators.raster import center_cols

    x, y = center_cols(cfg)
    out = {
        "row": F.col("row").cast("double"),
        "column": F.col("col").cast("double"),
        "x": x,
        "y": y,
    }[which]
    return raster.select("row", "col", out.alias("value"))


def raster_area(class_raster: DataFrame, cell_area: float) -> DataFrame:
    """RasterArea (raster_area.rs): per-class area = cell count * cell
    area. One hash aggregation; map-side combinable."""
    return (
        class_raster.where(F.col("value").isNotNull())
        .groupBy(F.col("value").alias("class"))
        .agg((F.count(F.lit(1)) * F.lit(float(cell_area))).alias("area"))
    )


def reclass_equal_interval(
    raster: DataFrame, interval: float, base: float = 0.0
) -> DataFrame:
    """ReclassEqualInterval (reclass_equal_interval.rs): class value = the
    lower bound of the enclosing interval."""
    v = F.col("value")
    cls = F.floor((v - F.lit(float(base))) / F.lit(float(interval))).cast("double")
    out = cls * F.lit(float(interval)) + F.lit(float(base))
    return raster.select("row", "col", F.when(v.isNotNull(), out).alias("value"))


# -------------------------------------------- global CDF / quantile bins


def _cdf_frame(raster: DataFrame) -> DataFrame:
    """Distinct-value histogram + running CDF. The window runs over the
    DISTINCT-value frame (bounded by value cardinality, not cell count),
    so the global sort never sees the full raster — the scale-safe way to
    compute a global CDF: aggregate first, window the small frame, then
    broadcast-join back."""
    from pyspark.sql import Window

    hist = raster.where(F.col("value").isNotNull()).groupBy("value").agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        "value",
        (F.sum("_n").over(w)).alias("_cum"),
        F.sum("_n").over(
            Window.orderBy("value").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_tot"),
    )


def cumulative_distribution(raster: DataFrame) -> DataFrame:
    """CumulativeDistribution (cumulative_dist.rs): cell value -> P(V <= v)
    over the whole raster (tie-stable: all ties share one CDF value)."""
    cdf = _cdf_frame(raster).select(
        "value", (F.col("_cum").cast("double") / F.col("_tot").cast("double")).alias("_cd")
    )
    return raster.join(F.broadcast(cdf), "value", "left").select(
        "row", "col", F.col("_cd").alias("value")
    )


def quantiles(raster: DataFrame, num_quantiles: int) -> DataFrame:
    """Quantiles (quantiles.rs): bin = ceil(cdf * q), clamped to [1, q] —
    a tie-stable quantile binning (identical values always share a bin,
    unlike ntile's arbitrary tie split)."""
    q = int(num_quantiles)
    cdf = _cdf_frame(raster).select(
        "value",
        F.least(
            F.lit(float(q)),
            F.greatest(
                F.lit(1.0),
                F.ceil(
                    F.col("_cum").cast("double") / F.col("_tot").cast("double") * F.lit(float(q))
                ).cast("double"),
            ),
        ).alias("_bin"),
    )
    return raster.join(F.broadcast(cdf), "value", "left").select(
        "row", "col", F.col("_bin").alias("value")
    )


def pansharpen_brovey(
    bands: list[DataFrame], pan: DataFrame
) -> list[DataFrame]:
    """PanchromaticSharpening (panchromatic_sharpening.rs, Brovey mode):
    out_i = band_i * pan / mean(bands)."""
    n = len(bands)
    s = _stack(bands).join(
        pan.select("row", "col", F.col("value").alias("_pan")), ["row", "col"], "inner"
    )
    mean = None
    for i in range(n):
        mean = F.col(f"_v{i}") if mean is None else mean + F.col(f"_v{i}")
    mean = mean / F.lit(float(n))
    return [
        s.select("row", "col", (F.col(f"_v{i}") * F.col("_pan") / mean).alias("value"))
        for i in range(n)
    ]
