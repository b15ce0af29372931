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
    """One-input cell-wise op; null (NoData) rows propagate untouched."""
    f = UNARY[op]
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
        better = F.col(f"_v{i}") > F.greatest(*[F.col(f"_v{j}") for j in range(i)])
        best = F.when(better, F.lit(i + 1)).otherwise(best)
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
