"""Individual numpy-parity sweep over EVERY cell-wise op instantiation.

The registry's `expr`-status tools (AbsoluteValue, Add, Sin, ...) are
one-line instantiations of local_math.UNARY / BINARY / overlay; this
sweep pins each named op against an independent numpy formulation so no
instantiation is merely machinery-verified.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from whitebox_tools_spark.localrel import local_df
from whitebox_tools_spark.operators import local_math as lm

# value grid safe for every op domain except the special cases below
VALS = [0.13, 0.57, 0.86]

NP_UNARY = {
    "negate": lambda c: -c,
    "abs": np.abs,
    "ceil": np.ceil,
    "floor": np.floor,
    # Spark round() is HALF_UP on doubles; numpy rounds half-to-even.
    "round": lambda c: np.floor(c + 0.5),
    "truncate": np.trunc,
    "exp": np.exp,
    "exp2": lambda c: np.power(2.0, c),
    "ln": np.log,
    "log2": np.log2,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "square": lambda c: c * c,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "arcsin": np.arcsin,
    "arccos": np.arccos,
    "arctan": np.arctan,
    "sinh": np.sinh,
    "cosh": np.cosh,
    "tanh": np.tanh,
    "arsinh": lambda c: np.log(c + np.sqrt(c * c + 1.0)),
    "arcosh": lambda c: np.log(c + np.sqrt(c * c - 1.0)),
    "artanh": lambda c: 0.5 * np.log((1.0 + c) / (1.0 - c)),
    "todegrees": np.degrees,
    "toradians": np.radians,
    "reciprocal": lambda c: 1.0 / c,
    "increment": lambda c: c + 1.0,
    "decrement": lambda c: c - 1.0,
    "not": lambda c: np.where(c == 0.0, 1.0, 0.0),
    "isnodata": lambda c: np.zeros_like(c),  # inputs non-null here
}

# ops whose domain needs shifted inputs
SHIFT = {"arcosh": 1.0}

NP_BINARY = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "modulo": lambda a, b: np.fmod(a, b),
    "integerdivision": lambda a, b: np.floor(a / b),
    "power": np.power,
    "max": np.maximum,
    "min": np.minimum,
    "atan2": np.arctan2,
    "equalto": lambda a, b: (a == b).astype(float),
    "notequalto": lambda a, b: (a != b).astype(float),
    "greaterthan": lambda a, b: (a > b).astype(float),
    "lessthan": lambda a, b: (a < b).astype(float),
    "and": lambda a, b: ((a != 0.0) & (b != 0.0)).astype(float),
    "or": lambda a, b: ((a != 0.0) | (b != 0.0)).astype(float),
    "xor": lambda a, b: ((a != 0.0) != (b != 0.0)).astype(float),
}

NP_OVERLAY = {
    "sum": lambda m: m.sum(axis=0),
    "average": lambda m: m.mean(axis=0),
    "max": lambda m: m.max(axis=0),
    "min": lambda m: m.min(axis=0),
    "max_abs": lambda m: np.take_along_axis(
        m, np.abs(m).argmax(axis=0)[None, :], axis=0
    )[0],
    "min_abs": lambda m: np.take_along_axis(
        m, np.abs(m).argmin(axis=0)[None, :], axis=0
    )[0],
}


def _close(a, b):
    if b is not None and math.isnan(b):
        # out-of-domain: numpy yields NaN; Spark's log-family yields NULL
        # (NoData) — both are the NoData convention
        return a is None or math.isnan(a)
    if a is None or b is None:
        return a is b
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)


def _raster(spark, vals):
    rows = [
        dict(row=i, col=j, value=float(v) * (j + 1))
        for i, v in enumerate(vals)
        for j in range(2)
    ]
    return local_df(spark, rows), np.array(
        [[r["value"]] for r in rows]
    ).ravel(), rows


def test_unary_sweep_matches_numpy(spark):
    assert set(NP_UNARY) == set(lm.UNARY)
    for op, npf in NP_UNARY.items():
        shift = SHIFT.get(op, 0.0)
        df, base, rows = _raster(spark, [v + shift for v in VALS])
        got = {
            (r.row, r.col): r.value
            for r in lm.unary(df, op).collect()
        }
        for r in rows:
            expect = float(npf(np.float64(r["value"])))
            assert _close(got[(r["row"], r["col"])], expect), (op, r)


def test_binary_sweep_matches_numpy(spark):
    assert set(NP_BINARY) == set(lm.BINARY)
    da, va, rows_a = _raster(spark, VALS)
    db, vb, _ = _raster(spark, [0.91, 0.27, 0.66])
    for op, npf in NP_BINARY.items():
        got = {(r.row, r.col): r.value for r in lm.binary(da, db, op).collect()}
        gotc = {(r.row, r.col): r.value for r in lm.binary(da, 0.4, op).collect()}
        for i, r in enumerate(rows_a):
            expect = float(npf(np.float64(va[i]), np.float64(vb[i])))
            assert _close(got[(r["row"], r["col"])], expect), (op, "rr", i)
            expect_c = float(npf(np.float64(va[i]), np.float64(0.4)))
            assert _close(gotc[(r["row"], r["col"])], expect_c), (op, "rc", i)


def test_overlay_sweep_matches_numpy(spark):
    frames, mats = [], []
    for k, vals in enumerate(([0.3, -0.7, 0.5], [0.9, 0.2, -0.8], [-0.1, 0.6, 0.4])):
        df, flat, _ = _raster(spark, vals)
        frames.append(df)
        mats.append(flat)
    m = np.vstack(mats)
    for stat, npf in NP_OVERLAY.items():
        got = sorted(
            (r.row, r.col, r.value) for r in lm.overlay(frames, stat).collect()
        )
        expect = npf(m)
        for idx, (row, col, v) in enumerate(got):
            assert math.isclose(v, float(expect[idx]), rel_tol=1e-12), (stat, idx)
