"""Query catalog: per-tool oracle rows for the cell-wise local-math
family (SURVEY.md §2.5; reference math_stat_analysis/*.rs one file per
op). Each reference tool that instantiates ``operators.local_math``
(unary/binary runners) gets its own DuckDB-checked row here, so the
whole family is driver-gate verified per tool, not only via the shared
machinery rows in catalog_local.py.

Exactness strategy: IEEE-deterministic ops (+,-,*,/,%,sqrt,abs,floor,
ceil,comparisons,boolean algebra) hash bit-identical by construction.
Transcendentals (sin/exp/pow/...) may differ from DuckDB's libm by an
ULP, so those rows quantize with round(x, 6) on BOTH sides — the same
quantization-aware-oracle convention the io codec rows use — with
inputs scaled so outputs stay O(1..1e4) (a 1-ulp slip then cannot move
a 6-decimal rounding except within ~1e-9 of a boundary; verified green
on the fixed sf0.001/sf0.01/sf0.1 gate fixtures).

Input transforms keep every op on its mathematical domain (asin needs
[-1,1], acosh needs >=1, ln needs >0 ...) and are written as the SAME
arithmetic expression on the Spark and SQL sides, so the transform
itself is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import _PTS_CTE
from whitebox_tools_spark.catalog_local import _r, _raster_cte
from whitebox_tools_spark.operators import local_math as lm

# ------------------------------------------------------------ transforms
# name -> (spark Column fn, SQL template over {v}); arithmetic mirrored.

_T_RAW = (lambda c: c, "{v}")
_T_UNIT9 = (  # [0,100) -> [-0.9, 0.9]   (asin / acos / atanh domain)
    lambda c: c / F.lit(100.0) * F.lit(1.8) - F.lit(0.9),
    "({v} / 100.0 * 1.8 - 0.9)",
)
_T_UNIT = (  # [0,100) -> [-1, 1)        (tan, pole-free)
    lambda c: c / F.lit(100.0) * F.lit(2.0) - F.lit(1.0),
    "({v} / 100.0 * 2.0 - 1.0)",
)
_T_SMALL = (  # [0,100) -> [-2, 2)       (exp / sinh / cosh magnitude cap)
    lambda c: c / F.lit(25.0) - F.lit(2.0),
    "({v} / 25.0 - 2.0)",
)
_T_GE1 = (  # [0,100) -> [1, 2)          (acosh domain)
    lambda c: c / F.lit(100.0) + F.lit(1.0),
    "({v} / 100.0 + 1.0)",
)
_T_POS = (  # [0,100) -> [1, 101)        (ln / log domain)
    lambda c: c + F.lit(1.0),
    "({v} + 1.0)",
)
_T_BOOL = (  # threshold to {0,1}        (logical ops)
    lambda c: F.when(c > F.lit(50.0), F.lit(1.0)).otherwise(F.lit(0.0)),
    "(CASE WHEN {v} > 50.0 THEN 1.0 ELSE 0.0 END)",
)
_T_NULLY = (  # inject NoData above 50   (isnodata flags it as 1.0)
    lambda c: F.when(c > F.lit(50.0), F.lit(None).cast("double")).otherwise(c),
    "(CASE WHEN {v} > 50.0 THEN NULL ELSE {v} END)",
)

# ---------------------------------------------------------------- op table
# op key -> (transform, SQL body over {x} / {a},{b}, quantize?)

_UNARY: dict[str, tuple] = {
    "negate": (_T_RAW, "-({x})", False),
    "abs": (_T_SMALL, "abs({x})", False),
    "ceil": (_T_SMALL, "ceil({x})", False),
    "floor": (_T_SMALL, "floor({x})", False),
    "round": (_T_SMALL, "round({x})", False),
    "truncate": (_T_SMALL, "CAST(trunc({x}) AS DOUBLE)", False),
    "exp": (_T_SMALL, "exp({x})", True),
    "exp2": (_T_SMALL, "pow(2.0, {x})", True),
    "ln": (_T_POS, "ln({x})", True),
    "log2": (_T_POS, "log2({x})", True),
    "log10": (_T_POS, "log10({x})", True),
    "sqrt": (_T_RAW, "sqrt({x})", False),
    "square": (_T_RAW, "({x}) * ({x})", False),
    "sin": (_T_RAW, "sin({x})", True),
    "cos": (_T_RAW, "cos({x})", True),
    "tan": (_T_UNIT, "tan({x})", True),
    "arcsin": (_T_UNIT9, "asin({x})", True),
    "arccos": (_T_UNIT9, "acos({x})", True),
    "arctan": (_T_RAW, "atan({x})", True),
    "sinh": (_T_SMALL, "(exp({x}) - exp(-({x}))) / 2.0", True),
    "cosh": (_T_SMALL, "(exp({x}) + exp(-({x}))) / 2.0", True),
    "tanh": (_T_SMALL,
             "(exp({x}) - exp(-({x}))) / (exp({x}) + exp(-({x})))", True),
    "arsinh": (_T_SMALL, "ln({x} + sqrt(({x}) * ({x}) + 1.0))", True),
    "arcosh": (_T_GE1, "ln({x} + sqrt(({x}) * ({x}) - 1.0))", True),
    "artanh": (_T_UNIT9, "0.5 * ln((1.0 + {x}) / (1.0 - {x}))", True),
    "todegrees": (_T_RAW, "({x}) * 180.0 / pi()", True),
    "toradians": (_T_RAW, "({x}) / 180.0 * pi()", True),
    "reciprocal": (_T_POS, "1.0 / ({x})", False),
    "increment": (_T_RAW, "({x}) + 1.0", False),
    "decrement": (_T_RAW, "({x}) - 1.0", False),
    "not": (_T_BOOL, "CASE WHEN {x} = 0.0 THEN 1.0 ELSE 0.0 END", False),
    # isnodata: the reference writes 1.0 AT nodata cells (isnodata.rs:
    # 200-205) — the one unary op that reads the null instead of
    # propagating it
    "isnodata": (_T_NULLY,
                 "CASE WHEN {x} IS NULL THEN 1.0 ELSE 0.0 END", False),
}

_BINARY: dict[str, tuple] = {
    "add": (_T_RAW, _T_RAW, "({a}) + ({b})", False),
    "subtract": (_T_RAW, _T_RAW, "({a}) - ({b})", False),
    "multiply": (_T_RAW, _T_RAW, "({a}) * ({b})", False),
    "divide": (_T_RAW, _T_POS, "({a}) / ({b})", False),
    "modulo": (_T_RAW, _T_POS, "fmod({a}, {b})", False),
    "integerdivision": (_T_RAW, _T_POS, "floor(({a}) / ({b}))", False),
    "power": (_T_GE1, _T_SMALL, "pow({a}, {b})", True),
    "max": (_T_RAW, _T_RAW, "greatest({a}, {b})", False),
    "min": (_T_RAW, _T_RAW, "least({a}, {b})", False),
    "atan2": (_T_SMALL, _T_SMALL, "atan2({a}, {b})", True),
    "equalto": (_T_BOOL, _T_BOOL,
                "CASE WHEN ({a}) = ({b}) THEN 1.0 ELSE 0.0 END", False),
    "notequalto": (_T_BOOL, _T_BOOL,
                   "CASE WHEN ({a}) <> ({b}) THEN 1.0 ELSE 0.0 END", False),
    "greaterthan": (_T_RAW, _T_RAW,
                    "CASE WHEN ({a}) > ({b}) THEN 1.0 ELSE 0.0 END", False),
    "lessthan": (_T_RAW, _T_RAW,
                 "CASE WHEN ({a}) < ({b}) THEN 1.0 ELSE 0.0 END", False),
    "and": (_T_BOOL, _T_BOOL,
            "CASE WHEN ({a}) <> 0.0 AND ({b}) <> 0.0 THEN 1.0 ELSE 0.0 END",
            False),
    "or": (_T_BOOL, _T_BOOL,
           "CASE WHEN ({a}) <> 0.0 OR ({b}) <> 0.0 THEN 1.0 ELSE 0.0 END",
           False),
    "xor": (_T_BOOL, _T_BOOL,
            "CASE WHEN (({a}) <> 0.0) <> (({b}) <> 0.0) THEN 1.0 ELSE 0.0 END",
            False),
}


def _out(df: DataFrame, quantize: bool) -> DataFrame:
    v = F.round("value", 6).alias("value") if quantize else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v
    )


def _unary_query(op: str, pre, quantize: bool):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        r = _r(spark, sf_dir, "last")
        r = r.select("row", "col", pre(F.col("value")).alias("value"))
        return _out(lm.unary(r, op), quantize)

    return q


def _binary_query(op: str, pre_a, pre_b, quantize: bool):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        a = _r(spark, sf_dir, "last")
        a = a.select("row", "col", pre_a(F.col("value")).alias("value"))
        b = _r(spark, sf_dir, "first")
        b = b.select("row", "col", pre_b(F.col("value")).alias("value"))
        return _out(lm.binary(a, b, op), quantize)

    return q


QUERIES: dict = {}
ORACLE_SQL: dict = {}

for _op, ((_pre, _pre_sql), _body, _quant) in _UNARY.items():
    _name = f"lm_{_op}"
    QUERIES[_name] = _unary_query(_op, _pre, _quant)
    _x = _pre_sql.format(v="value")
    _expr = _body.format(x=_x)
    if _quant:
        _expr = f"round({_expr}, 6)"
    _expr = f"CAST({_expr} AS DOUBLE)"  # DuckDB CASE/1.0 literals are DECIMAL
    ORACLE_SQL[_name] = f"""
WITH {_PTS_CTE},
{_raster_cte("a", "arg_max(z, doc_id)")}
SELECT cell_row, cell_col, {_expr} AS value FROM ra
"""

for _op, ((_pa, _pa_sql), (_pb, _pb_sql), _body, _quant) in _BINARY.items():
    _name = f"lm_{_op}"
    QUERIES[_name] = _binary_query(_op, _pa, _pb, _quant)
    _a = _pa_sql.format(v="a.value")
    _b = _pb_sql.format(v="b.value")
    _expr = _body.format(a=_a, b=_b)
    if _quant:
        _expr = f"round({_expr}, 6)"
    _expr = f"CAST({_expr} AS DOUBLE)"
    ORACLE_SQL[_name] = f"""
WITH {_PTS_CTE},
{_raster_cte("a", "arg_max(z, doc_id)")},
{_raster_cte("b", "arg_min(z, doc_id)")}
SELECT a.cell_row, a.cell_col, {_expr} AS value
FROM ra a JOIN rb b USING (cell_row, cell_col)
"""
