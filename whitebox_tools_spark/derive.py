"""Deterministic geometry derivation from document ids.

The engine's primary input is a table of interleaved text+media documents
(``doc_id``, ``spans``) with **no stored coordinates**; geospatial
attributes (x, y, z, cls) are derived deterministically from ``doc_id`` so
that (a) no external data is needed at any scale and (b) every engine query
has a bit-identical ANSI-SQL oracle (DuckDB) and numpy oracle.

The derivation is a 32-bit LCG-style mix in pure int64 arithmetic — the
same integer expression evaluates identically in Spark SQL, DuckDB SQL and
numpy, and the final float mapping (h / 2^32, exact in IEEE-754, then one
rounding for the range scale) is also bit-identical across all three.

Domain: x, y in [0, 1000); z in [0, 100); cls in 0..9 — mirroring the
reference's LiDAR point clouds (x/y extent, z elevation, classification,
src/lidar/point_data.rs:183-195).

doc_id is first reduced mod 2^31 so every multiply stays inside int64
(max 2^31 * 3.27e9 < 2^63) — safe to 10^12-document ids.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

D_MOD = 2_147_483_648  # 2^31
M32 = 4_294_967_296  # 2^32

# (multiplier, increment) per derived attribute — large odd constants
# (Knuth/Numerical-Recipes LCG multipliers and Fibonacci-hash primes).
_MIX = {
    "x": (2_654_435_761, 1_013_904_223),
    "y": (2_246_822_519, 3_266_489_917),
    "z": (3_266_489_917, 668_265_263),
    "c": (374_761_393, 2_654_435_761),
}

_RANGE = {"x": 1000.0, "y": 1000.0, "z": 100.0}


def _h_col(doc_id: Column, key: str) -> Column:
    a, b = _MIX[key]
    d = F.pmod(doc_id, F.lit(D_MOD))
    return F.pmod(d * F.lit(a) + F.lit(b), F.lit(M32))


def coord_col(doc_id: Column, key: str) -> Column:
    """Spark column for derived coordinate ``key`` in {'x','y','z'}."""
    return _h_col(doc_id, key).cast("double") / F.lit(float(M32)) * F.lit(_RANGE[key])


def cls_col(doc_id: Column) -> Column:
    """Spark column for the derived categorical class (0..9)."""
    return F.pmod(_h_col(doc_id, "c"), F.lit(10)).cast("int")


def with_geometry(df, doc_id_col: str = "doc_id"):
    """Attach derived x, y, z, cls columns (pure JVM-side expressions)."""
    c = F.col(doc_id_col)
    return (
        df.withColumn("x", coord_col(c, "x"))
        .withColumn("y", coord_col(c, "y"))
        .withColumn("z", coord_col(c, "z"))
        .withColumn("cls", cls_col(c))
    )


# ---------------------------------------------------------------- SQL oracle


def sql_h(expr: str, key: str) -> str:
    a, b = _MIX[key]
    return f"((({expr}) % {D_MOD}) * {a} + {b}) % {M32}"


def sql_coord(expr: str, key: str) -> str:
    """DuckDB/ANSI SQL fragment computing the same derived coordinate."""
    rng = _RANGE[key]
    return f"(CAST({sql_h(expr, key)} AS DOUBLE) / {float(M32)!r} * {rng!r})"


def sql_cls(expr: str) -> str:
    return f"CAST(({sql_h(expr, 'c')}) % 10 AS INT)"


def sql_geometry_select(doc_id_expr: str = "doc_id") -> str:
    """SELECT-list fragment deriving x, y, z, cls (append after doc_id)."""
    return (
        f"{sql_coord(doc_id_expr, 'x')} AS x, "
        f"{sql_coord(doc_id_expr, 'y')} AS y, "
        f"{sql_coord(doc_id_expr, 'z')} AS z, "
        f"{sql_cls(doc_id_expr)} AS cls"
    )


# --------------------------------------------------------------- numpy oracle


def np_h(doc_id: np.ndarray, key: str) -> np.ndarray:
    a, b = _MIX[key]
    d = np.asarray(doc_id, dtype=np.int64) % D_MOD
    return (d * a + b) % M32


def np_coord(doc_id: np.ndarray, key: str) -> np.ndarray:
    return np_h(doc_id, key).astype(np.float64) / float(M32) * _RANGE[key]


def np_cls(doc_id: np.ndarray) -> np.ndarray:
    return (np_h(doc_id, "c") % 10).astype(np.int32)
