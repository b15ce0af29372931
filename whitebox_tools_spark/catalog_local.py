"""Query catalog: local (cell-wise) raster math family (SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _IN_GRID_SQL, _COL_SQL, _PTS_CTE, _ROW_SQL
from whitebox_tools_spark.operators import local_math as lm
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.sources.tables import documents

RECLASS_TRIPLETS = [(1.0, 0.0, 25.0), (2.0, 25.0, 50.0), (3.0, 50.0, 75.0), (4.0, 75.0, 101.0)]


def _geo(spark, sf_dir):
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def _r(spark, sf_dir, assign):
    return rop.points_to_raster(_geo(spark, sf_dir), GRID, assign=assign)


def q_raster_calc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a*2 + b) cellwise, then sqrt — a chained local-math pipeline."""
    a = _r(spark, sf_dir, "last")
    b = _r(spark, sf_dir, "first")
    out = lm.unary(lm.binary(lm.binary(a, 2.0, "multiply"), b, "add"), "sqrt")
    return out.select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_reclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = lm.reclass(_r(spark, sf_dir, "last"), RECLASS_TRIPLETS)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


def q_z_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = lm.z_scores(_r(spark, sf_dir, "last"))
    return out.select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_overlay_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    rs = [_r(spark, sf_dir, a) for a in ("last", "min", "max")]
    out = lm.overlay(rs, "average")
    return out.select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES = {
    "raster_calc": q_raster_calc,
    "reclass": q_reclass,
    "z_scores": q_z_scores,
    "overlay_avg": q_overlay_avg,
}

_R_CTE = """r{n} AS (SELECT {row} AS cell_row, {col} AS cell_col, {agg} AS value
      FROM pts WHERE {ing} GROUP BY cell_row, cell_col)"""


def _raster_cte(n: str, agg: str) -> str:
    return _R_CTE.format(n=n, row=_ROW_SQL, col=_COL_SQL, agg=agg, ing=_IN_GRID_SQL)


_RECLASS_CASE = (
    "CASE "
    + " ".join(
        f"WHEN value >= {lo!r} AND value < {hi!r} THEN {new!r}"
        for new, lo, hi in RECLASS_TRIPLETS
    )
    + " ELSE value END"
)

ORACLE_SQL = {
    "raster_calc": f"""
WITH {_PTS_CTE},
{_raster_cte("a", "arg_max(z, doc_id)")},
{_raster_cte("b", "arg_min(z, doc_id)")}
SELECT a.cell_row, a.cell_col, round(sqrt(a.value * 2.0 + b.value), 6) AS value
FROM ra a JOIN rb b USING (cell_row, cell_col)
""",
    "reclass": f"""
WITH {_PTS_CTE},
{_raster_cte("a", "arg_max(z, doc_id)")}
SELECT cell_row, cell_col, {_RECLASS_CASE} AS value FROM ra
""",
    "z_scores": f"""
WITH {_PTS_CTE},
{_raster_cte("a", "arg_max(z, doc_id)")},
st AS (SELECT avg(value) AS m, stddev_samp(value) AS s FROM ra)
SELECT cell_row, cell_col, round((value - m) / s, 6) AS value
FROM ra CROSS JOIN st
""",
    "overlay_avg": f"""
WITH {_PTS_CTE},
{_raster_cte("a", "arg_max(z, doc_id)")},
{_raster_cte("b", "min(z)")},
{_raster_cte("c", "max(z)")}
SELECT cell_row, cell_col,
       round((a.value + b.value + c.value) / 3.0, 6) AS value
FROM ra a JOIN rb b USING (cell_row, cell_col) JOIN rc c USING (cell_row, cell_col)
""",
}
