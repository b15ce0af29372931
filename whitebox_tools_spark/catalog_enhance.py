"""Query catalog: image enhancement, window variants, comparison stats,
resample (SURVEY.md §2.6 / §2.7)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _IN_GRID_SQL, _COL_SQL, _PTS_CTE, _ROW_SQL
from whitebox_tools_spark.catalog_grid import _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.operators import enhance
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.sources.tables import documents

TILE_SIZE = 8
MM_MIN, MM_MAX, TONES = 0.0, 100.0, 256
GAMMA = 0.5
SIG_CUTOFF, SIG_GAIN = 0.0, 1.0
DST = GridConfig(rows=40, cols=40, north=1000.0, west=0.0, res_x=25.0, res_y=25.0)


def _geo(spark, sf_dir):
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def _z(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _cls(spark, sf_dir, assign):
    return rop.points_to_raster(_geo(spark, sf_dir), GRID, assign=assign, field="cls").select(
        "row", "col", F.col("value").cast("double").alias("value")
    )


def _al(df, round6=True):
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


def q_minmax_stretch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _al(enhance.min_max_contrast_stretch(_z(spark, sf_dir), MM_MIN, MM_MAX, TONES), False)


def q_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _al(enhance.gamma_correction(_z(spark, sf_dir), GAMMA))


def q_sigmoidal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _al(
        enhance.sigmoidal_contrast_stretch(_z(spark, sf_dir), SIG_CUTOFF, SIG_GAIN, TONES),
        False,
    )


def q_olympic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _al(enhance.olympic_filter(_z(spark, sf_dir), GRID, 3, 3, tile_size=TILE_SIZE))


def q_image_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = enhance.image_correlation(_cls(spark, sf_dir, "max"), _cls(spark, sf_dir, "min"))
    return out.select(F.round("r", 6).alias("r"), "n")


def q_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = enhance.rmse(_cls(spark, sf_dir, "max"), _cls(spark, sf_dir, "min"))
    return out.select(
        F.round("rmse", 6).alias("rmse"), F.round("mean_error", 6).alias("mean_error"), "n"
    )


def q_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = enhance.kappa_index(_cls(spark, sf_dir, "max"), _cls(spark, sf_dir, "min"))
    return out.select(
        F.round("kappa", 6).alias("kappa"),
        F.round("overall_accuracy", 6).alias("overall_accuracy"),
        "n",
    )


def q_resample_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = enhance.resample_nn(_z(spark, sf_dir), GRID, DST)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


def q_resample_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = enhance.resample_idw(_z(spark, sf_dir), GRID, DST, "bilinear")
    return _al(out)


def q_resample_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = enhance.resample_idw(_z(spark, sf_dir), GRID, DST, "cc")
    return _al(out)


QUERIES = {
    "minmax_stretch": q_minmax_stretch,
    "gamma_correction": q_gamma,
    "sigmoidal_stretch": q_sigmoidal,
    "olympic_filter": q_olympic,
    "image_corr": q_image_corr,
    "rmse": q_rmse,
    "kappa": q_kappa,
    "resample_nn": q_resample_nn,
    "resample_bilinear": q_resample_bilinear,
    "resample_cc": q_resample_cc,
}

_CLS_R = """r{n} AS (SELECT {row} AS cell_row, {col} AS cell_col,
      CAST({agg}(cls) AS DOUBLE) AS value
      FROM pts WHERE {ing} GROUP BY cell_row, cell_col)"""


def _cls_cte(n, agg):
    return _CLS_R.format(n=n, row=_ROW_SQL, col=_COL_SQL, agg=agg, ing=_IN_GRID_SQL)


_SIG_A = 1.0 / (1.0 + math.exp(SIG_GAIN * SIG_CUTOFF))
_SIG_B = 1.0 / (1.0 + math.exp(SIG_GAIN * (SIG_CUTOFF - 1.0))) - _SIG_A

ORACLE_SQL = {
    "minmax_stretch": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE}
SELECT cell_row, cell_col,
       greatest(0.0, least(floor((value - {MM_MIN!r}) / {MM_MAX - MM_MIN!r} * {float(TONES)!r}),
                           {float(TONES - 1)!r})) AS value
FROM r
""",
    "gamma_correction": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE}
SELECT cell_row, cell_col, round(pow(value, {GAMMA!r}), 6) AS value FROM r
""",
    "sigmoidal_stretch": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
mm AS (SELECT min(value) AS mn, max(value) AS mx FROM r)
SELECT cell_row, cell_col,
       floor(greatest(0.0, least(
         (1.0 / (1.0 + exp({SIG_GAIN!r} * ({SIG_CUTOFF!r} - (value - mn) / (mx - mn))))
           - {_SIG_A!r}) / {_SIG_B!r}, 1.0)) * {float(TONES)!r}) AS value
FROM r CROSS JOIN mm
""",
    "olympic_filter": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT a.i - 1 AS dr, b.i - 1 AS dc FROM range(0, 3) a(i), range(0, 3) b(i)),
j AS (SELECT c.cell_row, c.cell_col,
             sum(n.value) AS s, min(n.value) AS mn, max(n.value) AS mx, count(*) AS cnt
      FROM r c CROSS JOIN offs o
      JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col
      HAVING count(*) > 2)
SELECT cell_row, cell_col, round((s - mn - mx) / (cnt - 2), 6) AS value FROM j
""",
    "image_corr": f"""
WITH {_PTS_CTE},
{_cls_cte("a", "max")},
{_cls_cte("b", "min")}
SELECT round(corr(ra.value, rb.value), 6) AS r, count(*) AS n
FROM ra JOIN rb USING (cell_row, cell_col)
""",
    "rmse": f"""
WITH {_PTS_CTE},
{_cls_cte("a", "max")},
{_cls_cte("b", "min")}
SELECT round(sqrt(avg((ra.value - rb.value) * (ra.value - rb.value))), 6) AS rmse,
       round(avg(ra.value - rb.value), 6) AS mean_error, count(*) AS n
FROM ra JOIN rb USING (cell_row, cell_col)
""",
    "kappa": f"""
WITH {_PTS_CTE},
{_cls_cte("a", "max")},
{_cls_cte("b", "min")},
j AS (SELECT CAST(round(ra.value) AS BIGINT) AS ca, CAST(round(rb.value) AS BIGINT) AS cb
      FROM ra JOIN rb USING (cell_row, cell_col)),
tot AS (SELECT count(*) AS n FROM j),
agree AS (SELECT count(*) AS a FROM j WHERE ca = cb),
tab AS (SELECT ca, cb, count(*) AS cnt FROM j GROUP BY ca, cb),
rm AS (SELECT ca, sum(cnt) AS ra_n FROM tab GROUP BY ca),
cm AS (SELECT cb, sum(cnt) AS cb_n FROM tab GROUP BY cb),
e AS (SELECT sum(rm.ra_n * cm.cb_n) AS exp_s FROM rm JOIN cm ON rm.ca = cm.cb)
SELECT round(((CAST(a AS DOUBLE) / n) - (CAST(exp_s AS DOUBLE) / (CAST(n AS DOUBLE) * n)))
             / (1.0 - (CAST(exp_s AS DOUBLE) / (CAST(n AS DOUBLE) * n))), 6) AS kappa,
       round(CAST(a AS DOUBLE) / n, 6) AS overall_accuracy, n
FROM tot, agree, e
""",
    "resample_nn": f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
dst AS (SELECT CAST(i // {DST.cols} AS BIGINT) AS cell_row,
               CAST(i % {DST.cols} AS BIGINT) AS cell_col,
               ({DST.west!r} + (CAST(i % {DST.cols} AS DOUBLE) + 0.5) * {DST.res_x!r}) AS x,
               ({DST.north!r} - (CAST(i // {DST.cols} AS DOUBLE) + 0.5) * {DST.res_y!r}) AS y
        FROM range(0, {DST.rows * DST.cols}) t(i)),
m AS (SELECT d.cell_row, d.cell_col,
             CAST(floor(({GRID.north!r} - d.y) / {GRID.res_y!r}) AS BIGINT) AS sr,
             CAST(floor((d.x - {GRID.west!r}) / {GRID.res_x!r}) AS BIGINT) AS sc
      FROM dst d)
SELECT m.cell_row, m.cell_col, r.value
FROM m LEFT JOIN r ON r.cell_row = m.sr AND r.cell_col = m.sc
""",
}


def _resample_idw_sql(lo: int, hi: int) -> str:
    """Oracle for resample_idw: offsets [lo, hi) per axis (bilinear 0..2,
    cc -1..3), w = 1/(dx^2+dy^2), exact center hit wins."""
    return f"""
WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
dst AS (SELECT CAST(i // {DST.cols} AS BIGINT) AS cell_row,
               CAST(i % {DST.cols} AS BIGINT) AS cell_col,
               ({DST.west!r} + (CAST(i % {DST.cols} AS DOUBLE) + 0.5) * {DST.res_x!r}) AS x,
               ({DST.north!r} - (CAST(i // {DST.cols} AS DOUBLE) + 0.5) * {DST.res_y!r}) AS y
        FROM range(0, {DST.rows * DST.cols}) t(i)),
m AS (SELECT cell_row, cell_col,
             ({GRID.north!r} - y) / {GRID.res_y!r} AS rs,
             (x - {GRID.west!r}) / {GRID.res_x!r} AS cs,
             CAST(floor(({GRID.north!r} - y) / {GRID.res_y!r}) AS BIGINT) AS orow,
             CAST(floor((x - {GRID.west!r}) / {GRID.res_x!r}) AS BIGINT) AS ocol
      FROM dst),
offs AS (SELECT a.i AS dy, b.i AS dx FROM range({lo}, {hi}) a(i), range({lo}, {hi}) b(i)),
j AS (SELECT m.cell_row, m.cell_col,
             (CAST(m.orow + o.dy AS DOUBLE) - m.rs) AS dyv,
             (CAST(m.ocol + o.dx AS DOUBLE) - m.cs) AS dxv,
             r.value AS v
      FROM m CROSS JOIN offs o
      JOIN r ON r.cell_row = m.orow + o.dy AND r.cell_col = m.ocol + o.dx),
a AS (SELECT cell_row, cell_col,
             max(CASE WHEN dxv * dxv + dyv * dyv = 0.0 THEN v END) AS ex,
             sum(CASE WHEN dxv * dxv + dyv * dyv > 0.0
                      THEN v / (dxv * dxv + dyv * dyv) END) AS swv,
             sum(CASE WHEN dxv * dxv + dyv * dyv > 0.0
                      THEN 1.0 / (dxv * dxv + dyv * dyv) END) AS sw
      FROM j GROUP BY cell_row, cell_col)
SELECT d.cell_row, d.cell_col, round(coalesce(a.ex, a.swv / a.sw), 6) AS value
FROM dst d LEFT JOIN a USING (cell_row, cell_col)
"""


ORACLE_SQL["resample_bilinear"] = _resample_idw_sql(0, 2)
ORACLE_SQL["resample_cc"] = _resample_idw_sql(-1, 3)
