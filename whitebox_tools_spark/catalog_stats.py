"""Query catalog: statistical tests / model fits (SURVEY.md §2.7).

Single-row (or tiny) outputs of named statistics; oracles recompute the
same closed-form aggregates in DuckDB, rounded to 6 dp on both sides
(aggregate accumulation order differs only in the last ulp)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import (
    GRID,
    _COL_SQL,
    _IN_GRID_SQL,
    _PTS_CTE,
    _ROW_SQL,
)
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators import stats as st
from whitebox_tools_spark.sources.tables import documents

SAMPLE_MOD = 7


def _geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def _last(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _first(spark, sf_dir):
    return rop.points_to_raster(_geo(spark, sf_dir), GRID, assign="first")


def _cls(spark, sf_dir):
    return rop.points_to_raster(_geo(spark, sf_dir), GRID, assign="max", field="cls").select(
        "row", "col", F.col("value").cast("double").alias("value")
    )


def _r6(df: DataFrame, keep_ints=("n", "n1", "n2", "k", "num_classes", "num_pairs")) -> DataFrame:
    cols = []
    for c, t in df.dtypes:
        cols.append(F.round(c, 6).alias(c) if t == "double" else F.col(c))
    return df.select(*cols)


def q_paired_t(spark, sf_dir):
    return _r6(st.paired_t_test(_last(spark, sf_dir), _first(spark, sf_dir)))


def q_ks2(spark, sf_dir):
    geo = _geo(spark, sf_dir)
    s1 = geo.where(F.pmod("doc_id", F.lit(2)) == 0).select(F.col("z").alias("value"))
    s2 = geo.where(F.pmod("doc_id", F.lit(2)) == 1).select(F.col("z").alias("value"))
    return _r6(st.two_sample_ks_test(s1, s2))


def q_wilcoxon(spark, sf_dir):
    return _r6(st.wilcoxon_signed_rank_test(_last(spark, sf_dir), _first(spark, sf_dir)))


def q_anova(spark, sf_dir):
    return _r6(st.anova(_last(spark, sf_dir), _cls(spark, sf_dir)))


def q_regression(spark, sf_dir):
    return _r6(st.image_regression(_last(spark, sf_dir), _first(spark, sf_dir)))


def q_moran(spark, sf_dir):
    return _r6(st.morans_i(_last(spark, sf_dir), GRID, "rook"))


def q_crispness(spark, sf_dir):
    return _r6(st.crispness_index(_last(spark, sf_dir)))


def q_cov(spark, sf_dir):
    return _r6(st.covariance_matrix(_geo(spark, sf_dir), ["x", "y", "z"]))


def q_random_field(spark, sf_dir):
    return st.random_field(spark, GRID).select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_random_sample(spark, sf_dir):
    return st.random_sample(_last(spark, sf_dir), GRID, SAMPLE_MOD).select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


QUERIES = {
    "paired_t_test": q_paired_t,
    "two_sample_ks": q_ks2,
    "wilcoxon_signed_rank": q_wilcoxon,
    "anova": q_anova,
    "image_regression": q_regression,
    "morans_i": q_moran,
    "crispness_index": q_crispness,
    "covariance_matrix": q_cov,
    "random_field": q_random_field,
    "random_sample": q_random_sample,
}


# ------------------------------------------------------------- oracle SQL

_RL_CTE = f"""rl AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_max(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col)"""
_RF_CTE = f"""rf AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_min(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col)"""
_RC_CTE = f"""rc AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, CAST(max(cls) AS DOUBLE) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col)"""

_PAIR_CTE = f"""{_RL_CTE},
{_RF_CTE},
j AS (SELECT l.value AS va, f.value AS vb FROM rl l
      JOIN rf f ON f.cell_row = l.cell_row AND f.cell_col = l.cell_col)"""

ORACLE_SQL = {
    "paired_t_test": f"""WITH {_PTS_CTE},
{_PAIR_CTE},
a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(va - vb) AS s,
             sum((va - vb) * (va - vb)) AS ss FROM j)
SELECT n, round(s / n, 6) AS mean_diff,
       round(sqrt((ss - s * s / n) / (n - 1.0)), 6) AS sd_diff,
       round((s / n) / (sqrt((ss - s * s / n) / (n - 1.0)) / sqrt(CAST(n AS DOUBLE))), 6) AS t_stat
FROM a""",
    "two_sample_ks": f"""WITH {_PTS_CTE},
s1 AS (SELECT z AS v FROM pts WHERE doc_id % 2 = 0),
s2 AS (SELECT z AS v FROM pts WHERE doc_id % 2 = 1),
u AS (SELECT v, 1 AS c1, 0 AS c2 FROM s1 UNION ALL SELECT v, 0, 1 FROM s2),
pv AS (SELECT v, sum(c1) AS c1, sum(c2) AS c2 FROM u GROUP BY v),
cum AS (SELECT sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
               sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2
        FROM pv)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
       round(max(abs(f1 / (SELECT CAST(count(*) AS DOUBLE) FROM s1)
                     - f2 / (SELECT CAST(count(*) AS DOUBLE) FROM s2))), 6) AS d_stat
FROM cum""",
    "wilcoxon_signed_rank": f"""WITH {_PTS_CTE},
{_PAIR_CTE},
d AS (SELECT va - vb AS d, abs(va - vb) AS ad FROM j WHERE va - vb <> 0.0),
per AS (SELECT ad, count(*) AS cnt,
               sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS pos
        FROM d GROUP BY ad),
rk AS (SELECT ad, cnt, pos,
              CAST(coalesce(sum(cnt) OVER (ORDER BY ad
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                + (cnt + 1.0) / 2.0 AS avg_rank
       FROM per),
a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
             sum(avg_rank * pos) AS w_plus,
             sum(avg_rank * (cnt - pos)) AS w_minus
      FROM rk)
SELECT n, round(w_plus, 6) AS w_plus, round(w_minus, 6) AS w_minus,
       round((least(w_plus, w_minus) - n * (n + 1.0) / 4.0)
             / sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0), 6) AS z_stat
FROM a""",
    "anova": f"""WITH {_PTS_CTE},
{_RL_CTE},
{_RC_CTE},
j AS (SELECT l.value AS va, c.value AS vb FROM rl l
      JOIN rc c ON c.cell_row = l.cell_row AND c.cell_col = l.cell_col),
per AS (SELECT vb, count(*) AS ni, sum(va) AS si, sum(va * va) AS ssi
        FROM j GROUP BY vb),
a AS (SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(si) AS s, sum(ssi) AS ss,
             sum(si * si / CAST(ni AS DOUBLE)) AS ssg
      FROM per)
SELECT n, k AS num_classes,
       round(ssg - s * s / n, 6) AS ss_between,
       round(ss - ssg, 6) AS ss_within,
       round(((ssg - s * s / n) / (k - 1.0)) / ((ss - ssg) / (n - k)), 6) AS f_stat
FROM a""",
    "image_regression": f"""WITH {_PTS_CTE},
{_PAIR_CTE},
a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(va) AS sx, sum(vb) AS sy,
             sum(va * vb) AS sxy, sum(va * va) AS sxx, sum(vb * vb) AS syy
      FROM j)
SELECT n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
       round(pow((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 2), 6) AS r_sqr
FROM a""",
    "morans_i": f"""WITH {_PTS_CTE},
{_RL_CTE},
g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(value) / count(*) AS mean FROM rl),
offs AS (SELECT * FROM (VALUES (0, -1), (0, 1), (-1, 0), (1, 0)) o(dc, dr)),
p AS (SELECT c.value AS zi, nb.value AS zj
      FROM rl c CROSS JOIN offs o
      JOIN rl nb ON nb.cell_row = c.cell_row + o.dr AND nb.cell_col = c.cell_col + o.dc),
num AS (SELECT sum((zi - g.mean) * (zj - g.mean)) AS num, CAST(count(*) AS BIGINT) AS w
        FROM p CROSS JOIN g),
dev AS (SELECT sum((value - g.mean) * (value - g.mean)) AS dev FROM rl CROSS JOIN g)
SELECT g.n, num.w AS num_pairs,
       round(CAST(g.n AS DOUBLE) * num.num / (dev.dev * CAST(num.w AS DOUBLE)), 6) AS moran_i
FROM g CROSS JOIN num CROSS JOIN dev""",
    "crispness_index": f"""WITH {_PTS_CTE},
{_RL_CTE},
a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(value) AS s,
             sum(value * value) AS ss FROM rl)
SELECT n,
       round((ss - n * (s / n) * (s / n))
             / (s * (1.0 - s / n) * (1.0 - s / n) + (n - s) * (s / n) * (s / n)), 6) AS crispness
FROM a""",
    "covariance_matrix": f"""WITH {_PTS_CTE},
a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(x * z) AS sxz,
             sum(y * y) AS syy, sum(y * z) AS syz, sum(z * z) AS szz
      FROM pts)
SELECT 'x' AS fi, 'x' AS fj, round((sxx - sx * sx / n) / (n - 1.0), 6) AS cov FROM a
UNION ALL SELECT 'x', 'y', round((sxy - sx * sy / n) / (n - 1.0), 6) FROM a
UNION ALL SELECT 'x', 'z', round((sxz - sx * sz / n) / (n - 1.0), 6) FROM a
UNION ALL SELECT 'y', 'y', round((syy - sy * sy / n) / (n - 1.0), 6) FROM a
UNION ALL SELECT 'y', 'z', round((syz - sy * sz / n) / (n - 1.0), 6) FROM a
UNION ALL SELECT 'z', 'z', round((szz - sz * sz / n) / (n - 1.0), 6) FROM a""",
    "random_field": f"""WITH cells AS (
  SELECT CAST(a.i AS BIGINT) AS cell_row, CAST(b.i AS BIGINT) AS cell_col,
         CAST(a.i * {GRID.cols} + b.i AS BIGINT) AS cell
  FROM range(0, {GRID.rows}) a(i), range(0, {GRID.cols}) b(i)),
u AS (SELECT cell_row, cell_col,
             (CAST((cell * {st._RF_A1} + {st._RF_B1}) % {st._M32} AS DOUBLE) + 1.0) / {float(st._M32)!r} AS u1,
             (CAST((cell * {st._RF_A2} + {st._RF_B2}) % {st._M32} AS DOUBLE) + 1.0) / {float(st._M32)!r} AS u2
      FROM cells)
SELECT cell_row, cell_col,
       round(sqrt(-2.0 * ln(u1)) * cos(2.0 * {math.pi!r} * u2), 6) AS value
FROM u""",
    "random_sample": f"""WITH {_PTS_CTE},
{_RL_CTE}
SELECT cell_row, cell_col,
       CASE WHEN ((cell_row * {GRID.cols} + cell_col) * {st._RF_A1} + {st._RF_B1}) % {st._M32} % {SAMPLE_MOD} = 0
            THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS value
FROM rl""",
}
