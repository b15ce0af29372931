"""Query catalog: colour composite / enhancement family + morphology +
buffer. Band fixtures: r = 'last' z, g = 'first' z, b = per-cell min z."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import (
    GRID, _COL_SQL, _IN_GRID_SQL, _PTS_CTE, _ROW_SQL,
)
from whitebox_tools_spark.operators import color as co
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.sources.tables import documents

TILE_SIZE = 8
DDS_K = 0.5
BCE_MEAN = 100.0
HE_TONES = 256
BUF_SIZE = 120.0
PI = math.pi


def _bands(spark: SparkSession, sf_dir: str):
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    r = rop.points_to_raster(geo, GRID, assign="last")
    g = rop.points_to_raster(geo, GRID, assign="first")
    b = rop.points_to_raster(geo, GRID, assign="min")
    return r, g, b


def _z(spark, sf_dir):
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    return rop.points_to_raster(geo, GRID, assign="last")


def _rc(df: DataFrame, *cols, round6=()) -> DataFrame:
    sel = [F.col("row").alias("cell_row"), F.col("col").alias("cell_col")]
    for c in cols:
        sel.append(F.round(c, 6).alias(c) if c in round6 else F.col(c))
    return df.select(*sel)


QUERIES = {
    "rgb_to_ihs": lambda s, d: _rc(
        co.rgb_to_ihs(*_bands(s, d)), "i", "h", "s", round6=("i", "h", "s")),
    "ihs_to_rgb": lambda s, d: _rc(
        co.ihs_to_rgb(co.rgb_to_ihs(*_bands(s, d))), "r", "g", "b"),
    "colour_composite": lambda s, d: _rc(
        co.create_colour_composite(*_bands(s, d)), "value"),
    "split_colour_composite": lambda s, d: co.split_colour_composite(
        co.create_colour_composite(*_bands(s, d))).select(
            F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
            "band", "value"),
    "change_vector_analysis": lambda s, d: _cva(s, d),
    "decorrelation_stretch": lambda s, d: _rc(
        co.direct_decorrelation_stretch(*_bands(s, d), k=DDS_K),
        "r", "g", "b", round6=("r", "g", "b")),
    "balance_contrast": lambda s, d: _rc(
        co.balance_contrast_enhancement(
            co.create_colour_composite(*_bands(s, d)), BCE_MEAN), "value"),
    "correct_vignetting": lambda s, d: _rc(
        co.correct_vignetting(_z(s, d), GRID), "value", round6=("value",)),
    "histogram_equalization": lambda s, d: _rc(
        co.histogram_equalization(_z(s, d), HE_TONES), "value"),
    "opening": lambda s, d: _rc(co.opening(_z(s, d), GRID, 3, 3, TILE_SIZE), "value"),
    "closing": lambda s, d: _rc(co.closing(_z(s, d), GRID, 3, 3, TILE_SIZE), "value"),
    "tophat_transform": lambda s, d: _rc(
        co.tophat_transform(_z(s, d), GRID, 3, 3, "white", TILE_SIZE), "value"),
    "buffer_raster": lambda s, d: _rc(
        co.buffer_raster(_z(s, d), GRID, BUF_SIZE), "value"),
}


def _cva(s, d):
    geo = derive.with_geometry(documents(s, d), "doc_id")
    a1 = rop.points_to_raster(geo, GRID, assign="last")
    a2 = rop.points_to_raster(geo, GRID, assign="first")
    b1 = rop.points_to_raster(geo, GRID, assign="max")
    b2 = rop.points_to_raster(geo, GRID, assign="min")
    out = co.change_vector_analysis([a1, a2], [b1, b2])
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("magnitude", 6).alias("magnitude"), "direction",
    )


# ------------------------------------------------------------- oracle SQL

_BANDS_CTE = f"""rr AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col,
       arg_max(z, doc_id) AS r, arg_min(z, doc_id) AS g, min(z) AS b,
       max(z) AS mxz
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
st AS (SELECT min(r) AS r_mn, max(r) AS r_mx, min(g) AS g_mn, max(g) AS g_mx,
              min(b) AS b_mn, max(b) AS b_mx FROM rr),
nb AS (SELECT rr.cell_row, rr.cell_col,
              (rr.r - st.r_mn) / (st.r_mx - st.r_mn) AS r,
              (rr.g - st.g_mn) / (st.g_mx - st.g_mn) AS g,
              (rr.b - st.b_mn) / (st.b_mx - st.b_mn) AS b
       FROM rr CROSS JOIN st)"""

_IHS_CTE = f"""ihs AS (SELECT cell_row, cell_col,
       (r + g + b) / 3.0 AS i,
       CASE WHEN b > g THEN 2.0 * {PI!r} -
            (CASE WHEN r / (r + g + b) <> g / (r + g + b) OR r / (r + g + b) <> b / (r + g + b)
                  THEN acos((0.5 * ((r / (r+g+b) - g / (r+g+b)) + (r / (r+g+b) - b / (r+g+b))))
                       / sqrt((r / (r+g+b) - g / (r+g+b)) * (r / (r+g+b) - g / (r+g+b))
                              + (r / (r+g+b) - b / (r+g+b)) * (g / (r+g+b) - b / (r+g+b))))
                  ELSE 0.0 END)
            ELSE (CASE WHEN r / (r + g + b) <> g / (r + g + b) OR r / (r + g + b) <> b / (r + g + b)
                  THEN acos((0.5 * ((r / (r+g+b) - g / (r+g+b)) + (r / (r+g+b) - b / (r+g+b))))
                       / sqrt((r / (r+g+b) - g / (r+g+b)) * (r / (r+g+b) - g / (r+g+b))
                              + (r / (r+g+b) - b / (r+g+b)) * (g / (r+g+b) - b / (r+g+b))))
                  ELSE 0.0 END) END AS h,
       1.0 - 3.0 * least(r / (r + g + b), g / (r + g + b), b / (r + g + b)) AS s
FROM nb)"""

_BYTE = lambda c: f"least(greatest(floor({c} * 255.0 + 0.5), 0.0), 255.0)"

_COMP_CTE = f"""comp AS (SELECT cell_row, cell_col,
       255.0 * 16777216.0 + {_BYTE('b')} * 65536.0 + {_BYTE('g')} * 256.0 + {_BYTE('r')} AS value
FROM nb)"""

ORACLE_SQL = {
    "rgb_to_ihs": f"""WITH {_PTS_CTE},
{_BANDS_CTE},
{_IHS_CTE}
SELECT cell_row, cell_col, round(i, 6) AS i, round(h, 6) AS h, round(s, 6) AS s
FROM ihs""",
    "ihs_to_rgb": f"""WITH {_PTS_CTE},
{_BANDS_CTE},
{_IHS_CTE},
inv AS (SELECT cell_row, cell_col, i, h, s, i * (1.0 - s) AS x FROM ihs),
sec AS (SELECT *,
  CASE WHEN h < 2.0 * {PI!r} / 3.0 THEN i * (1.0 + (s * cos(h)) / cos({PI!r} / 3.0 - h))
       WHEN h < 4.0 * {PI!r} / 3.0 THEN i * (1.0 + (s * cos(h - 2.0 * {PI!r} / 3.0)) / cos({PI!r} / 3.0 - (h - 2.0 * {PI!r} / 3.0)))
       ELSE i * (1.0 + (s * cos(h - 4.0 * {PI!r} / 3.0)) / cos({PI!r} / 3.0 - (h - 4.0 * {PI!r} / 3.0))) END AS y
  FROM inv),
rgb AS (SELECT cell_row, cell_col,
  CASE WHEN h < 2.0 * {PI!r} / 3.0 THEN y
       WHEN h < 4.0 * {PI!r} / 3.0 THEN x
       ELSE 3.0 * i - (x + y) END AS r0,
  CASE WHEN h < 2.0 * {PI!r} / 3.0 THEN 3.0 * i - (x + y)
       WHEN h < 4.0 * {PI!r} / 3.0 THEN y
       ELSE x END AS g0,
  CASE WHEN h < 2.0 * {PI!r} / 3.0 THEN x
       WHEN h < 4.0 * {PI!r} / 3.0 THEN 3.0 * i - (x + y)
       ELSE y END AS b0
  FROM sec)
SELECT cell_row, cell_col,
       {_BYTE('r0')} AS r, {_BYTE('g0')} AS g, {_BYTE('b0')} AS b
FROM rgb""",
    "colour_composite": f"""WITH {_PTS_CTE},
{_BANDS_CTE},
{_COMP_CTE}
SELECT cell_row, cell_col, value FROM comp""",
    "split_colour_composite": f"""WITH {_PTS_CTE},
{_BANDS_CTE},
{_COMP_CTE},
v AS (SELECT cell_row, cell_col, CAST(value AS BIGINT) AS v FROM comp)
SELECT cell_row, cell_col, 'r' AS band, CAST(v % 256 AS DOUBLE) AS value FROM v
UNION ALL
SELECT cell_row, cell_col, 'g', CAST((v // 256) % 256 AS DOUBLE) FROM v
UNION ALL
SELECT cell_row, cell_col, 'b', CAST((v // 65536) % 256 AS DOUBLE) FROM v""",
    "change_vector_analysis": f"""WITH {_PTS_CTE},
rr AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col,
       arg_max(z, doc_id) AS a0, arg_min(z, doc_id) AS a1,
       max(z) AS b0, min(z) AS b1
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col)
SELECT cell_row, cell_col,
       round(sqrt((b0 - a0) * (b0 - a0) + (b1 - a1) * (b1 - a1)), 6) AS magnitude,
       CAST(CASE WHEN b0 - a0 >= 0.0 THEN 1.0 ELSE 0.0 END
        + CASE WHEN b1 - a1 >= 0.0 THEN 2.0 ELSE 0.0 END AS DOUBLE) AS direction
FROM rr""",
    "decorrelation_stretch": f"""WITH {_PTS_CTE},
{_BANDS_CTE}
SELECT cell_row, cell_col,
       round(r - {DDS_K!r} * least(r, g, b), 6) AS r,
       round(g - {DDS_K!r} * least(r, g, b), 6) AS g,
       round(b - {DDS_K!r} * least(r, g, b), 6) AS b
FROM nb""",
    "balance_contrast": f"""WITH {_PTS_CTE},
{_BANDS_CTE},
{_COMP_CTE},
ch AS (SELECT cell_row, cell_col, CAST(CAST(value AS BIGINT) % 256 AS DOUBLE) AS r,
              CAST((CAST(value AS BIGINT) // 256) % 256 AS DOUBLE) AS g,
              CAST((CAST(value AS BIGINT) // 65536) % 256 AS DOUBLE) AS b
       FROM comp),
ag AS (SELECT min(r) AS r_l, max(r) AS r_h, avg(r) AS r_e, sum(r * r) / count(*) AS r_s,
              min(g) AS g_l, max(g) AS g_h, avg(g) AS g_e, sum(g * g) / count(*) AS g_s,
              min(b) AS b_l, max(b) AS b_h, avg(b) AS b_e, sum(b * b) / count(*) AS b_s
       FROM ch),
co AS (SELECT
  (r_h * r_h * ({BCE_MEAN!r} - 0.0) - r_s * 255.0 + r_l * r_l * (255.0 - {BCE_MEAN!r}))
    / (2.0 * (r_h * ({BCE_MEAN!r} - 0.0) - r_e * 255.0 + r_l * (255.0 - {BCE_MEAN!r}))) AS r_b,
  (g_h * g_h * ({BCE_MEAN!r} - 0.0) - g_s * 255.0 + g_l * g_l * (255.0 - {BCE_MEAN!r}))
    / (2.0 * (g_h * ({BCE_MEAN!r} - 0.0) - g_e * 255.0 + g_l * (255.0 - {BCE_MEAN!r}))) AS g_b,
  (b_h * b_h * ({BCE_MEAN!r} - 0.0) - b_s * 255.0 + b_l * b_l * (255.0 - {BCE_MEAN!r}))
    / (2.0 * (b_h * ({BCE_MEAN!r} - 0.0) - b_e * 255.0 + b_l * (255.0 - {BCE_MEAN!r}))) AS b_b,
  * FROM ag),
ab AS (SELECT *,
  255.0 / ((r_h - r_l) * (r_h + r_l - 2.0 * r_b)) AS r_a,
  255.0 / ((g_h - g_l) * (g_h + g_l - 2.0 * g_b)) AS g_a,
  255.0 / ((b_h - b_l) * (b_h + b_l - 2.0 * b_b)) AS b_a
  FROM co),
fin AS (SELECT ch.cell_row, ch.cell_col,
  floor(least(greatest(ab.r_a * (ch.r - ab.r_b) * (ch.r - ab.r_b) + (0.0 - ab.r_a * (ab.r_l - ab.r_b) * (ab.r_l - ab.r_b)), 0.0), 255.0)) AS r_o,
  floor(least(greatest(ab.g_a * (ch.g - ab.g_b) * (ch.g - ab.g_b) + (0.0 - ab.g_a * (ab.g_l - ab.g_b) * (ab.g_l - ab.g_b)), 0.0), 255.0)) AS g_o,
  floor(least(greatest(ab.b_a * (ch.b - ab.b_b) * (ch.b - ab.b_b) + (0.0 - ab.b_a * (ab.b_l - ab.b_b) * (ab.b_l - ab.b_b)), 0.0), 255.0)) AS b_o
  FROM ch CROSS JOIN ab)
SELECT cell_row, cell_col,
       255.0 * 16777216.0 + b_o * 65536.0 + g_o * 256.0 + r_o AS value
FROM fin""",
    "correct_vignetting": f"""WITH {_PTS_CTE},
rr AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_max(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col)
SELECT cell_row, cell_col,
       round(value / pow(cos(atan(
         sqrt((cell_col + 0.5 - {GRID.cols / 2.0!r}) * (cell_col + 0.5 - {GRID.cols / 2.0!r})
              + (cell_row + 0.5 - {GRID.rows / 2.0!r}) * (cell_row + 0.5 - {GRID.rows / 2.0!r}))
         * {228.6 / GRID.cols!r} / 304.8)), 4.0), 6) AS value
FROM rr""",
    "histogram_equalization": f"""WITH {_PTS_CTE},
rr AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_max(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
pv AS (SELECT value, count(*) AS cnt FROM rr GROUP BY value),
cdf AS (SELECT value, CAST(sum(cnt) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cdf
        FROM pv),
st2 AS (SELECT CAST(count(*) AS DOUBLE) AS n, min(value) AS mn FROM rr),
mc AS (SELECT CAST(count(*) AS DOUBLE) AS cdf_min FROM rr CROSS JOIN st2 WHERE rr.value = st2.mn)
SELECT rr.cell_row, rr.cell_col,
       CAST(floor((c.cdf - mc.cdf_min) / (st2.n - 1.0) * {HE_TONES - 1}.0 + 0.5) AS BIGINT) AS value
FROM rr JOIN cdf c ON c.value = rr.value CROSS JOIN st2 CROSS JOIN mc""",
    "opening": f"""WITH {_PTS_CTE},
rr AS MATERIALIZED (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_max(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
offs AS (SELECT a.i - 1 AS dr, b.i - 1 AS dc FROM range(0, 3) a(i), range(0, 3) b(i)),
e AS MATERIALIZED (SELECT c.cell_row, c.cell_col, min(n.value) AS value
       FROM rr c CROSS JOIN offs o
       JOIN rr n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
       GROUP BY c.cell_row, c.cell_col)
SELECT c.cell_row, c.cell_col, max(n.value) AS value
FROM e c CROSS JOIN offs o
JOIN e n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
GROUP BY c.cell_row, c.cell_col""",
    "closing": f"""WITH {_PTS_CTE},
rr AS MATERIALIZED (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_max(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
offs AS (SELECT a.i - 1 AS dr, b.i - 1 AS dc FROM range(0, 3) a(i), range(0, 3) b(i)),
dl AS MATERIALIZED (SELECT c.cell_row, c.cell_col, max(n.value) AS value
       FROM rr c CROSS JOIN offs o
       JOIN rr n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
       GROUP BY c.cell_row, c.cell_col)
SELECT c.cell_row, c.cell_col, min(n.value) AS value
FROM dl c CROSS JOIN offs o
JOIN dl n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
GROUP BY c.cell_row, c.cell_col""",
    "tophat_transform": f"""WITH {_PTS_CTE},
rr AS MATERIALIZED (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_max(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
offs AS (SELECT a.i - 1 AS dr, b.i - 1 AS dc FROM range(0, 3) a(i), range(0, 3) b(i)),
e AS MATERIALIZED (SELECT c.cell_row, c.cell_col, min(n.value) AS value
       FROM rr c CROSS JOIN offs o
       JOIN rr n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
       GROUP BY c.cell_row, c.cell_col),
op AS (SELECT c.cell_row, c.cell_col, max(n.value) AS value
       FROM e c CROSS JOIN offs o
       JOIN e n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
       GROUP BY c.cell_row, c.cell_col)
SELECT r2.cell_row, r2.cell_col, r2.value - op.value AS value
FROM rr r2 JOIN op ON op.cell_row = r2.cell_row AND op.cell_col = r2.cell_col""",
    "buffer_raster": f"""WITH {_PTS_CTE},
rr AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_max(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
t AS (SELECT cell_row, cell_col FROM rr WHERE value <> 0.0),
cells AS (SELECT CAST(i // {GRID.cols} AS BIGINT) AS cell_row,
                 CAST(i % {GRID.cols} AS BIGINT) AS cell_col
          FROM range(0, {GRID.rows * GRID.cols}) g(i)),
d AS (SELECT c.cell_row, c.cell_col,
       sqrt(min((CAST(c.cell_row - t.cell_row AS DOUBLE) * {GRID.res_y!r})
                  * (CAST(c.cell_row - t.cell_row AS DOUBLE) * {GRID.res_y!r})
                + (CAST(c.cell_col - t.cell_col AS DOUBLE) * {GRID.res_x!r})
                  * (CAST(c.cell_col - t.cell_col AS DOUBLE) * {GRID.res_x!r}))) AS dist
      FROM cells c CROSS JOIN t GROUP BY c.cell_row, c.cell_col)
SELECT cell_row, cell_col,
       CASE WHEN dist <= {BUF_SIZE!r} THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS value
FROM d""",
}
