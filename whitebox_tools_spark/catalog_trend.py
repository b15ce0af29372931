"""Query catalog: trend surface, radius of gyration, stream extraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _IN_GRID_SQL, _CELLS_CTE, _COL_SQL, _PTS_CTE, _ROW_SQL
from whitebox_tools_spark.catalog_iter import _Z_CTE, _d8_dir_sql
from whitebox_tools_spark.operators import hydro, trend
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.sources.tables import documents

TILE_SIZE = 8
STREAM_T = 4.0


def _geo(spark, sf_dir):
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def q_trend_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _geo(spark, sf_dir).select("x", "y", "z")
    out = trend.trend_surface(pts, GRID)
    return out.select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_radius_of_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = rop.points_to_raster(_geo(spark, sf_dir), GRID, assign="max", field="cls").select(
        "row", "col", F.col("value").cast("double").alias("value")
    )
    out = trend.radius_of_gyration(r, GRID)
    return out.select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_extract_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whitebox_tools_spark import catalog_cache as _cc5
    z = _cc5.z_last(spark, sf_dir)
    from whitebox_tools_spark import catalog_cache as _cc4
    accum = _cc4.accum(spark, sf_dir, TILE_SIZE)
    out = trend.extract_streams(accum, STREAM_T)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


QUERIES = {
    "trend_surface": q_trend_surface,
    "radius_of_gyration": q_radius_of_gyration,
    "extract_streams": q_extract_streams,
}

_CRAMER = """
m AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy,
             sum(x * z) AS sxz, sum(y * z) AS syz
      FROM pts),
c AS (SELECT
  n * (sxx * syy - sxy * sxy) - sx * (sx * syy - sxy * sy) + sy * (sx * sxy - sxx * sy) AS det,
  sz * (sxx * syy - sxy * sxy) - sx * (sxz * syy - sxy * syz) + sy * (sxz * sxy - sxx * syz) AS n0,
  n * (sxz * syy - sxy * syz) - sz * (sx * syy - sxy * sy) + sy * (sx * syz - sxz * sy) AS n1,
  n * (sxx * syz - sxz * sxy) - sx * (sx * syz - sxz * sy) + sz * (sx * sxy - sxx * sy) AS n2
  FROM m)"""

ORACLE_SQL = {
    "trend_surface": f"""
WITH {_PTS_CTE},
{_CELLS_CTE},
{_CRAMER.lstrip()}
SELECT cells.cell_row, cells.cell_col,
       round(n0 / det + (n1 / det) * cells.x + (n2 / det) * cells.y, 6) AS value
FROM cells CROSS JOIN c
""",
    "radius_of_gyration": f"""
WITH {_PTS_CTE},
r AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col,
             CAST(max(cls) AS DOUBLE) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
pos AS (SELECT cell_row, cell_col, value, CAST(value AS BIGINT) AS cls FROM r WHERE value > 0.0),
cent AS (SELECT cls, CAST(sum(cell_col) AS DOUBLE) / count(*) AS cx,
                CAST(sum(cell_row) AS DOUBLE) / count(*) AS cy,
                count(*) AS n_tot
         FROM pos GROUP BY cls),
last AS (SELECT cls, cell_row, max(cell_col) AS cell_col FROM pos GROUP BY cls, cell_row),
g AS (SELECT l.cls,
             sum(((CAST(l.cell_col AS DOUBLE) - c.cx) * {GRID.res_x!r})
                   * ((CAST(l.cell_col AS DOUBLE) - c.cx) * {GRID.res_x!r})
                 + ((CAST(l.cell_row AS DOUBLE) - c.cy) * {GRID.res_y!r})
                   * ((CAST(l.cell_row AS DOUBLE) - c.cy) * {GRID.res_y!r})) AS gsum
      FROM last l JOIN cent c USING (cls) GROUP BY l.cls),
rog AS (SELECT g.cls,
               CASE WHEN g.gsum > 0.0 THEN sqrt(g.gsum / CAST(c.n_tot AS DOUBLE))
                    ELSE 0.0 END AS rog
        FROM g JOIN cent c USING (cls))
SELECT p.cell_row, p.cell_col, round(rog.rog, 6) AS value
FROM pos p JOIN rog ON p.cls = rog.cls
UNION ALL
SELECT cell_row, cell_col, round(value, 6) AS value FROM r WHERE NOT (value > 0.0)
""",
    "extract_streams": f"""
WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS (SELECT id AS a,
                (cell_row + [{','.join(str(v) for v in hydro.D8_DY)}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{','.join(str(v) for v in hydro.D8_DX)}][dir + 1]) AS b
         FROM nodes WHERE dir >= 0),
walk AS (SELECT id AS src, id AS cur FROM nodes
         UNION ALL
         SELECT w.src, d.b FROM walk w JOIN down d ON d.a = w.cur),
accum AS (SELECT n.cell_row, n.cell_col, CAST(count(*) AS DOUBLE) AS value
          FROM walk w JOIN nodes n ON n.id = w.cur
          GROUP BY n.cell_row, n.cell_col)
SELECT cell_row, cell_col,
       CASE WHEN value > {STREAM_T!r} THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS value
FROM accum
""",
}


def q_shape_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class hull/MBB/circle stats. No SQL oracle (hull algorithms are
    not SQL-expressible); the driver records a rows-only check and
    tests/test_shapes.py carries the property/parity coverage."""
    from whitebox_tools_spark.operators.shapes import group_shape_stats

    out = group_shape_stats(_geo(spark, sf_dir), "cls")
    cols = [
        F.round(c, 6).alias(c) if t == "double" else F.col(c)
        for c, t in out.dtypes
    ]
    return out.select(*cols)


QUERIES["shape_stats"] = q_shape_stats
