"""Query catalog: hit-and-miss morphology (LineThinning /
ThickenRasterLine / CornerDetection) over the 0/1 stream raster.
Oracles unroll the synchronous passes with 8 neighbour self-joins per
pass — identical mask arithmetic to operators/morpho.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import GRID
from whitebox_tools_spark.catalog_iter import _Z_CTE, _d8_dir_sql
from whitebox_tools_spark.catalog_grid import _PTS_CTE
from whitebox_tools_spark.operators import hydro, morpho

TILE_SIZE = 8
ST_THRESHOLD = 2.0
THIN_ROUNDS = 6


def _bool_raster(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc

    return _cc.streams_t(spark, sf_dir, ST_THRESHOLD, TILE_SIZE)


def _sel(df):
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_line_thinning(spark, sf_dir):
    return _sel(morpho.line_thinning(
        _bool_raster(spark, sf_dir), GRID, max_rounds=THIN_ROUNDS, tile_size=TILE_SIZE
    ))


def q_thicken_line(spark, sf_dir):
    return _sel(morpho.thicken_raster_line(
        _bool_raster(spark, sf_dir), GRID, tile_size=TILE_SIZE
    ))


def q_corner_detection(spark, sf_dir):
    return _sel(morpho.corner_detection(
        _bool_raster(spark, sf_dir), GRID, tile_size=TILE_SIZE
    ))


QUERIES = {
    "line_thinning": q_line_thinning,
    "thicken_raster_line": q_thicken_line,
    "corner_detection": q_corner_detection,
}


# ------------------------------------------------------------- oracle SQL

_DXS = ",".join(str(v) for v in hydro.D8_DX)
_DYS = ",".join(str(v) for v in hydro.D8_DY)

_BOOL_CTES = f"""{_d8_dir_sql().lstrip()},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b
         FROM nodes WHERE dir >= 0),
walk0 AS (SELECT id AS src, id AS cur FROM nodes
          UNION ALL
          SELECT w.src, d.b FROM walk0 w JOIN down d ON d.a = w.cur),
b0 AS MATERIALIZED (
  SELECT n.cell_row, n.cell_col,
         CASE WHEN count(*) > {ST_THRESHOLD!r} THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS value
  FROM walk0 w JOIN nodes n ON n.id = w.cur
  GROUP BY n.cell_row, n.cell_col)"""


def _nbr_joins(prev: str) -> str:
    joins = []
    for i, (dx, dy) in enumerate(zip(morpho.MDX, morpho.MDY)):
        joins.append(
            f"LEFT JOIN {prev} n{i} ON n{i}.cell_row = c.cell_row + ({dy}) "
            f"AND n{i}.cell_col = c.cell_col + ({dx})"
        )
    return "\n  ".join(joins)


def _thin_cond(a: int) -> str:
    c1 = " AND ".join(
        f"n{e}.value = {v!r}"
        for e, v in zip(morpho.THIN_ELEMENTS1[a], morpho.THIN_VALS1)
    )
    c2 = " AND ".join(
        f"n{e}.value = {v!r}"
        for e, v in zip(morpho.THIN_ELEMENTS2[a], morpho.THIN_VALS2)
    )
    return f"(({c1}) OR ({c2}))"


def _thin_sql() -> str:
    blocks = []
    prev = "b0"
    for k in range(1, THIN_ROUNDS + 1):
        for a in range(4):
            name = f"t{k}_{a}"
            blocks.append(
                f"""{name} AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col,
         CASE WHEN c.value > 0.0 AND {_thin_cond(a)}
              THEN CAST(0.0 AS DOUBLE) ELSE c.value END AS value
  FROM {prev} c
  {_nbr_joins(prev)})"""
            )
            prev = name
    joined = ",\n".join(blocks)
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_BOOL_CTES},
{joined}
SELECT cell_row, cell_col, round(value, 6) AS value FROM {prev}"""


def _thicken_sql() -> str:
    n1 = list(zip([0, 1, 0, -1], [-1, 0, 1, 0]))
    n2 = list(zip([1, 1, -1, -1], [-1, 1, 1, -1]))
    n3 = list(zip([1, 0, -1, 0], [0, 1, 0, -1]))
    joins, whens = [], []
    for i, ((x1, y1), (x2, y2), (x3, y3)) in enumerate(zip(n1, n2, n3)):
        joins.append(
            f"LEFT JOIN b0 a{i} ON a{i}.cell_row = c.cell_row + ({y1}) AND a{i}.cell_col = c.cell_col + ({x1})\n"
            f"  LEFT JOIN b0 d{i} ON d{i}.cell_row = c.cell_row + ({y2}) AND d{i}.cell_col = c.cell_col + ({x2})\n"
            f"  LEFT JOIN b0 e{i} ON e{i}.cell_row = c.cell_row + ({y3}) AND e{i}.cell_col = c.cell_col + ({x3})"
        )
        whens.append(
            f"WHEN a{i}.value > 0.0 AND e{i}.value > 0.0 "
            f"AND NOT coalesce(d{i}.value > 0.0, FALSE) THEN a{i}.value"
        )
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_BOOL_CTES}
SELECT c.cell_row, c.cell_col,
       round(CASE WHEN NOT (c.value > 0.0)
                  THEN CASE {' '.join(whens)} ELSE c.value END
                  ELSE c.value END, 6) AS value
FROM b0 c
  {chr(10).join('  ' + j for j in joins)}"""


def _corner_sql() -> str:
    conds = []
    for a in range(4):
        c = " AND ".join(
            f"coalesce(n{e}.value > 0.0, FALSE) = {str(v == 1.0).upper()}"
            for e, v in zip(morpho.CORNER_ELEMENTS[a], morpho.CORNER_VALS)
        )
        conds.append(f"({c})")
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_BOOL_CTES}
SELECT c.cell_row, c.cell_col,
       round(CASE WHEN c.value > 0.0 AND ({' OR '.join(conds)})
                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END, 6) AS value
FROM b0 c
  {_nbr_joins('b0')}"""


ORACLE_SQL = {
    "line_thinning": _thin_sql(),
    "thicken_raster_line": _thicken_sql(),
    "corner_detection": _corner_sql(),
}
