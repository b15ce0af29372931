"""Query catalog: hydrology batch 3 (FD8 pointer, euclidean
stream-relative elevation, mean flow-path gradient, longest flow path,
stream burning, full fill->accumulate workflow)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE
from whitebox_tools_spark.catalog_hydro2 import _fill_sql, FILL_ROUNDS
from whitebox_tools_spark.catalog_iter import _Z_CTE, _d8_dir_sql
from whitebox_tools_spark.operators import hydro, hydro3, streams2 as s2, trend
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.hydro import _d8_dir_stencil
from whitebox_tools_spark.sources import vectors
from whitebox_tools_spark.sources.tables import documents
from whitebox_tools_spark.localrel import local_df

TILE_SIZE = 8
ST_THRESHOLD = 2.0
BURN = 20.0

_DIAG = math.sqrt(GRID.res_x**2 + GRID.res_y**2)
_LENS = [_DIAG, GRID.res_x, _DIAG, GRID.res_y, _DIAG, GRID.res_x, _DIAG, GRID.res_y]
_DYS = ",".join(str(v) for v in hydro.D8_DY)
_DXS = ",".join(str(v) for v in hydro.D8_DX)
_LEN_ARR = "[" + ",".join(repr(v) for v in _LENS) + "]"


def _z(spark, sf_dir):
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _streams(spark, sf_dir):
    z = _z(spark, sf_dir)
    from whitebox_tools_spark import catalog_cache as _cc2
    accum = _cc2.accum(spark, sf_dir, TILE_SIZE)
    return trend.extract_streams(accum, ST_THRESHOLD)


def _aliased(df: DataFrame, round6: bool = False) -> DataFrame:
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


QUERIES = {
    "fd8_pointer": lambda s, d: _aliased(
        hydro3.fd8_pointer(_z(s, d), GRID, TILE_SIZE)),
    "elev_above_stream_euclidean": lambda s, d: _aliased(
        hydro3.elevation_above_stream_euclidean(_z(s, d), _streams(s, d), GRID),
        round6=True),
    "average_flowpath_slope": lambda s, d: _aliased(
        hydro3.average_flowpath_slope(_z(s, d), GRID, TILE_SIZE), round6=True),
    "longest_flowpath": lambda s, d: _aliased(
        hydro3.longest_flowpath(_z(s, d), GRID, TILE_SIZE), round6=True),
    "fill_burn": lambda s, d: _aliased(
        hydro3.fill_burn(
            _z(s, d),
            s2.rasterize_streams(
                local_df(s, vectors.line_layer_rows(vectors.LINE_SPECS_1)), GRID
            ),
            GRID, BURN, FILL_ROUNDS)),
    "flow_accum_full_workflow": lambda s, d: _aliased(
        hydro3.flow_accumulation_full_workflow(
            _z(s, d), GRID, FILL_ROUNDS, tile_size=TILE_SIZE)),
}


# ------------------------------------------------------------- oracle SQL


def _fd8p_sql() -> str:
    offs = ", ".join(
        f"({i}, {hydro.D8_DY[i]}, {hydro.D8_DX[i]})" for i in range(8)
    )
    return f"""WITH {_PTS_CTE},
{_Z_CTE},
o8 AS (SELECT * FROM (VALUES {offs}) o(i, dr, dc))
SELECT c.cell_row, c.cell_col,
       CAST(coalesce(sum(CASE WHEN n.value < c.value THEN pow(2.0, o.i) END), 0.0) AS DOUBLE) AS value
FROM r c CROSS JOIN o8 o
LEFT JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
GROUP BY c.cell_row, c.cell_col"""


def _ease_sql() -> str:
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS MATERIALIZED (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b
         FROM nodes WHERE dir >= 0),
walk0 AS (SELECT id AS src, id AS cur FROM nodes
          UNION ALL
          SELECT w.src, d.b FROM walk0 w JOIN down d ON d.a = w.cur),
accum AS (SELECT cur AS id, CAST(count(*) AS DOUBLE) AS value FROM walk0 GROUP BY cur),
scell AS MATERIALIZED (SELECT n.cell_row, n.cell_col FROM nodes n
        JOIN accum a ON a.id = n.id WHERE a.value > {ST_THRESHOLD!r}),
sz AS (SELECT s.cell_row, s.cell_col, r.value AS z FROM scell s
       JOIN r ON r.cell_row = s.cell_row AND r.cell_col = s.cell_col),
near AS (SELECT c.cell_row, c.cell_col, t.z AS sz,
         (CAST(c.cell_row - t.cell_row AS DOUBLE) * {GRID.res_y!r})
           * (CAST(c.cell_row - t.cell_row AS DOUBLE) * {GRID.res_y!r})
         + (CAST(c.cell_col - t.cell_col AS DOUBLE) * {GRID.res_x!r})
           * (CAST(c.cell_col - t.cell_col AS DOUBLE) * {GRID.res_x!r}) AS d2,
         t.cell_row AS trow, t.cell_col AS tcol
         FROM r c CROSS JOIN sz t),
pick AS (SELECT cell_row, cell_col, sz FROM near
         QUALIFY row_number() OVER (PARTITION BY cell_row, cell_col
                                    ORDER BY d2, trow, tcol) = 1)
SELECT r.cell_row, r.cell_col, round(r.value - p.sz, 6) AS value
FROM r JOIN pick p ON p.cell_row = r.cell_row AND p.cell_col = r.cell_col"""


def _afs_sql() -> str:
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS MATERIALIZED (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b,
                {_LEN_ARR}[dir + 1] AS len
         FROM nodes WHERE dir >= 0),
wk AS (SELECT id AS src, id AS cur, CAST(0.0 AS DOUBLE) AS d FROM nodes
       UNION ALL
       SELECT w.src, e.b, w.d + e.len FROM wk w JOIN down e ON e.a = w.cur),
term AS (SELECT src, cur AS t, d AS plen FROM wk WHERE cur NOT IN (SELECT a FROM down)),
zmap AS (SELECT cell_row * {GRID.cols} + cell_col AS id, value AS z FROM r)
SELECT n.cell_row, n.cell_col,
       round(CASE WHEN x.plen > 0.0
                  THEN degrees(atan((zs.z - zt.z) / x.plen)) ELSE 0.0 END, 6) AS value
FROM term x JOIN nodes n ON n.id = x.src
JOIN zmap zs ON zs.id = x.src JOIN zmap zt ON zt.id = x.t"""


def _lfp_sql() -> str:
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS MATERIALIZED (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b,
                {_LEN_ARR}[dir + 1] AS len
         FROM nodes WHERE dir >= 0),
wk AS (SELECT id AS src, id AS cur, CAST(0.0 AS DOUBLE) AS d FROM nodes
       UNION ALL
       SELECT w.src, e.b, w.d + e.len FROM wk w JOIN down e ON e.a = w.cur),
term AS MATERIALIZED (SELECT src, cur AS t FROM wk WHERE cur NOT IN (SELECT a FROM down)),
maxup AS (SELECT cur AS id, max(d) AS ln FROM wk GROUP BY cur)
SELECT n.cell_row, n.cell_col, round(m.ln, 6) AS value
FROM term x JOIN nodes n ON n.id = x.src
JOIN maxup m ON m.id = x.t"""


_RASTERIZE_CELLS = f"""{vectors.line_specs_sql(vectors.LINE_SPECS_1, 'segs')},
sn AS (SELECT *, greatest(CAST(ceil(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
                               / {GRID.res_x / 2.0!r}) AS BIGINT), 1) AS n
       FROM segs),
ksr AS (SELECT sn.*, g.i AS k FROM sn, range(0, 10000) g(i) WHERE g.i <= sn.n),
burncells AS MATERIALIZED (
  SELECT DISTINCT
    CAST(floor(({GRID.north!r} - (y1 + (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (y2 - y1))) / {GRID.res_y!r}) AS BIGINT) AS cell_row,
    CAST(floor(((x1 + (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (x2 - x1)) - {GRID.west!r}) / {GRID.res_x!r}) AS BIGINT) AS cell_col
  FROM ksr)"""


def _fill_burn_sql() -> str:
    base = _fill_sql(f"""SELECT CAST(id // {GRID.cols} AS BIGINT) AS cell_row,
       CAST(id % {GRID.cols} AS BIGINT) AS cell_col, w AS value
FROM w{FILL_ROUNDS}""")
    # burn the stream cells into the z raster the fill chain reads:
    # rename the original raster CTE and interpose the burned version
    base = base.replace(
        "r AS (SELECT", "r0 AS (SELECT", 1
    ).replace(
        "cells AS MATERIALIZED (SELECT cell_row, cell_col,",
        f"""{_RASTERIZE_CELLS},
r AS (SELECT r0.cell_row, r0.cell_col,
      CASE WHEN b.cell_row IS NOT NULL THEN r0.value - {BURN!r} ELSE r0.value END AS value
      FROM r0 LEFT JOIN burncells b
        ON b.cell_row = r0.cell_row AND b.cell_col = r0.cell_col),
cells AS MATERIALIZED (SELECT cell_row, cell_col,""",
        1,
    )
    return base


def _faw_sql() -> str:
    # fill chain ending in a CTE named rf, then D8 dirs/accum on rf
    fill_part = _fill_sql("")
    fill_part = fill_part.rsplit("\n", 1)[0].rstrip()
    dirs = _d8_dir_sql().lstrip().replace("FROM r c", "FROM rf c").replace(
        "LEFT JOIN r n", "LEFT JOIN rf n"
    )
    return f"""{fill_part.rstrip()},
rf AS MATERIALIZED (SELECT CAST(id // {GRID.cols} AS BIGINT) AS cell_row,
       CAST(id % {GRID.cols} AS BIGINT) AS cell_col, w AS value FROM w{FILL_ROUNDS}),
{dirs},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS MATERIALIZED (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b
         FROM nodes WHERE dir >= 0),
walk0 AS (SELECT id AS src, id AS cur FROM nodes
          UNION ALL
          SELECT w.src, d.b FROM walk0 w JOIN down d ON d.a = w.cur)
SELECT n.cell_row, n.cell_col, CAST(count(*) AS DOUBLE) AS value
FROM walk0 w JOIN nodes n ON n.id = w.cur
GROUP BY n.cell_row, n.cell_col"""


def _faw_full_sql() -> str:
    sql = _faw_sql()
    # the fill scaffold isn't RECURSIVE but walk0 is
    return sql.replace("WITH pts", "WITH RECURSIVE pts", 1)


ORACLE_SQL = {
    "fd8_pointer": _fd8p_sql(),
    "elev_above_stream_euclidean": _ease_sql(),
    "average_flowpath_slope": _afs_sql(),
    "longest_flowpath": _lfp_sql(),
    "fill_burn": _fill_burn_sql(),
    "flow_accum_full_workflow": _faw_full_sql(),
}


# ---------------------------------------------------- breach depressions

BREACH_EPS = 1e-05


def q_breach_depressions(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators import hydro2

    out = hydro2.breach_depressions(
        _cc.z_last(spark, sf_dir), GRID, epsilon=BREACH_EPS,
        tile_size=TILE_SIZE, max_rounds=FILL_ROUNDS,
    )
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES["breach_depressions"] = q_breach_depressions


def _breach_sql() -> str:
    # eps-fill chain -> rf -> D8 dirs on rf -> upstream-min of ORIGINAL z
    fill_part = _fill_sql("", epsilon=BREACH_EPS)
    fill_part = fill_part.rsplit("\n", 1)[0].rstrip()
    dirs = _d8_dir_sql().lstrip().replace("FROM r c", "FROM rf c").replace(
        "LEFT JOIN r n", "LEFT JOIN rf n"
    )
    return f"""{fill_part.rstrip()},
rf AS MATERIALIZED (SELECT CAST(id // {GRID.cols} AS BIGINT) AS cell_row,
       CAST(id % {GRID.cols} AS BIGINT) AS cell_col, w AS value FROM w{FILL_ROUNDS}),
{dirs},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS MATERIALIZED (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b
         FROM nodes WHERE dir >= 0),
walk0 AS (SELECT id AS src, id AS cur FROM nodes
          UNION ALL
          SELECT w.src, d.b FROM walk0 w JOIN down d ON d.a = w.cur)
SELECT n_.cell_row, n_.cell_col, round(min(wz.z), 6) AS value
FROM walk0 w JOIN nodes n_ ON n_.id = w.cur
JOIN w{FILL_ROUNDS} wz ON wz.id = w.src
GROUP BY n_.cell_row, n_.cell_col""".replace("WITH pts", "WITH RECURSIVE pts", 1)


ORACLE_SQL["breach_depressions"] = _breach_sql()


# ---------------------------------------------------- max branch length


def q_max_branch_length(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators.branch import max_branch_length

    out = max_branch_length(_cc.z_last(spark, sf_dir), GRID, tile_size=TILE_SIZE)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES["max_branch_length"] = q_max_branch_length


def _mbl_sql() -> str:
    diag = math.sqrt(GRID.res_x * GRID.res_x + GRID.res_y * GRID.res_y)
    lens = [diag, GRID.res_x, diag, GRID.res_y, diag, GRID.res_x, diag, GRID.res_y]
    len_arr = "[" + ",".join(repr(v) for v in lens) + "]"
    dirs = _d8_dir_sql().lstrip()
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{dirs},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS MATERIALIZED (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b,
                {len_arr}[dir + 1] AS len
         FROM nodes WHERE dir >= 0),
walk AS (SELECT id AS src, id AS cur, CAST(0.0 AS DOUBLE) AS d FROM nodes
         UNION ALL
         SELECT w.src, dn.b, w.d + dn.len FROM walk w JOIN down dn ON dn.a = w.cur),
flows AS (SELECT id, cell_row, cell_col FROM nodes WHERE dir >= 0),
prs AS MATERIALIZED (
  SELECT u.id AS ua, v.id AS vb FROM flows u JOIN flows v
    ON v.cell_row = u.cell_row AND v.cell_col = u.cell_col + 1
  UNION ALL
  SELECT u.id, v.id FROM flows u JOIN flows v
    ON v.cell_row = u.cell_row + 1 AND v.cell_col = u.cell_col),
met AS MATERIALIZED (
  SELECT p.ua, p.vb, min(w1.d) AS du
  FROM prs p JOIN walk w1 ON w1.src = p.ua
             JOIN walk w2 ON w2.src = p.vb AND w2.cur = w1.cur
  GROUP BY p.ua, p.vb),
metv AS (SELECT m.ua, m.vb, m.du, w2.d AS dv
  FROM met m JOIN walk w1 ON w1.src = m.ua AND w1.d = m.du
             JOIN walk w2 ON w2.src = m.vb AND w2.cur = w1.cur),
term AS MATERIALIZED (SELECT src, max(d) AS dterm FROM walk GROUP BY src),
unmet AS (SELECT p.ua, p.vb, tu.dterm AS du, tv.dterm AS dv
  FROM prs p
  LEFT JOIN met m ON m.ua = p.ua AND m.vb = p.vb
  JOIN term tu ON tu.src = p.ua JOIN term tv ON tv.src = p.vb
  WHERE m.ua IS NULL),
contrib AS (SELECT ua AS id, du AS dist FROM metv
  UNION ALL SELECT vb, dv FROM metv
  UNION ALL SELECT ua, du FROM unmet
  UNION ALL SELECT vb, dv FROM unmet),
per AS (SELECT id, max(dist) AS bmax FROM contrib GROUP BY id)
SELECT n.cell_row, n.cell_col, round(coalesce(per.bmax, 0.0), 6) AS value
FROM nodes n LEFT JOIN per ON per.id = n.id"""


ORACLE_SQL["max_branch_length"] = _mbl_sql()
