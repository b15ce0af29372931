"""Query catalog: fast almost-Gaussian + hillslopes."""

from __future__ import annotations

from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE, _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.catalog_streams import _scaffold
from whitebox_tools_spark.operators import hydro, misc5 as m5

TILE_SIZE = 8
FAG_SIGMA = 1.8
ST_THRESHOLD = 2.0


def _z(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def q_fag(spark, sf_dir):
    out = m5.fast_almost_gaussian(_z(spark, sf_dir), GRID, FAG_SIGMA, TILE_SIZE)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_hillslopes(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc

    z = _z(spark, sf_dir)
    st = _cc.streams_t(spark, sf_dir, ST_THRESHOLD, TILE_SIZE)
    dirs = _cc.dirs(spark, sf_dir, TILE_SIZE)
    out = m5.hillslopes(z, st, dirs, GRID, TILE_SIZE)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


QUERIES = {
    "fast_almost_gaussian": q_fag,
    "hillslopes": q_hillslopes,
}


# ------------------------------------------------------------- oracle SQL


def _fag_sql() -> str:
    wl, wu, m = m5.fag_sizes(max(FAG_SIGMA, 1.8))
    blocks = ["r0 AS MATERIALIZED (SELECT cell_row, cell_col, value FROM r)"]
    for i in range(1, 6):
        # reference pass rule: wl while iteration_num <= m (m+1 wl passes)
        w = wl if (i - 1) <= m else wu
        mid = w // 2
        blocks.append(f"""mn{i} AS (SELECT min(value) AS m FROM r{i-1}),
of{i} AS (SELECT a.i - {mid} AS dr, b.i - {mid} AS dc
         FROM range(0, {2 * mid + 1}) a(i), range(0, {2 * mid + 1}) b(i)),
r{i} AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col, s / cnt + m AS value FROM (
    SELECT c.cell_row, c.cell_col, any_value(mn{i}.m) AS m,
           sum(n.value - mn{i}.m) AS s, count(*) AS cnt
    FROM r{i-1} c CROSS JOIN mn{i} CROSS JOIN of{i} o
    JOIN r{i-1} n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
    WHERE c.cell_row + o.dr >= 1 AND c.cell_col + o.dc >= 1
    GROUP BY c.cell_row, c.cell_col) c)""")
    joined = ",\n".join(blocks)
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{joined}
SELECT cell_row, cell_col, round(value, 6) AS value FROM r5"""


def _hillslopes_sql() -> str:
    dys = ",".join(str(v) for v in hydro.D8_DY)
    dxs = ",".join(str(v) for v in hydro.D8_DX)
    return _scaffold(f"""
intra AS (SELECT e.a, e.b FROM sedges e JOIN inflow i ON i.b = e.b WHERE i.n_in = 1),
sym AS (SELECT a, b FROM intra UNION ALL SELECT b, a FROM intra),
cc AS (SELECT id AS node, id AS lbl FROM snodes
       UNION
       SELECT s.b, cc.lbl FROM cc JOIN sym s ON s.a = cc.node),
comp AS MATERIALIZED (SELECT node, min(lbl) AS comp FROM cc GROUP BY node),
ranked AS (SELECT comp, row_number() OVER (ORDER BY comp) AS link
           FROM (SELECT DISTINCT comp FROM comp)),
slink AS MATERIALIZED (SELECT c.node AS id, r2.link
         FROM comp c JOIN ranked r2 ON r2.comp = c.comp),
ns AS MATERIALIZED (SELECT n.* FROM nodes n
      WHERE n.id NOT IN (SELECT id FROM slink)),
sw AS (SELECT id AS src, CAST(NULL AS BIGINT) AS prev, id AS cur FROM ns
       UNION ALL
       SELECT w.src, w.cur, d.b FROM sw w JOIN down d ON d.a = w.cur
       WHERE w.cur NOT IN (SELECT id FROM slink)),
entry AS (SELECT src, prev AS u, cur AS v FROM sw
          WHERE cur IN (SELECT id FROM slink) AND prev IS NOT NULL),
vside AS (SELECT e.src, sl.link,
  CASE WHEN vn.dir < 0 THEN 0
       WHEN [{dxs}][vn.dir + 1] * (e.u // {GRID.cols} - e.v // {GRID.cols})
            - [{dys}][vn.dir + 1] * (e.u % {GRID.cols} - e.v % {GRID.cols}) > 0 THEN 1
       WHEN [{dxs}][vn.dir + 1] * (e.u // {GRID.cols} - e.v // {GRID.cols})
            - [{dys}][vn.dir + 1] * (e.u % {GRID.cols} - e.v % {GRID.cols}) < 0 THEN 2
       ELSE 0 END AS side
  FROM entry e JOIN slink sl ON sl.id = e.v
  JOIN nodes vn ON vn.id = e.v)
SELECT n.cell_row, n.cell_col, CAST(v.link * 3 + v.side AS DOUBLE) AS value
FROM vside v JOIN nodes n ON n.id = v.src
UNION ALL
SELECT n.cell_row, n.cell_col, CAST(sl.link * 3 AS DOUBLE) AS value
FROM slink sl JOIN nodes n ON n.id = sl.id""")


ORACLE_SQL = {
    "fast_almost_gaussian": _fag_sql(),
    "hillslopes": _hillslopes_sql(),
}
