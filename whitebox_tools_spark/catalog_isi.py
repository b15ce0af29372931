"""Query catalog: Isobasins + ImpoundmentSizeIndex.

Oracles: Isobasins' frontier DP is unrolled as chained CTEs (one
aggregate round per CTE, like the fill oracle); the fixture grid's
max D8 chain height is 7 (probed), unrolled to DP_ROUNDS = 12.
ImpoundmentSizeIndex composes the epsilon-fill chain, D8-on-filled
recursive path closure, and the 4-direction dam-crest profile scan.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE
from whitebox_tools_spark.catalog_hydro2 import FILL_ROUNDS, _fill_sql
from whitebox_tools_spark.catalog_iter import _Z_CTE, _d8_dir_sql
from whitebox_tools_spark.operators import hydro

TILE_SIZE = 8
ISO_TARGET = 40
DP_ROUNDS = 12
DAM_LENGTH = 11.0
ISI_EPS = 1e-05

_DIAG = math.sqrt(GRID.res_x * GRID.res_x + GRID.res_y * GRID.res_y)
_LENS = [_DIAG, GRID.res_x, _DIAG, GRID.res_y, _DIAG, GRID.res_x, _DIAG, GRID.res_y]
_DYS = ",".join(str(v) for v in hydro.D8_DY)
_DXS = ",".join(str(v) for v in hydro.D8_DX)
_LEN_ARR = "[" + ",".join(repr(v) for v in _LENS) + "]"


def q_isobasins(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators.isobasins import isobasins

    out = isobasins(_cc.z_last(spark, sf_dir), GRID, ISO_TARGET, tile_size=TILE_SIZE)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.col("value"),
    )


def q_impoundment_index(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators.impound import impoundment_size_index

    out = impoundment_size_index(
        _cc.z_last(spark, sf_dir), GRID, dam_length=DAM_LENGTH,
        epsilon=ISI_EPS, tile_size=TILE_SIZE, max_rounds=FILL_ROUNDS,
    )
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
        F.round("dam_height", 6).alias("dam_height"),
    )


def q_impoundment_depth(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators.impound import impoundment_size_index

    out = impoundment_size_index(
        _cc.z_last(spark, sf_dir), GRID, dam_length=DAM_LENGTH,
        out_type="depth", epsilon=ISI_EPS, tile_size=TILE_SIZE,
        max_rounds=FILL_ROUNDS,
    )
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES = {
    "isobasins": q_isobasins,
    "impoundment_index": q_impoundment_index,
    "impoundment_depth": q_impoundment_depth,
}


# ------------------------------------------------------------- oracle SQL


def _iso_sql() -> str:
    t = ISO_TARGET
    icase = " ".join(
        f"WHEN ar - br = {hydro.D8_DY[i]} AND ac - bc = {hydro.D8_DX[i]} THEN {i}"
        for i in range(8)
    )
    blocks = [
        """res0 AS (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS fa
        WHERE false)"""
    ]
    mk_names = []
    for k in range(1, DP_ROUNDS + 1):
        p = k - 1
        blocks.append(
            f"""agg{k} AS (SELECT n.id,
        1 + coalesce(sum(q.fa), 0) AS fa_in
      FROM nodes n
      LEFT JOIN iedges e ON e.b = n.id
      LEFT JOIN res{p} q ON q.id = e.a
      WHERE n.id NOT IN (SELECT id FROM res{p} WHERE id IS NOT NULL)
      GROUP BY n.id HAVING count(e.a) = count(q.fa))"""
        )
        blocks.append(
            f"""chl{k} AS (SELECT e.b AS id, e.a AS child, q.fa
      FROM iedges e JOIN res{p} q ON q.id = e.a
      QUALIFY row_number() OVER (PARTITION BY e.b ORDER BY q.fa DESC, e.i ASC) = 1)"""
        )
        blocks.append(
            f"""dec{k} AS MATERIALIZED (SELECT a.id, a.fa_in, c.child, c.fa AS infa,
        (a.fa_in >= {t}) AS ovr,
        (a.fa_in >= {t} AND c.child IS NOT NULL AND c.fa <= {t}
         AND ({t} - c.fa) < (a.fa_in - {t})) AS cut
      FROM agg{k} a LEFT JOIN chl{k} c ON c.id = a.id)"""
        )
        blocks.append(
            f"""res{k} AS MATERIALIZED (SELECT id, fa FROM res{p}
      UNION ALL
      SELECT id, CASE WHEN cut THEN fa_in - infa
                      WHEN ovr THEN 1 ELSE fa_in END AS fa FROM dec{k})"""
        )
        blocks.append(
            f"""mk{k} AS (SELECT child AS id FROM dec{k} WHERE cut
      UNION ALL SELECT id FROM dec{k} WHERE ovr AND NOT cut)"""
        )
        mk_names.append(f"SELECT id FROM mk{k}")
    marks_union = "\n      UNION ALL ".join(mk_names)
    dp = ",\n".join(blocks)
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
nodes AS MATERIALIZED (SELECT cell_row, cell_col,
         cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS MATERIALIZED (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b,
                {_LEN_ARR}[dir + 1] AS len
         FROM nodes WHERE dir >= 0),
iedges AS MATERIALIZED (SELECT d.a, d.b,
         CASE {icase} END AS i
  FROM (SELECT a, b,
               CAST(a // {GRID.cols} AS BIGINT) AS ar, CAST(a % {GRID.cols} AS BIGINT) AS ac,
               CAST(b // {GRID.cols} AS BIGINT) AS br, CAST(b % {GRID.cols} AS BIGINT) AS bc
        FROM down) d),
{dp},
marks AS MATERIALIZED (SELECT DISTINCT id FROM (
      {marks_union}
      UNION ALL SELECT id FROM nodes WHERE dir < 0)),
ranked AS (SELECT id, CAST(row_number() OVER (ORDER BY id) AS DOUBLE) AS label
           FROM marks),
walk AS (SELECT id AS src, id AS cur, CAST(0.0 AS DOUBLE) AS d FROM nodes
         UNION ALL
         SELECT w.src, dd.b, w.d + dd.len FROM walk w JOIN down dd ON dd.a = w.cur)
SELECT n.cell_row, n.cell_col, p.label AS value
FROM (SELECT w.src, r_.label
      FROM walk w JOIN ranked r_ ON r_.id = w.cur
      QUALIFY row_number() OVER (PARTITION BY w.src ORDER BY w.d, r_.label) = 1) p
JOIN nodes n ON n.id = p.src"""


def _isi_sql() -> str:
    half = int(DAM_LENGTH / 2.0)
    perp1 = [2, 3, 4, 1]
    perp2 = [6, 7, 0, 5]
    rows = []
    for d in range(4):
        for side, p in ((1, perp1[d]), (2, perp2[d])):
            for i in range(1, half + 1):
                rows.append(f"({d}, {side}, {hydro.D8_DY[p] * i}, {hydro.D8_DX[p] * i})")
    offs = ", ".join(rows)
    fill_part = _fill_sql("", epsilon=ISI_EPS)
    fill_part = fill_part.rsplit("\n", 1)[0].rstrip()
    dirs = _d8_dir_sql().lstrip().replace("FROM r c", "FROM rf c").replace(
        "LEFT JOIN r n", "LEFT JOIN rf n"
    )
    return f"""{fill_part.rstrip()},
doffs AS (SELECT * FROM (VALUES {offs}) o(dir, side, dy, dx)),
crest AS MATERIALIZED (SELECT pd.cell_row, pd.cell_col, max(least(mx1, mx2)) AS crest
  FROM (SELECT c.cell_row, c.cell_col, o.dir,
        greatest(c.value, coalesce(max(CASE WHEN o.side = 1 THEN n.value END),
                                   CAST('-inf' AS DOUBLE))) AS mx1,
        greatest(c.value, coalesce(max(CASE WHEN o.side = 2 THEN n.value END),
                                   CAST('-inf' AS DOUBLE))) AS mx2
        FROM r c CROSS JOIN doffs o
        LEFT JOIN r n ON n.cell_row = c.cell_row + o.dy
                     AND n.cell_col = c.cell_col + o.dx
        GROUP BY c.cell_row, c.cell_col, c.value, o.dir) pd
  GROUP BY pd.cell_row, pd.cell_col),
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
          SELECT w.src, dd.b FROM walk0 w JOIN down dd ON dd.a = w.cur),
flooded AS (SELECT w.cur, ct.crest - z.value AS dz
  FROM walk0 w
  JOIN r z ON z.cell_row * {GRID.cols} + z.cell_col = w.src
  JOIN crest ct ON ct.cell_row * {GRID.cols} + ct.cell_col = w.cur
  WHERE w.src != w.cur AND z.value < ct.crest),
met AS (SELECT cur, sum(dz) AS metric FROM flooded GROUP BY cur)
SELECT c.cell_row, c.cell_col,
       round(coalesce(m.metric, 0.0), 6) AS value,
       round(ct.crest - c.value, 6) AS dam_height
FROM r c
JOIN crest ct ON ct.cell_row = c.cell_row AND ct.cell_col = c.cell_col
LEFT JOIN met m ON m.cur = c.cell_row * {GRID.cols} + c.cell_col""".replace(
        "WITH pts", "WITH RECURSIVE pts", 1
    )


ORACLE_SQL = {
    "isobasins": _iso_sql(),
    "impoundment_index": _isi_sql(),
    "impoundment_depth": _isi_sql()
    .replace(
        "met AS (SELECT cur, sum(dz) AS metric FROM flooded GROUP BY cur)",
        "met AS (SELECT cur, max(dz) AS metric FROM flooded GROUP BY cur)",
    )
    .replace(
        """round(coalesce(m.metric, 0.0), 6) AS value,
       round(ct.crest - c.value, 6) AS dam_height""",
        "round(coalesce(m.metric, 0.0), 6) AS value",
    ),
}
