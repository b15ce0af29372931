"""Query catalog: stream-network batch 2 (link class/slopes, Horton /
Hack orders, tributaries, main stem, valleys, rasterization, profile)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE, _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.catalog_streams import _GRAPH_CTES, _scaffold, ST_THRESHOLD
from whitebox_tools_spark.operators import hydro, streams2 as s2, trend
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.hydro import _d8_dir_stencil
from whitebox_tools_spark.sources import vectors
from whitebox_tools_spark.sources.tables import documents
from whitebox_tools_spark.localrel import local_df

TILE_SIZE = 8
LQ_R = 2
LQ_T = 25.0


def _z(spark, sf_dir):
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _graph(spark, sf_dir):
    z = _z(spark, sf_dir)
    from whitebox_tools_spark import catalog_cache as _cc2
    accum = _cc2.accum(spark, sf_dir, TILE_SIZE)
    st = trend.extract_streams(accum, ST_THRESHOLD)
    from whitebox_tools_spark import catalog_cache as _cc3
    dirs = _cc3.dirs(spark, sf_dir, TILE_SIZE)
    return z, st, dirs


def _aliased(df: DataFrame, round6: bool = False) -> DataFrame:
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


def _q(op, round6=False, with_z=False):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        z, st, dirs = _graph(spark, sf_dir)
        out = op(st, dirs, z, GRID) if with_z else op(st, dirs, GRID)
        return _aliased(out, round6=round6)

    return q


def q_extract_valleys(spark, sf_dir):
    return _aliased(s2.extract_valleys_lq(_z(spark, sf_dir), GRID, LQ_R, LQ_R, LQ_T, TILE_SIZE))


def q_rasterize_streams(spark, sf_dir):
    segs = local_df(spark, vectors.line_layer_rows(vectors.LINE_SPECS_1))
    return _aliased(s2.rasterize_streams(segs, GRID))


def q_long_profile(spark, sf_dir):
    z, st, dirs = _graph(spark, sf_dir)
    return s2.long_profile(st, dirs, z, GRID).select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("dist", 6).alias("dist"), "z",
    )


QUERIES = {
    "stream_link_class": _q(s2.stream_link_class),
    "stream_slope_continuous": _q(s2.stream_slope_continuous, round6=True, with_z=True),
    "stream_link_slope": _q(s2.stream_link_slope, round6=True, with_z=True),
    "hack_order": _q(s2.hack_order),
    "horton_order": _q(s2.horton_order),
    "tributary_id": _q(s2.tributary_id),
    "find_main_stem": _q(s2.find_main_stem),
    "extract_valleys": q_extract_valleys,
    "rasterize_streams": q_rasterize_streams,
    "long_profile": q_long_profile,
}


# ------------------------------------------------------------- oracle SQL

_CC_LINKS = """intra AS (SELECT e.a, e.b FROM sedges e JOIN inflow i ON i.b = e.b WHERE i.n_in = 1),
sym AS (SELECT a, b FROM intra UNION ALL SELECT b, a FROM intra),
cc AS (SELECT id AS node, id AS lbl FROM snodes
       UNION
       SELECT s.b, cc.lbl FROM cc JOIN sym s ON s.a = cc.node),
comp AS MATERIALIZED (SELECT node, min(lbl) AS comp FROM cc GROUP BY node)"""

_FH_MAIN = """hw AS (SELECT id AS cur, CAST(0.0 AS DOUBLE) AS d FROM heads
      UNION ALL
      SELECT e.b, w.d + e.len FROM hw w JOIN sedges e ON e.a = w.cur),
fh AS MATERIALIZED (SELECT s.id, coalesce(m.fh, 0.0) AS fh FROM snodes s
      LEFT JOIN (SELECT cur AS id, max(d) AS fh FROM hw GROUP BY cur) m ON m.id = s.id),
mflag AS MATERIALIZED (
  SELECT e.a, e.b, e.len,
         row_number() OVER (PARTITION BY e.b ORDER BY f.fh + e.len DESC, e.a ASC) = 1 AS is_main
  FROM sedges e JOIN fh f ON f.id = e.a)"""

ORACLE_SQL = {
    "stream_link_class": _scaffold(f"""
{_CC_LINKS},
extl AS (SELECT DISTINCT c.comp FROM comp c JOIN heads h ON h.id = c.node),
outlets AS (SELECT id FROM snodes WHERE id NOT IN (SELECT a FROM sedges)),
junctions AS (SELECT b AS id FROM inflow WHERE n_in >= 2)
SELECT s.cell_row, s.cell_col,
  CAST(CASE WHEN s.id IN (SELECT id FROM heads) THEN 3
            WHEN s.id IN (SELECT id FROM outlets) THEN 5
            WHEN s.id IN (SELECT id FROM junctions) THEN 4
            WHEN c.comp IN (SELECT comp FROM extl) THEN 1
            ELSE 2 END AS DOUBLE) AS value
FROM snodes s JOIN comp c ON c.node = s.id"""),
    "stream_slope_continuous": _scaffold(f"""
zmap AS (SELECT cell_row * {GRID.cols} + cell_col AS id, value AS z FROM r),
slc AS (SELECT e.a AS id, degrees(atan((za.z - zb.z) / e.len)) AS v
       FROM sedges e JOIN zmap za ON za.id = e.a JOIN zmap zb ON zb.id = e.b)
SELECT s.cell_row, s.cell_col, round(coalesce(slc.v, 0.0), 6) AS value
FROM snodes s LEFT JOIN slc ON slc.id = s.id"""),
    "stream_link_slope": _scaffold(f"""
{_CC_LINKS},
zmap AS (SELECT cell_row * {GRID.cols} + cell_col AS id, value AS z FROM r),
slc AS (SELECT e.a, degrees(atan((za.z - zb.z) / e.len)) AS v
       FROM sedges e JOIN zmap za ON za.id = e.a JOIN zmap zb ON zb.id = e.b),
per AS (SELECT c.comp, sum(slc.v) / count(*) AS lslope
        FROM slc JOIN comp c ON c.node = slc.a GROUP BY c.comp)
SELECT s.cell_row, s.cell_col, round(coalesce(per.lslope, 0.0), 6) AS value
FROM snodes s JOIN comp c ON c.node = s.id
LEFT JOIN per ON per.comp = c.comp"""),
    "hack_order": _scaffold(f"""
{_FH_MAIN},
stepf AS (SELECT m.a, m.b,
          CASE WHEN i.n_in >= 2 AND NOT m.is_main THEN 1 ELSE 0 END AS inc
          FROM mflag m JOIN inflow i ON i.b = m.b),
wk AS (SELECT id AS src, id AS cur, 1 AS h FROM snodes
       UNION ALL
       SELECT w.src, s.b, w.h + s.inc FROM wk w JOIN stepf s ON s.a = w.cur)
SELECT n.cell_row, n.cell_col, CAST(w.h AS DOUBLE) AS value
FROM wk w JOIN snodes n ON n.id = w.src
WHERE w.cur NOT IN (SELECT a FROM sedges)"""),
    "horton_order": None,  # filled below (needs unrolled strahler)
    "tributary_id": _scaffold(f"""
{_FH_MAIN},
upw AS (SELECT id AS src, id AS cur FROM snodes
        UNION ALL
        SELECT w.src, m.a FROM upw w JOIN mflag m ON m.b = w.cur AND m.is_main),
headof AS (SELECT src, cur AS head FROM upw
           WHERE cur NOT IN (SELECT b FROM mflag WHERE is_main)),
ranked AS (SELECT head, row_number() OVER (ORDER BY head) AS tid
           FROM (SELECT DISTINCT head FROM headof))
SELECT n.cell_row, n.cell_col, CAST(rk.tid AS DOUBLE) AS value
FROM headof h JOIN snodes n ON n.id = h.src JOIN ranked rk ON rk.head = h.head"""),
    "find_main_stem": _scaffold(f"""
{_FH_MAIN},
wk AS (SELECT id AS src, id AS cur, 1 AS ok FROM snodes
       UNION ALL
       SELECT w.src, m.b,
              CASE WHEN w.ok = 1 AND m.is_main THEN 1 ELSE 0 END
       FROM wk w JOIN mflag m ON m.a = w.cur)
SELECT n.cell_row, n.cell_col, CAST(w.ok AS DOUBLE) AS value
FROM wk w JOIN snodes n ON n.id = w.src
WHERE w.cur NOT IN (SELECT a FROM sedges)"""),
    "extract_valleys": f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT a.i - {LQ_R} AS dr, b.i - {LQ_R} AS dc
         FROM range(0, {2 * LQ_R + 1}) a(i), range(0, {2 * LQ_R + 1}) b(i)),
w AS (SELECT c.cell_row, c.cell_col,
             CAST(sum(CASE WHEN nb.value < c.value THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) * 100.0 AS pctl
      FROM r c CROSS JOIN offs o
      JOIN r nb ON nb.cell_row = c.cell_row + o.dr AND nb.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col)
SELECT cell_row, cell_col,
       CASE WHEN pctl <= {LQ_T!r} THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS value
FROM w""",
    "rasterize_streams": f"""WITH {vectors.line_specs_sql(vectors.LINE_SPECS_1, 'segs')},
sn AS (SELECT *, greatest(CAST(ceil(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
                               / {GRID.res_x / 2.0!r}) AS BIGINT), 1) AS n
       FROM segs),
ks AS (SELECT sn.*, g.i AS k FROM sn, range(0, 10000) g(i) WHERE g.i <= sn.n),
pt AS (SELECT x1 + (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (x2 - x1) AS x,
              y1 + (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (y2 - y1) AS y
       FROM ks),
cells AS (SELECT CAST(floor(({GRID.north!r} - y) / {GRID.res_y!r}) AS BIGINT) AS cell_row,
                 CAST(floor((x - {GRID.west!r}) / {GRID.res_x!r}) AS BIGINT) AS cell_col
          FROM pt)
SELECT DISTINCT cell_row, cell_col, CAST(1.0 AS DOUBLE) AS value
FROM cells
WHERE cell_row >= 0 AND cell_row < {GRID.rows} AND cell_col >= 0 AND cell_col < {GRID.cols}""",
    "long_profile": _scaffold(f"""
zmap AS (SELECT cell_row * {GRID.cols} + cell_col AS id, value AS z FROM r),
ow AS (SELECT id AS src, id AS cur, CAST(0.0 AS DOUBLE) AS d FROM snodes
       UNION ALL
       SELECT w.src, e.b, w.d + e.len FROM ow w JOIN sedges e ON e.a = w.cur)
SELECT n.cell_row, n.cell_col, round(w.d, 6) AS dist, z.z
FROM ow w JOIN snodes n ON n.id = w.src JOIN zmap z ON z.id = w.src
WHERE w.cur NOT IN (SELECT a FROM sedges)"""),
}


def _horton_sql() -> str:
    ST_ROUNDS = 64
    blocks = ["ord0 AS (SELECT id, 1 AS ord FROM snodes)"]
    for i in range(1, ST_ROUNDS + 1):
        blocks.append(
            f"agg{i} AS (SELECT e.b, o.ord, count(*) AS cnt FROM sedges e "
            f"JOIN ord{i-1} o ON o.id = e.a GROUP BY e.b, o.ord)"
        )
        blocks.append(
            f"m{i} AS (SELECT b, max(ord) AS mx, max_by(cnt, ord) AS cnt "
            f"FROM agg{i} GROUP BY b)"
        )
        blocks.append(
            f"ord{i} AS MATERIALIZED (SELECT s.id, coalesce(CASE WHEN m.cnt >= 2 THEN m.mx + 1 "
            f"ELSE m.mx END, 1) AS ord FROM snodes s LEFT JOIN m{i} m ON m.b = s.id)"
        )
    joined = ",\n".join(blocks)
    return _scaffold(f"""
{joined},
strah AS MATERIALIZED (SELECT id, ord FROM ord64),
mflag AS MATERIALIZED (
  SELECT e.a, e.b,
         row_number() OVER (PARTITION BY e.b ORDER BY s.ord DESC, e.a ASC) = 1 AS is_main
  FROM sedges e JOIN strah s ON s.id = e.a),
inh AS MATERIALIZED (
  SELECT m.a, m.b,
         (i.n_in = 1 OR m.is_main) AS inherit
  FROM mflag m JOIN inflow i ON i.b = m.b),
wk AS (SELECT id AS src, id AS cur, 0 AS dp FROM snodes
       UNION ALL
       SELECT w.src, h.b, w.dp + 1 FROM wk w JOIN inh h ON h.a = w.cur AND h.inherit)
SELECT n.cell_row, n.cell_col, CAST(s.ord AS DOUBLE) AS value
FROM (SELECT src, max_by(cur, dp) AS stop FROM wk GROUP BY src) q
JOIN snodes n ON n.id = q.src JOIN strah s ON s.id = q.stop""")


ORACLE_SQL["horton_order"] = _horton_sql()
