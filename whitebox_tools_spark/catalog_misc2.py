"""Query catalog: final coverage batch (KS normality, histogram
matching, flightline edges, ground filter, stream vectorization,
downslope index, normal angular deviation, multiscale composites)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import (
    GRID, _COL_SQL, _IN_GRID_SQL, _PTS_CTE, _PTS_RASTER_LAST_CTE, _ROW_SQL,
)
from whitebox_tools_spark.catalog_streams import _scaffold
from whitebox_tools_spark.catalog_terrain3 import _ASPECT_CTE
from whitebox_tools_spark.operators import hydro, misc2 as m2, trend
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.hydro import _d8_dir_stencil
from whitebox_tools_spark.sources.tables import documents

TILE_SIZE = 8
ST_THRESHOLD = 2.0
FL_RADIUS = 100.0
GP_RADIUS, GP_H = 100.0, 20.0
DSI_DROP = 5.0
WIN_R = 2
MR_RADII = (1, 2, 3)


def _z(spark, sf_dir):
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _zfirst(spark, sf_dir):
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    return rop.points_to_raster(geo, GRID, assign="first")


def _geo(spark, sf_dir):
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def _graph(spark, sf_dir):
    z = _z(spark, sf_dir)
    from whitebox_tools_spark import catalog_cache as _cc2
    accum = _cc2.accum(spark, sf_dir, TILE_SIZE)
    st = trend.extract_streams(accum, ST_THRESHOLD)
    from whitebox_tools_spark import catalog_cache as _cc3
    dirs = _cc3.dirs(spark, sf_dir, TILE_SIZE)
    return z, st, dirs


def _aliased(df, round6=False):
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


def q_ks(spark, sf_dir):
    out = m2.ks_test_normality(_z(spark, sf_dir))
    return out.select(
        "n", F.round("mean", 6).alias("mean"), F.round("sd", 6).alias("sd"),
        F.round("d_stat", 6).alias("d_stat"),
    )


def q_histmatch(spark, sf_dir):
    return _aliased(m2.histogram_matching(_zfirst(spark, sf_dir), _z(spark, sf_dir)))


def q_flightline_edges(spark, sf_dir):
    return m2.find_flightline_edge_points(_geo(spark, sf_dir), FL_RADIUS).select(
        "doc_id", "edge"
    )


def q_ground_filter(spark, sf_dir):
    return m2.lidar_ground_point_filter(_geo(spark, sf_dir), GP_RADIUS, GP_H).select(
        "doc_id", "cls_out"
    )


def q_streams_to_vector(spark, sf_dir):
    z, st, dirs = _graph(spark, sf_dir)
    return m2.raster_streams_to_vector(st, dirs, z, GRID).select(
        "link", "vertex", "x", "y"
    )


def q_downslope_index(spark, sf_dir):
    return _aliased(
        m2.downslope_index(_z(spark, sf_dir), GRID, DSI_DROP, tile_size=TILE_SIZE),
        round6=True,
    )


def q_anvad(spark, sf_dir):
    return _aliased(
        m2.average_normal_vector_angular_deviation(
            _z(spark, sf_dir), GRID, WIN_R, WIN_R, TILE_SIZE),
        round6=True,
    )


def q_mtpi(spark, sf_dir):
    from whitebox_tools_spark.operators.color import create_colour_composite
    from whitebox_tools_spark.operators.terrain import dev_from_mean_elev

    z = _z(spark, sf_dir)
    devs = []
    for r in MR_RADII:
        d = dev_from_mean_elev(z, GRID, rx=r, ry=r, tile_size=TILE_SIZE)
        devs.append(d.select("row", "col", F.round("value", 6).alias("value")))
    out = create_colour_composite(devs[2], devs[1], devs[0])
    return _aliased(out)


def q_multiscale_roughness(spark, sf_dir):
    out = m2.multiscale_roughness(_z(spark, sf_dir), GRID, MR_RADII, TILE_SIZE)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"), "scale",
    )


QUERIES = {
    "ks_normality": q_ks,
    "histogram_matching": q_histmatch,
    "flightline_edge_points": q_flightline_edges,
    "lidar_ground_filter": q_ground_filter,
    "raster_streams_to_vector": q_streams_to_vector,
    "downslope_index": q_downslope_index,
    "avg_normal_angular_deviation": q_anvad,
    "multiscale_topographic_position": q_mtpi,
    "multiscale_roughness": q_multiscale_roughness,
}


# ------------------------------------------------------------- oracle SQL

_A1, _A2, _A3, _A4, _A5 = m2._ERF_A
_P = m2._ERF_P
_SQRT2 = math.sqrt(2.0)


def _phi_sql(x: str) -> str:
    z = f"(({x}) / {_SQRT2!r})"
    t = f"(1.0 / (1.0 + {_P!r} * abs({z})))"
    poly = f"(((({_A5!r} * {t} + {_A4!r}) * {t}) + {_A3!r}) * {t} + {_A2!r}) * {t} + {_A1!r}"
    erf = f"(1.0 - ({poly}) * {t} * exp(-abs({z}) * abs({z})))"
    return f"(0.5 * (1.0 + (CASE WHEN {z} < 0.0 THEN -1.0 ELSE 1.0 END) * {erf}))"


ORACLE_SQL = {
    "ks_normality": f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
st2 AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(value) AS s,
               sum(value * value) AS ss FROM r),
mo AS (SELECT n, s / n AS mu, sqrt((ss - s * s / n) / (n - 1.0)) AS sd FROM st2),
pv AS (SELECT value, count(*) AS cnt FROM r GROUP BY value),
cdf AS (SELECT value, CAST(sum(cnt) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS c
        FROM pv)
SELECT mo.n, round(mo.mu, 6) AS mean, round(mo.sd, 6) AS sd,
       round(max(abs(cdf.c / mo.n - {_phi_sql('(cdf.value - mo.mu) / mo.sd')})), 6) AS d_stat
FROM cdf CROSS JOIN mo GROUP BY mo.n, mo.mu, mo.sd""",
    "histogram_matching": f"""WITH {_PTS_CTE},
rl AS MATERIALIZED (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_max(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
rf AS MATERIALIZED (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col, arg_min(z, doc_id) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
ni AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM rf),
nr AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM rl),
ci AS (SELECT value, CAST(sum(cnt) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / (SELECT n FROM ni) AS p
       FROM (SELECT value, count(*) AS cnt FROM rf GROUP BY value) t),
cr AS (SELECT value AS rv, CAST(sum(cnt) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / (SELECT n FROM nr) AS rp
       FROM (SELECT value, count(*) AS cnt FROM rl GROUP BY value) t),
mt AS (SELECT ci.value, min(cr.rv) AS outv
       FROM ci JOIN cr ON cr.rp >= ci.p GROUP BY ci.value)
SELECT rf.cell_row, rf.cell_col, mt.outv AS value
FROM rf JOIN mt ON mt.value = rf.value""",
    "flightline_edge_points": f"""WITH {_PTS_CTE},
fl AS (SELECT doc_id, x, y,
              ((doc_id * 2654435761 + 1013904223) % 4294967296) % 4 AS psid
       FROM pts),
pr AS (SELECT a.doc_id FROM fl a JOIN fl b
       ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {FL_RADIUS * FL_RADIUS!r}
      AND a.psid <> b.psid)
SELECT f.doc_id,
       CASE WHEN f.doc_id IN (SELECT doc_id FROM pr) THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS edge
FROM fl f""",
    "lidar_ground_filter": f"""WITH {_PTS_CTE},
mn AS (SELECT a.doc_id, a.z, min(b.z) AS mz
       FROM pts a JOIN pts b
         ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {GP_RADIUS * GP_RADIUS!r}
       GROUP BY a.doc_id, a.z)
SELECT doc_id,
       CASE WHEN z - mz > {GP_H!r} THEN CAST(1.0 AS DOUBLE) ELSE CAST(2.0 AS DOUBLE) END AS cls_out
FROM mn""",
    "raster_streams_to_vector": _scaffold(f"""
intra AS (SELECT e.a, e.b FROM sedges e JOIN inflow i ON i.b = e.b WHERE i.n_in = 1),
sym AS (SELECT a, b FROM intra UNION ALL SELECT b, a FROM intra),
cc AS (SELECT id AS node, id AS lbl FROM snodes
       UNION
       SELECT s.b, cc.lbl FROM cc JOIN sym s ON s.a = cc.node),
comp AS MATERIALIZED (SELECT node, min(lbl) AS comp FROM cc GROUP BY node),
ranked AS (SELECT comp, row_number() OVER (ORDER BY comp) AS link
           FROM (SELECT DISTINCT comp FROM comp)),
ow AS (SELECT id AS src, id AS cur, CAST(0.0 AS DOUBLE) AS d FROM snodes
       UNION ALL
       SELECT w.src, e.b, w.d + e.len FROM ow w JOIN sedges e ON e.a = w.cur),
dist AS (SELECT src, d FROM ow WHERE cur NOT IN (SELECT a FROM sedges)),
cells AS (SELECT rk.link, n.cell_row, n.cell_col, dist.d
          FROM snodes n JOIN comp c ON c.node = n.id
          JOIN ranked rk ON rk.comp = c.comp
          JOIN dist ON dist.src = n.id)
SELECT link,
       row_number() OVER (PARTITION BY link ORDER BY d DESC, cell_row, cell_col) AS vertex,
       ({GRID.west!r} + (CAST(cell_col AS DOUBLE) + 0.5) * {GRID.res_x!r}) AS x,
       ({GRID.north!r} - (CAST(cell_row AS DOUBLE) + 0.5) * {GRID.res_y!r}) AS y
FROM cells"""),
    "downslope_index": None,  # filled below
    "avg_normal_angular_deviation": f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_ASPECT_CTE},
nrm AS MATERIALIZED (SELECT cell_row, cell_col,
      -fx / sqrt(fx * fx + fy * fy + 1.0) AS nx,
      -fy / sqrt(fx * fx + fy * fy + 1.0) AS ny,
      1.0 / sqrt(fx * fx + fy * fy + 1.0) AS nz
      FROM drv),
offs AS (SELECT a.i - {WIN_R} AS dr, b.i - {WIN_R} AS dc
         FROM range(0, {2 * WIN_R + 1}) a(i), range(0, {2 * WIN_R + 1}) b(i)),
mean_n AS MATERIALIZED (SELECT c.cell_row, c.cell_col,
        sum(m.nx) AS sx, sum(m.ny) AS sy, sum(m.nz) AS sz, count(*) AS n
        FROM r c CROSS JOIN offs o
        JOIN nrm m ON m.cell_row = c.cell_row + o.dr AND m.cell_col = c.cell_col + o.dc
        GROUP BY c.cell_row, c.cell_col),
bar AS (SELECT cell_row, cell_col, n,
        sx / sqrt(sx * sx + sy * sy + sz * sz) AS bx,
        sy / sqrt(sx * sx + sy * sy + sz * sz) AS by,
        sz / sqrt(sx * sx + sy * sy + sz * sz) AS bz
        FROM mean_n),
dev AS (SELECT b.cell_row, b.cell_col,
        sum(degrees(acos(least(greatest(m.nx * b.bx + m.ny * b.by + m.nz * b.bz, -1.0), 1.0))))
          / any_value(b.n) AS value
        FROM bar b CROSS JOIN offs o
        JOIN nrm m ON m.cell_row = b.cell_row + o.dr AND m.cell_col = b.cell_col + o.dc
        GROUP BY b.cell_row, b.cell_col)
SELECT cell_row, cell_col, round(value, 6) AS value FROM dev""",
    "multiscale_topographic_position": None,  # filled below
    "multiscale_roughness": None,  # filled below
}


def _dev_cte(r: int, name: str) -> str:
    return f"""{name} AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col,
         round(CASE WHEN (ss - (s * s) / n) / n > 0.0
              THEN (z - s / n) / sqrt((ss - (s * s) / n) / n) ELSE 0.0 END, 6) AS value
  FROM (SELECT c.cell_row, c.cell_col, any_value(c.value) AS z,
               count(*) AS n, sum(nb.value) AS s, sum(nb.value * nb.value) AS ss
        FROM r c CROSS JOIN (SELECT a.i - {r} AS dr, b.i - {r} AS dc
                             FROM range(0, {2*r+1}) a(i), range(0, {2*r+1}) b(i)) o
        JOIN r nb ON nb.cell_row = c.cell_row + o.dr AND nb.cell_col = c.cell_col + o.dc
        GROUP BY c.cell_row, c.cell_col) c)"""


def _mtpi_sql() -> str:
    byte = lambda c: f"least(greatest(floor({c} * 255.0 + 0.5), 0.0), 255.0)"
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_dev_cte(MR_RADII[0], 'd1')},
{_dev_cte(MR_RADII[1], 'd2')},
{_dev_cte(MR_RADII[2], 'd3')},
jj AS (SELECT d3.cell_row, d3.cell_col,
              d3.value AS rr, d2.value AS gg, d1.value AS bb
       FROM d3 JOIN d2 ON d2.cell_row = d3.cell_row AND d2.cell_col = d3.cell_col
       JOIN d1 ON d1.cell_row = d3.cell_row AND d1.cell_col = d3.cell_col),
st3 AS (SELECT min(rr) AS r_mn, max(rr) AS r_mx, min(gg) AS g_mn, max(gg) AS g_mx,
               min(bb) AS b_mn, max(bb) AS b_mx FROM jj),
nb2 AS (SELECT jj.cell_row, jj.cell_col,
               (jj.rr - st3.r_mn) / (st3.r_mx - st3.r_mn) AS r,
               (jj.gg - st3.g_mn) / (st3.g_mx - st3.g_mn) AS g,
               (jj.bb - st3.b_mn) / (st3.b_mx - st3.b_mn) AS b
        FROM jj CROSS JOIN st3)
SELECT cell_row, cell_col,
       255.0 * 16777216.0 + {byte('b')} * 65536.0 + {byte('g')} * 256.0 + {byte('r')} AS value
FROM nb2"""


def _sphere_cte(rad: int, name: str) -> str:
    return f"""{name} AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col,
         degrees(sqrt(-2.0 * ln(sqrt(sx * sx + sy * sy + sz * sz) / n))) AS value
  FROM (SELECT c.cell_row, c.cell_col,
               sum(m.nx) AS sx, sum(m.ny) AS sy, sum(m.nz) AS sz, count(*) AS n
        FROM r c CROSS JOIN (SELECT a.i - {rad} AS dr, b.i - {rad} AS dc
                             FROM range(0, {2*rad+1}) a(i), range(0, {2*rad+1}) b(i)) o
        JOIN nrm m ON m.cell_row = c.cell_row + o.dr AND m.cell_col = c.cell_col + o.dc
        GROUP BY c.cell_row, c.cell_col) c)"""


def _mr_sql() -> str:
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_ASPECT_CTE},
nrm AS MATERIALIZED (SELECT cell_row, cell_col,
      -fx / sqrt(fx * fx + fy * fy + 1.0) AS nx,
      -fy / sqrt(fx * fx + fy * fy + 1.0) AS ny,
      1.0 / sqrt(fx * fx + fy * fy + 1.0) AS nz
      FROM drv),
{_sphere_cte(MR_RADII[0], 's1')},
{_sphere_cte(MR_RADII[1], 's2')},
{_sphere_cte(MR_RADII[2], 's3')},
u AS (SELECT cell_row, cell_col, value, {MR_RADII[0]} AS scale FROM s1
      UNION ALL SELECT cell_row, cell_col, value, {MR_RADII[1]} FROM s2
      UNION ALL SELECT cell_row, cell_col, value, {MR_RADII[2]} FROM s3)
SELECT cell_row, cell_col, round(value, 6) AS value, CAST(scale AS DOUBLE) AS scale
FROM u
QUALIFY row_number() OVER (PARTITION BY cell_row, cell_col
                           ORDER BY value DESC, scale ASC) = 1"""


def _dsi_sql() -> str:
    return _scaffold(f"""
zmap AS (SELECT cell_row * {GRID.cols} + cell_col AS id, value AS z FROM r),
sw AS (SELECT n.id AS src, n.id AS cur, CAST(0.0 AS DOUBLE) AS d, z.z AS z0
       FROM nodes n JOIN zmap z ON z.id = n.id
       UNION ALL
       SELECT w.src, e.b, w.d + e.len, w.z0
       FROM sw w JOIN down e ON e.a = w.cur
       JOIN zmap zc ON zc.id = w.cur
       WHERE w.z0 - zc.z < {DSI_DROP!r}),
reach AS (SELECT w.src, min(w.d) AS dist
          FROM sw w JOIN zmap zc ON zc.id = w.cur
          WHERE w.z0 - zc.z >= {DSI_DROP!r}
          GROUP BY w.src)
SELECT n.cell_row, n.cell_col,
       round(degrees(atan({DSI_DROP!r} / x.dist)), 6) AS value
FROM reach x JOIN nodes n ON n.id = x.src""")


ORACLE_SQL["downslope_index"] = _dsi_sql()
ORACLE_SQL["multiscale_topographic_position"] = _mtpi_sql()
ORACLE_SQL["multiscale_roughness"] = _mr_sql()
