"""Query catalog: terrain batch 4 (DInf pointer, aspect/normal
dispersion, gap filling, directional rays, visibility, profile, edge
density)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_cluster import STATION_H, VIEWPOINTS, _viewshed_sql_mat
from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE, _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.catalog_terrain import _nb8
from whitebox_tools_spark.operators import terrain3 as t3
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.sources import vectors
from whitebox_tools_spark.sources.tables import documents
from whitebox_tools_spark.localrel import local_df

TILE_SIZE = 8
WIN_R = 2
FA_AZ, FA_DIST, FA_H = 315.0, 500.0, 0.05
DR_AZ, DR_DIST = 135.0, 500.0
ED_T = 5.0
PI = math.pi


def _z(spark, sf_dir):
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _aliased(df: DataFrame, round6: bool = False) -> DataFrame:
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


QUERIES = {
    "dinf_pointer": lambda s, d: _aliased(
        t3.dinf_pointer(_z(s, d), GRID, TILE_SIZE), round6=True),
    "circular_variance_aspect": lambda s, d: _aliased(
        t3.circular_variance_of_aspect(_z(s, d), GRID, WIN_R, WIN_R, TILE_SIZE), round6=True),
    "spherical_stdev_normals": lambda s, d: _aliased(
        t3.spherical_stdev_of_normals(_z(s, d), GRID, WIN_R, WIN_R, TILE_SIZE), round6=True),
    "fill_missing_data": lambda s, d: _aliased(
        t3.fill_missing_data(_z(s, d), GRID, WIN_R), round6=True),
    "fetch_analysis": lambda s, d: _aliased(
        t3.fetch_analysis(_z(s, d), GRID, FA_AZ, FA_H, FA_DIST)),
    "directional_relief": lambda s, d: _aliased(
        t3.directional_relief(_z(s, d), GRID, DR_AZ, DR_DIST), round6=True),
    "visibility_index": lambda s, d: _aliased(
        t3.visibility_index(_z(s, d), GRID, VIEWPOINTS, STATION_H), round6=True),
    "profile": lambda s, d: t3.profile(
        local_df(s, vectors.line_layer_rows(vectors.LINE_SPECS_2)),
        _z(s, d), GRID).select("seg_id", "k", F.round("dist", 6).alias("dist"), "z"),
    "edge_density": lambda s, d: _aliased(
        t3.edge_density(_z(s, d), GRID, WIN_R, WIN_R, ED_T, TILE_SIZE), round6=True),
}


# ------------------------------------------------------------- oracle SQL

_GRID_RES = (GRID.res_x + GRID.res_y) / 2.0
_DIAG = math.sqrt(GRID.res_x**2 + GRID.res_y**2)
_ATAN1 = math.atan(1.0)
_E1 = [(1, 0), (0, -1), (0, -1), (-1, 0), (-1, 0), (0, 1), (0, 1), (1, 0)]
_E2 = [(1, -1), (1, -1), (-1, -1), (-1, -1), (-1, 1), (-1, 1), (1, 1), (1, 1)]
_AC = [0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0]
_AF = [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]


def _dinf_sql() -> str:
    facets = []
    for i in range(8):
        (c1, r1), (c2, r2) = _E1[i], _E2[i]
        facets.append(
            f"SELECT c.cell_row, c.cell_col, {i} AS i, c.value AS e0, "
            f"n1.value AS e1, n2.value AS e2, {_AC[i]!r} AS ac, {_AF[i]!r} AS af "
            f"FROM r c "
            f"JOIN r n1 ON n1.cell_row = c.cell_row + ({r1}) AND n1.cell_col = c.cell_col + ({c1}) "
            f"JOIN r n2 ON n2.cell_row = c.cell_row + ({r2}) AND n2.cell_col = c.cell_col + ({c2})"
        )
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
fac AS MATERIALIZED ({' UNION ALL '.join(facets)}),
bth AS (SELECT *,
    CASE WHEN (e0 - e1) / {_GRID_RES!r} = 0.0 THEN 0.00001
         ELSE (e0 - e1) / {_GRID_RES!r} END AS s1,
    (e1 - e2) / {_GRID_RES!r} AS s2
  FROM fac WHERE e0 > e1 AND e0 > e2),
bq AS (SELECT *, atan(s2 / s1) AS r0,
    (CASE WHEN (s1 < 0.0 AND s2 < 0.0) OR (s1 < 0.0 AND s2 = 0.0)
               OR (s1 = 0.0 AND s2 < 0.0)
          THEN -sqrt(s1 * s1 + s2 * s2) ELSE sqrt(s1 * s1 + s2 * s2) END) AS sg
  FROM bth),
bfin AS (SELECT cell_row, cell_col, i, ac, af,
    CASE WHEN r0 < 0.0 THEN 0.0 WHEN r0 > {_ATAN1!r} THEN {_ATAN1!r} ELSE r0 END AS r,
    CASE WHEN r0 < 0.0 THEN s1
         WHEN r0 > {_ATAN1!r} THEN (e0 - e2) / {_DIAG!r} ELSE sg END AS s
  FROM bq),
onef AS (SELECT cell_row, cell_col, i, ac, af,
    CASE WHEN e0 > e1 THEN 0.0 ELSE {_ATAN1!r} END AS r,
    CASE WHEN e0 > e1 THEN (e0 - e1) / {_GRID_RES!r} ELSE (e0 - e2) / {_DIAG!r} END AS s
  FROM fac WHERE NOT (e0 > e1 AND e0 > e2) AND (e0 > e1 OR e0 > e2)),
cand AS (SELECT * FROM bfin UNION ALL SELECT * FROM onef),
win AS (SELECT cell_row, cell_col, s, af * r + ac * ({PI!r} / 2.0) AS dir
        FROM cand WHERE s <> 0.00001
        QUALIFY row_number() OVER (PARTITION BY cell_row, cell_col
                                   ORDER BY s DESC, i DESC) = 1)
SELECT c.cell_row, c.cell_col,
  round(CASE WHEN w.s > 0.0 THEN
    CASE WHEN 360.0 - degrees(w.dir) + 90.0 > 360.0
         THEN 360.0 - degrees(w.dir) + 90.0 - 360.0
         ELSE 360.0 - degrees(w.dir) + 90.0 END
  ELSE -1.0 END, 6) AS value
FROM r c LEFT JOIN win w ON w.cell_row = c.cell_row AND w.cell_col = c.cell_col"""


_E8 = GRID.res_x * 8.0

_ASPECT_CTE = f"""{_nb8(coalesce=True)},
drv AS MATERIALIZED (SELECT cell_row, cell_col,
      (n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {_E8!r} AS fx,
      (n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {_E8!r} AS fy
      FROM nb)"""

_OFFS = f"""offs AS (SELECT a.i - {WIN_R} AS dr, b.i - {WIN_R} AS dc
         FROM range(0, {2 * WIN_R + 1}) a(i), range(0, {2 * WIN_R + 1}) b(i))"""

ORACLE_SQL = {
    "dinf_pointer": _dinf_sql(),
    "circular_variance_aspect": f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_ASPECT_CTE},
asp AS MATERIALIZED (SELECT cell_row, cell_col,
      radians(180.0 - degrees(atan(fy / fx))
              + 90.0 * (CASE WHEN fx > 0 THEN 1.0 ELSE -1.0 END)) AS theta
      FROM drv WHERE fx <> 0.0),
{_OFFS},
w AS (SELECT c.cell_row, c.cell_col,
             sum(cos(a.theta)) AS sc, sum(sin(a.theta)) AS ss, count(a.theta) AS n
      FROM r c CROSS JOIN offs o
      LEFT JOIN asp a ON a.cell_row = c.cell_row + o.dr AND a.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col)
SELECT cell_row, cell_col,
       round(CASE WHEN n > 0 THEN 1.0 - sqrt(sc * sc + ss * ss) / n ELSE 0.0 END, 6) AS value
FROM w""",
    "spherical_stdev_normals": f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_ASPECT_CTE},
nrm AS MATERIALIZED (SELECT cell_row, cell_col,
      -fx / sqrt(fx * fx + fy * fy + 1.0) AS nx,
      -fy / sqrt(fx * fx + fy * fy + 1.0) AS ny,
      1.0 / sqrt(fx * fx + fy * fy + 1.0) AS nz
      FROM drv),
{_OFFS},
w AS (SELECT c.cell_row, c.cell_col,
             sum(m.nx) AS sx, sum(m.ny) AS sy, sum(m.nz) AS sz, count(*) AS n
      FROM r c CROSS JOIN offs o
      JOIN nrm m ON m.cell_row = c.cell_row + o.dr AND m.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col)
SELECT cell_row, cell_col,
       round(degrees(sqrt(-2.0 * ln(sqrt(sx * sx + sy * sy + sz * sz) / n))), 6) AS value
FROM w""",
    "fill_missing_data": f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
cells AS (SELECT CAST(i // {GRID.cols} AS BIGINT) AS cell_row,
                 CAST(i % {GRID.cols} AS BIGINT) AS cell_col
          FROM range(0, {GRID.rows * GRID.cols}) g(i)),
miss AS (SELECT c.* FROM cells c LEFT JOIN r ON r.cell_row = c.cell_row AND r.cell_col = c.cell_col
         WHERE r.cell_row IS NULL),
offs AS (SELECT a.i - {WIN_R} AS dr, b.i - {WIN_R} AS dc
         FROM range(0, {2 * WIN_R + 1}) a(i), range(0, {2 * WIN_R + 1}) b(i)
         WHERE NOT (a.i = {WIN_R} AND b.i = {WIN_R})),
fill AS (SELECT m.cell_row, m.cell_col,
       sum((1.0 / pow(sqrt((o.dr * {GRID.res_y!r}) * (o.dr * {GRID.res_y!r})
                           + (o.dc * {GRID.res_x!r}) * (o.dc * {GRID.res_x!r})), 2.0)) * n.value)
         / sum(1.0 / pow(sqrt((o.dr * {GRID.res_y!r}) * (o.dr * {GRID.res_y!r})
                              + (o.dc * {GRID.res_x!r}) * (o.dc * {GRID.res_x!r})), 2.0)) AS value
       FROM miss m CROSS JOIN offs o
       JOIN r n ON n.cell_row = m.cell_row + o.dr AND n.cell_col = m.cell_col + o.dc
       GROUP BY m.cell_row, m.cell_col)
SELECT cell_row, cell_col, round(value, 6) AS value FROM r
UNION ALL
SELECT cell_row, cell_col, round(value, 6) AS value FROM fill""",
    "fetch_analysis": None,
    "directional_relief": None,
    "visibility_index": f"""SELECT cell_row, cell_col,
       round(sum(value) / {float(len(VIEWPOINTS))!r}, 6) AS value
FROM ({_viewshed_sql_mat()}) v
GROUP BY cell_row, cell_col""",
    "profile": f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{vectors.line_specs_sql(vectors.LINE_SPECS_2, 'segs')},
sn AS (SELECT *, greatest(CAST(ceil(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
                               / {GRID.res_x / 2.0!r}) AS BIGINT), 1) AS n
       FROM segs),
ks AS (SELECT sn.*, g.i AS k FROM sn, range(0, 10000) g(i) WHERE g.i <= sn.n),
pt AS (SELECT seg_id, k,
              (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                * sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS dist,
              CAST(floor(({GRID.north!r} - (y1 + (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (y2 - y1))) / {GRID.res_y!r}) AS BIGINT) AS cell_row,
              CAST(floor(((x1 + (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (x2 - x1)) - {GRID.west!r}) / {GRID.res_x!r}) AS BIGINT) AS cell_col
       FROM ks)
SELECT pt.seg_id, pt.k, round(pt.dist, 6) AS dist, r.value AS z
FROM pt JOIN r ON r.cell_row = pt.cell_row AND r.cell_col = pt.cell_col""",
    "edge_density": f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
o8 AS (SELECT a.i - 1 AS dr, b.i - 1 AS dc FROM range(0, 3) a(i), range(0, 3) b(i)
       WHERE NOT (a.i = 1 AND b.i = 1)),
eg AS MATERIALIZED (SELECT c.cell_row, c.cell_col,
      CASE WHEN count(*) FILTER (abs(n.value - c.value) > {ED_T!r}) > 0
           THEN 1.0 ELSE 0.0 END AS e
      FROM r c CROSS JOIN o8 o
      LEFT JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col),
{_OFFS},
w AS (SELECT c.cell_row, c.cell_col, sum(g.e) AS se, count(*) AS n
      FROM r c CROSS JOIN offs o
      JOIN eg g ON g.cell_row = c.cell_row + o.dr AND g.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col)
SELECT cell_row, cell_col, round(se / n, 6) AS value FROM w""",
}


def _ray_sql(az: float, max_dist: float, select: str) -> str:
    azr = math.radians(az)
    ddr = -math.cos(azr)
    ddc = math.sin(azr)
    k_max = int(max_dist / GRID.res_x)
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
ks AS (SELECT CAST(i AS BIGINT) AS k FROM range(1, {k_max + 1}) x(i)),
smp AS (SELECT c.cell_row AS r0, c.cell_col AS c0, c.value, ks.k,
               CAST(floor(c.cell_row + CAST(ks.k AS DOUBLE) * {ddr!r} + 0.5) AS BIGINT) AS sr,
               CAST(floor(c.cell_col + CAST(ks.k AS DOUBLE) * {ddc!r} + 0.5) AS BIGINT) AS sc
        FROM r c CROSS JOIN ks),
j AS (SELECT s.r0, s.c0, s.value, s.k, n.value AS zs
      FROM smp s JOIN r n ON n.cell_row = s.sr AND n.cell_col = s.sc)
{select}"""


ORACLE_SQL["fetch_analysis"] = _ray_sql(
    FA_AZ, FA_DIST,
    f"""
, blocked AS (SELECT r0, c0, min(k) AS kmin FROM j
              WHERE zs > value + CAST(k AS DOUBLE) * {GRID.res_x!r} * {FA_H!r}
              GROUP BY r0, c0)
SELECT c.cell_row, c.cell_col,
       coalesce(CAST(b.kmin AS DOUBLE) * {GRID.res_x!r}, -1.0) AS value
FROM r c LEFT JOIN blocked b ON b.r0 = c.cell_row AND b.c0 = c.cell_col""",
)

ORACLE_SQL["directional_relief"] = _ray_sql(
    DR_AZ, DR_DIST,
    """
SELECT r0 AS cell_row, c0 AS cell_col,
       round(sum(zs) / count(*) - any_value(value), 6) AS value
FROM j GROUP BY r0, c0""",
)
