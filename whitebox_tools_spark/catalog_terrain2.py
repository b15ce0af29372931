"""Query catalog: terrain/hydro quick-wins batch 3."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE, _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.catalog_iter import _Z_CTE, _d8_dir_sql
from whitebox_tools_spark.catalog_terrain import _nb8
from whitebox_tools_spark.operators import hydro, terrain2 as t2, trend
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators.focal import focal_apply
from whitebox_tools_spark.operators.hydro import _d8_dir_stencil
from whitebox_tools_spark.sources.tables import documents

TILE_SIZE = 8
ST_THRESHOLD = 2.0
MED_RADII = (1, 2, 3)
HA_AZ, HA_DIST = 315.0, 500.0
HYP_BINS = 20


def _z(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _dirs_streams(spark, sf_dir):
    z = _z(spark, sf_dir)
    from whitebox_tools_spark import catalog_cache as _cc2
    accum = _cc2.accum(spark, sf_dir, TILE_SIZE)
    st = trend.extract_streams(accum, ST_THRESHOLD)
    from whitebox_tools_spark import catalog_cache as _cc3
    dirs = _cc3.dirs(spark, sf_dir, TILE_SIZE)
    return dirs, st


def _aliased(df: DataFrame, round6: bool = False) -> DataFrame:
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


def q_parallel_flow(spark, sf_dir):
    dirs, st = _dirs_streams(spark, sf_dir)
    return _aliased(t2.find_parallel_flow(dirs, st, GRID))


def q_max_elev_dev(spark, sf_dir):
    out = t2.max_elevation_deviation(_z(spark, sf_dir), GRID, MED_RADII, TILE_SIZE)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"), "scale",
    )


QUERIES = {
    "pennock_landform": lambda s, d: _aliased(
        t2.pennock_landform_class(_z(s, d), GRID, tile_size=TILE_SIZE)),
    "breach_single_cell_pits": lambda s, d: _aliased(
        t2.breach_single_cell_pits(_z(s, d), GRID)),
    "find_parallel_flow": q_parallel_flow,
    "rho8_pointer": lambda s, d: _aliased(
        t2.rho8_pointer(_z(s, d), GRID, tile_size=TILE_SIZE)),
    "elev_above_pit": lambda s, d: _aliased(
        t2.elev_above_pit(_z(s, d), GRID, tile_size=TILE_SIZE), round6=True),
    "max_elevation_deviation": q_max_elev_dev,
    "hypsometric_analysis": lambda s, d: t2.hypsometric_analysis(
        _z(s, d), HYP_BINS).select("bin", "t", F.round("area_prop", 6).alias("area_prop")),
    "slope_vs_elevation": lambda s, d: t2.slope_vs_elevation_plot(
        _z(s, d), GRID, HYP_BINS, TILE_SIZE).select(
            "bin", F.round("mean_slope", 6).alias("mean_slope"), "n_cells"),
    "average_upslope_flowpath": lambda s, d: _aliased(
        t2.average_upslope_flowpath_length(_z(s, d), GRID, tile_size=TILE_SIZE),
        round6=True),
    "horizon_angle": lambda s, d: _aliased(
        t2.horizon_angle(_z(s, d), GRID, HA_AZ, HA_DIST, TILE_SIZE), round6=True),
}


# ------------------------------------------------------------- oracle SQL

_CS2 = GRID.res_x * 2.0
_CSS = GRID.res_x * GRID.res_x
_CSS4 = _CSS * 4.0
_E8 = GRID.res_x * 8.0
_DYS = ",".join(str(v) for v in hydro.D8_DY)
_DXS = ",".join(str(v) for v in hydro.D8_DX)
_DIAG = math.sqrt(GRID.res_x**2 + GRID.res_y**2)
_LEN_ARR = "[" + ",".join(
    repr(v) for v in [_DIAG, GRID.res_x, _DIAG, GRID.res_y, _DIAG, GRID.res_x, _DIAG, GRID.res_y]
) + "]"


def _pennock_sql() -> str:
    st, pt, lt = 3.0, 0.1, 0.0
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_nb8(coalesce=True)},
d AS (SELECT cell_row, cell_col,
        (n1 - n5) / {_CS2!r} AS zx, (n7 - n3) / {_CS2!r} AS zy,
        (n1 - 2.0 * z + n5) / {_CSS!r} AS zxx,
        (n7 - 2.0 * z + n3) / {_CSS!r} AS zyy,
        (-n6 + n0 + n4 - n2) / {_CSS4!r} AS zxy,
        (n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {_E8!r} AS fy,
        (n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {_E8!r} AS fx
      FROM nb),
m AS (SELECT cell_row, cell_col,
             zx * zx + zy * zy AS p,
             degrees(atan(sqrt(fx * fx + fy * fy))) AS slope,
             -1.0 * degrees((zxx * (zy * zy) - 2.0 * zxy * zx * zy + zyy * (zx * zx))
                            / pow(zx * zx + zy * zy, 1.5)) AS plan,
             -1.0 * degrees((zxx * (zx * zx) - 2.0 * zxy * zx * zy + zyy * (zy * zy))
                            / ((zx * zx + zy * zy) * pow(zx * zx + zy * zy + 1.0, 1.5))) AS prof
      FROM d)
SELECT cell_row, cell_col,
  CAST(CASE WHEN prof < -{pt!r} AND plan <= -{lt!r} AND slope > {st!r} THEN 1.0
       WHEN prof < -{pt!r} AND plan > {lt!r} AND slope > {st!r} THEN 2.0
       WHEN prof > {pt!r} AND plan <= {lt!r} AND slope > {st!r} THEN 3.0
       WHEN prof > {pt!r} AND plan > {lt!r} AND slope > {st!r} THEN 4.0
       WHEN prof >= -{pt!r} AND prof < {pt!r} AND slope > {st!r} AND plan <= -{lt!r} THEN 5.0
       WHEN prof >= -{pt!r} AND prof < {pt!r} AND slope > {st!r} AND plan > {lt!r} THEN 6.0
       WHEN slope <= {st!r} THEN 7.0 END AS DOUBLE) AS value
FROM m WHERE p > 0.0
  AND (CASE WHEN prof < -{pt!r} AND plan <= -{lt!r} AND slope > {st!r} THEN 1
            WHEN prof < -{pt!r} AND plan > {lt!r} AND slope > {st!r} THEN 1
            WHEN prof > {pt!r} AND plan <= {lt!r} AND slope > {st!r} THEN 1
            WHEN prof > {pt!r} AND plan > {lt!r} AND slope > {st!r} THEN 1
            WHEN prof >= -{pt!r} AND prof < {pt!r} AND slope > {st!r} THEN 1
            WHEN slope <= {st!r} THEN 1 ELSE 0 END) = 1"""


_BREACH_DX2 = [2, 2, 2, 2, 2, 1, 0, -1, -2, -2, -2, -2, -2, -1, 0, 1]
_BREACH_DY2 = [-2, -1, 0, 1, 2, 2, 2, 2, 2, 1, 0, -1, -2, -2, -2, -2]
_BREACH_BC = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 0]


def _breach_sql() -> str:
    probes = ", ".join(
        f"({i}, {_BREACH_DY2[i]}, {_BREACH_DX2[i]}, "
        f"{hydro.D8_DY[_BREACH_BC[i]]}, {hydro.D8_DX[_BREACH_BC[i]]})"
        for i in range(16)
    )
    offs = ", ".join(f"({dy}, {dx})" for dx, dy in zip(hydro.D8_DX, hydro.D8_DY))
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
cells AS MATERIALIZED (SELECT cell_row, cell_col, value,
        cell_row * {GRID.cols} + cell_col AS id FROM r),
o8 AS (SELECT * FROM (VALUES {offs}) o(dr, dc)),
pit AS MATERIALIZED (
  SELECT c.id, c.cell_row, c.cell_col, c.value
  FROM cells c
  WHERE NOT EXISTS (SELECT 1 FROM o8 o JOIN cells n
        ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
        WHERE n.value < c.value)),
pv AS (SELECT * FROM (VALUES {probes}) p(i, dr2, dc2, br, bc)),
hit AS (SELECT p2.id AS pit_id, p2.value, pv.i,
               p2.cell_row + pv.br AS trow, p2.cell_col + pv.bc AS tcol,
               n.value AS z2
        FROM pit p2 CROSS JOIN pv
        JOIN cells n ON n.cell_row = p2.cell_row + pv.dr2
                    AND n.cell_col = p2.cell_col + pv.dc2
        WHERE n.value < p2.value),
winner AS (SELECT trow, tcol, (value + z2) / 2.0 AS wv FROM hit
           QUALIFY row_number() OVER (PARTITION BY trow, tcol
                                      ORDER BY pit_id DESC, i DESC) = 1)
SELECT c.cell_row, c.cell_col, coalesce(w.wv, c.value) AS value
FROM cells c LEFT JOIN winner w ON w.trow = c.cell_row AND w.tcol = c.cell_col"""


def _d8_scaffold(body: str) -> str:
    return f"""WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS MATERIALIZED (SELECT id AS a,
                (cell_row + [{_DYS}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{_DXS}][dir + 1]) AS b,
                {_LEN_ARR}[dir + 1] AS len
         FROM nodes WHERE dir >= 0),
{body}"""


def _parallel_sql() -> str:
    offs = ", ".join(
        f"({i}, {hydro.D8_DY[i]}, {hydro.D8_DX[i]})" for i in range(8)
    )
    return _d8_scaffold(f"""
walk0 AS (SELECT id AS src, id AS cur FROM nodes
          UNION ALL
          SELECT w.src, d.b FROM walk0 w JOIN down d ON d.a = w.cur),
accum AS (SELECT cur AS id, CAST(count(*) AS DOUBLE) AS value FROM walk0 GROUP BY cur),
sn AS MATERIALIZED (SELECT n.* FROM nodes n JOIN accum a ON a.id = n.id
       WHERE a.value > {ST_THRESHOLD!r}),
o8 AS (SELECT * FROM (VALUES {offs}) o(i, dr, dc)),
par AS (SELECT DISTINCT c.id FROM sn c CROSS JOIN o8 o
        JOIN sn n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
        WHERE c.dir <> o.i AND n.dir = c.dir AND n.dir <> (o.i + 4) % 8)
SELECT c.cell_row, c.cell_col,
       CASE WHEN p.id IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS value
FROM sn c LEFT JOIN par p ON p.id = c.id""")


def _rho8_sql() -> str:
    offs = ", ".join(
        f"({i}, {hydro.D8_DY[i]}, {hydro.D8_DX[i]})" for i in range(8)
    )
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
cells AS MATERIALIZED (SELECT cell_row, cell_col, value,
        cell_row * {GRID.cols} + cell_col AS id FROM r),
o8 AS (SELECT * FROM (VALUES {offs}) o(i, dr, dc)),
cand AS (SELECT c.id, c.cell_row, c.cell_col, o.i,
        (c.value - n.value) /
        (CASE WHEN o.i % 2 = 0
              THEN 2.0 - CAST(((c.id * 8 + o.i) * {t2.RHO_A} + {t2.RHO_B}) % {t2._M32} AS DOUBLE) / {float(t2._M32)!r}
              ELSE 1.0 END) AS slope
        FROM cells c CROSS JOIN o8 o
        JOIN cells n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc),
best AS (SELECT id, i, slope FROM cand WHERE slope > 0.0
         QUALIFY row_number() OVER (PARTITION BY id ORDER BY slope DESC, i ASC) = 1)
SELECT c.cell_row, c.cell_col,
       coalesce(CAST(pow(2.0, b.i) AS DOUBLE), 0.0) AS value
FROM cells c LEFT JOIN best b ON b.id = c.id"""


def _elev_above_pit_sql() -> str:
    return _d8_scaffold(f"""
wk AS (SELECT id AS src, id AS cur FROM nodes
       UNION ALL
       SELECT w.src, e.b FROM wk w JOIN down e ON e.a = w.cur),
term AS (SELECT src, cur AS t FROM wk WHERE cur NOT IN (SELECT a FROM down)),
zmap AS (SELECT cell_row * {GRID.cols} + cell_col AS id, value AS z FROM r)
SELECT n.cell_row, n.cell_col, round(zs.z - zt.z, 6) AS value
FROM term x JOIN nodes n ON n.id = x.src
JOIN zmap zs ON zs.id = x.src JOIN zmap zt ON zt.id = x.t""")


def _med_sql() -> str:
    parts = []
    for r in MED_RADII:
        parts.append(f"""(SELECT c.cell_row, c.cell_col, {r} AS scale,
       CASE WHEN (ss - (s * s) / n) / n > 0.0
            THEN (z - s / n) / sqrt((ss - (s * s) / n) / n) ELSE 0.0 END AS dev
FROM (SELECT c.cell_row, c.cell_col, any_value(c.value) AS z,
             count(*) AS n, sum(nb.value) AS s, sum(nb.value * nb.value) AS ss
      FROM r c CROSS JOIN (SELECT a.i - {r} AS dr, b.i - {r} AS dc
                           FROM range(0, {2*r+1}) a(i), range(0, {2*r+1}) b(i)) o
      JOIN r nb ON nb.cell_row = c.cell_row + o.dr AND nb.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col) c)""")
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
u AS ({' UNION ALL '.join(parts)})
SELECT cell_row, cell_col, round(dev, 6) AS value, CAST(scale AS DOUBLE) AS scale
FROM u
QUALIFY row_number() OVER (PARTITION BY cell_row, cell_col
                           ORDER BY abs(dev) DESC, scale ASC) = 1"""


_HYP_SQL = f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
g AS (SELECT min(value) AS mn, max(value) AS mx, CAST(count(*) AS DOUBLE) AS n FROM r),
rel AS (SELECT (value - g.mn) / (g.mx - g.mn) AS rel, g.n FROM r CROSS JOIN g),
ts AS (SELECT CAST(i AS BIGINT) AS bin, CAST(i AS DOUBLE) / {HYP_BINS} AS t
       FROM range(0, {HYP_BINS + 1}) x(i))
SELECT ts.bin, ts.t,
       round(sum(CASE WHEN rel.rel >= ts.t THEN 1 ELSE 0 END) / any_value(rel.n), 6) AS area_prop
FROM rel CROSS JOIN ts
GROUP BY ts.bin, ts.t"""

_SVE_SQL = f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_nb8(coalesce=True)},
slp AS (SELECT cell_row, cell_col,
              degrees(atan(sqrt(
                ((n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {_E8!r})
                  * ((n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {_E8!r})
                + ((n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {_E8!r})
                  * ((n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {_E8!r})))) AS slope
       FROM nb),
g AS (SELECT min(value) AS mn, max(value) AS mx FROM r),
j AS (SELECT least(CAST(floor((r.value - g.mn) / (g.mx - g.mn) * {HYP_BINS}) AS BIGINT),
                   {HYP_BINS - 1}) AS bin, s.slope
      FROM r JOIN slp s ON s.cell_row = r.cell_row AND s.cell_col = r.cell_col
      CROSS JOIN g)
SELECT bin, round(sum(slope) / count(*), 6) AS mean_slope,
       CAST(count(*) AS BIGINT) AS n_cells
FROM j GROUP BY bin"""


def _aufl_sql() -> str:
    return _d8_scaffold(f"""
wk AS (SELECT id AS src, id AS cur, CAST(0.0 AS DOUBLE) AS d FROM nodes
       UNION ALL
       SELECT w.src, e.b, w.d + e.len FROM wk w JOIN down e ON e.a = w.cur)
SELECT n.cell_row, n.cell_col,
       round(CASE WHEN count(*) > 1
                  THEN sum(w.d) / (count(*) - 1.0) ELSE 0.0 END, 6) AS value
FROM wk w JOIN nodes n ON n.id = w.cur
GROUP BY n.cell_row, n.cell_col""")


def _horizon_sql() -> str:
    az = math.radians(HA_AZ)
    ddr = -math.cos(az)
    ddc = math.sin(az)
    k_max = int(HA_DIST / GRID.res_x)
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
ks AS (SELECT CAST(i AS BIGINT) AS k FROM range(1, {k_max + 1}) x(i)),
smp AS (SELECT c.cell_row AS r0, c.cell_col AS c0, c.value, ks.k,
               CAST(floor(c.cell_row + CAST(ks.k AS DOUBLE) * {ddr!r} + 0.5) AS BIGINT) AS sr,
               CAST(floor(c.cell_col + CAST(ks.k AS DOUBLE) * {ddc!r} + 0.5) AS BIGINT) AS sc
        FROM r c CROSS JOIN ks),
j AS (SELECT s.r0, s.c0,
             max(degrees(atan((n.value - s.value) / (CAST(s.k AS DOUBLE) * {GRID.res_x!r})))) AS mx
      FROM smp s JOIN r n ON n.cell_row = s.sr AND n.cell_col = s.sc
      GROUP BY s.r0, s.c0)
SELECT c.cell_row, c.cell_col,
       round(coalesce(j.mx, -90.0), 6) AS value
FROM r c LEFT JOIN j ON j.r0 = c.cell_row AND j.c0 = c.cell_col"""


ORACLE_SQL = {
    "pennock_landform": _pennock_sql(),
    "breach_single_cell_pits": _breach_sql(),
    "find_parallel_flow": _parallel_sql(),
    "rho8_pointer": _rho8_sql(),
    "elev_above_pit": _elev_above_pit_sql(),
    "max_elevation_deviation": _med_sql(),
    "hypsometric_analysis": _HYP_SQL,
    "slope_vs_elevation": _SVE_SQL,
    "average_upslope_flowpath": _aufl_sql(),
    "horizon_angle": _horizon_sql(),
}
