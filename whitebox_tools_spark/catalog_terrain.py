"""Query catalog: terrain-analysis kernels (curvatures, roughness,
neighbour stats, windowed relative positions, compound wetness/power
indices) — SURVEY.md §2.6 terrain family.

All oracles are generated SQL over the shared 20x20 'last'-assignment
raster; float outputs are rounded to 6 dp on BOTH sides (accumulation
order differs between the numpy stencils and SQL aggregates only in the
last ulp). Integer-valued outputs (counts, ridge flags) compare raw.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE, _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.catalog_iter import _d8_dir_sql
from whitebox_tools_spark.operators import focal, hydro, terrain
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.sources.tables import documents

TILE_SIZE = 8
WIN_R = 2  # windowed-position radius (5x5)
REL_ASPECT_AZ = 45.0

_DX = terrain.D_X
_DY = terrain.D_Y


def _geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def _z(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whitebox_tools_spark import catalog_cache as _cc
    return _cc.z_last(spark, sf_dir)


def _aliased(df: DataFrame, round6: bool = True) -> DataFrame:
    v = F.round("value", 6) if round6 else F.col("value")
    return df.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), v.alias("value")
    )


def _q_curv(kind):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _aliased(terrain.curvature(_z(spark, sf_dir), GRID, kind, tile_size=TILE_SIZE))

    return q


def q_ruggedness(spark, sf_dir):
    return _aliased(terrain.ruggedness_index(_z(spark, sf_dir), GRID, tile_size=TILE_SIZE))


def q_num_down(spark, sf_dir):
    return _aliased(
        terrain.num_downslope_neighbours(_z(spark, sf_dir), GRID, tile_size=TILE_SIZE),
        round6=False,
    )


def q_num_up(spark, sf_dir):
    return _aliased(
        terrain.num_upslope_neighbours(_z(spark, sf_dir), GRID, tile_size=TILE_SIZE),
        round6=False,
    )


def q_max_down_change(spark, sf_dir):
    return _aliased(terrain.max_downslope_elev_change(_z(spark, sf_dir), GRID, tile_size=TILE_SIZE))


def q_min_down_change(spark, sf_dir):
    return _aliased(terrain.min_downslope_elev_change(_z(spark, sf_dir), GRID, tile_size=TILE_SIZE))


def q_find_ridges(spark, sf_dir):
    return _aliased(terrain.find_ridges(_z(spark, sf_dir), GRID, tile_size=TILE_SIZE), round6=False)


def q_relative_aspect(spark, sf_dir):
    return _aliased(
        terrain.relative_aspect(_z(spark, sf_dir), GRID, REL_ASPECT_AZ, tile_size=TILE_SIZE)
    )


def q_surface_area_ratio(spark, sf_dir):
    return _aliased(terrain.surface_area_ratio(_z(spark, sf_dir), GRID, tile_size=TILE_SIZE))


def _q_windowed(op):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _aliased(op(_z(spark, sf_dir), GRID, rx=WIN_R, ry=WIN_R, tile_size=TILE_SIZE))

    return q


def q_elev_rel_minmax(spark, sf_dir):
    return _aliased(terrain.elev_relative_to_min_max(_z(spark, sf_dir)))


def _sca_slope(spark, sf_dir):
    z = _z(spark, sf_dir)
    from whitebox_tools_spark import catalog_cache as _cc4
    sca = _cc4.accum(spark, sf_dir, TILE_SIZE)
    sl = focal.slope(z, GRID, tile_size=TILE_SIZE)
    return sca, sl


def q_sd_of_slope(spark, sf_dir):
    return _aliased(
        terrain.standard_deviation_of_slope(_z(spark, sf_dir), GRID, 5, 5, tile_size=TILE_SIZE)
    )


def q_wetness(spark, sf_dir):
    return _aliased(terrain.wetness_index(*_sca_slope(spark, sf_dir)))


def q_stream_power(spark, sf_dir):
    return _aliased(terrain.stream_power_index(*_sca_slope(spark, sf_dir)))


def q_sediment(spark, sf_dir):
    return _aliased(terrain.sediment_transport_index(*_sca_slope(spark, sf_dir)))


QUERIES = {
    "plan_curvature": _q_curv("plan"),
    "profile_curvature": _q_curv("profile"),
    "tangential_curvature": _q_curv("tangential"),
    "total_curvature": _q_curv("total"),
    "ruggedness_index": q_ruggedness,
    "num_downslope_neighbours": q_num_down,
    "num_upslope_neighbours": q_num_up,
    "max_downslope_elev_change": q_max_down_change,
    "min_downslope_elev_change": q_min_down_change,
    "find_ridges": q_find_ridges,
    "relative_aspect": q_relative_aspect,
    "surface_area_ratio": q_surface_area_ratio,
    "dev_from_mean_elev": _q_windowed(terrain.dev_from_mean_elev),
    "diff_from_mean_elev": _q_windowed(terrain.diff_from_mean_elev),
    "elev_percentile": _q_windowed(terrain.elev_percentile),
    "percent_elev_range": _q_windowed(terrain.percent_elev_range),
    "relative_topographic_position": _q_windowed(terrain.relative_topographic_position),
    "elev_relative_to_min_max": q_elev_rel_minmax,
    "sd_of_slope": q_sd_of_slope,
    "wetness_index": q_wetness,
    "stream_power_index": q_stream_power,
    "sediment_transport_index": q_sediment,
}


# ------------------------------------------------------------- oracle SQL

_CS2 = GRID.res_x * 2.0
_CSS = GRID.res_x * GRID.res_x
_CSS4 = _CSS * 4.0


def _nb8(coalesce: bool) -> str:
    """nb CTE: the 8 reference-order neighbours; coalesce -> centre value."""
    joins, cols = [], []
    for k, (dx, dy) in enumerate(zip(_DX, _DY)):
        joins.append(
            f"LEFT JOIN r x{k} ON x{k}.cell_row = c.cell_row + ({dy}) "
            f"AND x{k}.cell_col = c.cell_col + ({dx})"
        )
        cols.append(
            f"coalesce(x{k}.value, c.value) AS n{k}" if coalesce else f"x{k}.value AS n{k}"
        )
    return (
        f"nb AS (SELECT c.cell_row, c.cell_col, c.value AS z, "
        f"{', '.join(cols)} FROM r c {' '.join(joins)})"
    )


_DERIVS = f"""d AS (SELECT cell_row, cell_col,
        (n1 - n5) / {_CS2!r} AS zx, (n7 - n3) / {_CS2!r} AS zy,
        (n1 - 2.0 * z + n5) / {_CSS!r} AS zxx,
        (n7 - 2.0 * z + n3) / {_CSS!r} AS zyy,
        (-n6 + n0 + n4 - n2) / {_CSS4!r} AS zxy
        FROM nb),
p AS (SELECT cell_row, cell_col, zx, zy, zxx, zyy, zxy,
             zx * zx AS zx2, zy * zy AS zy2, zx * zx + zy * zy AS pp
      FROM d)"""


def _curv_sql(kind: str) -> str:
    num = {
        "plan": "zxx * zy2 - 2.0 * zxy * zx * zy + zyy * zx2",
        "profile": "zxx * zx2 + 2.0 * zxy * zx * zy + zyy * zy2",
        "tangential": "zxx * zy2 + 2.0 * zxy * zx * zy + zyy * zx2",
    }
    if kind == "total":
        expr = "degrees(zxx * zxx + 2.0 * zxy * zxy + zyy * zyy) * 100.0"
        where = ""
    elif kind == "plan":
        expr = f"degrees(({num[kind]}) / pow(pp, 1.5)) * 100.0"
        where = "WHERE pp > 0.0"
    elif kind == "profile":
        expr = f"degrees(({num[kind]}) / (pp * pow(pp + 1.0, 1.5))) * 100.0"
        where = "WHERE pp > 0.0"
    else:
        expr = f"degrees(({num[kind]}) / (pp * sqrt(pp + 1.0))) * 100.0"
        where = "WHERE pp > 0.0"
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_nb8(coalesce=True)},
{_DERIVS}
SELECT cell_row, cell_col, round({expr}, 6) AS value FROM p {where}"""


def _rugged_sql() -> str:
    # chained additions in neighbour order to mirror the stencil's
    # accumulation (exactness beyond the 6 dp round)
    ss = " + ".join(
        f"(CASE WHEN n{k} IS NOT NULL THEN (n{k} - z) * (n{k} - z) ELSE 0.0 END)"
        for k in range(8)
    )
    cnt = " + ".join(f"(CASE WHEN n{k} IS NOT NULL THEN 1 ELSE 0 END)" for k in range(8))
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_nb8(coalesce=False)}
SELECT cell_row, cell_col, round(sqrt(({ss}) / ({cnt})), 6) AS value
FROM nb WHERE ({cnt}) > 0"""


def _updown_sql(op: str) -> str:
    cnt = " + ".join(
        f"(CASE WHEN n{k} {op} z THEN 1.0 ELSE 0.0 END)" for k in range(8)
    )
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_nb8(coalesce=False)}
SELECT cell_row, cell_col, CAST({cnt} AS DOUBLE) AS value FROM nb"""


_DIAG = math.sqrt(GRID.res_x * GRID.res_x + GRID.res_y * GRID.res_y)
_LENS = (_DIAG, GRID.res_x, _DIAG, GRID.res_y, _DIAG, GRID.res_x, _DIAG, GRID.res_y)


def _down_change_sql(minimum: bool) -> str:
    arms = []
    for k, (dx, dy) in enumerate(zip(_DX, _DY)):
        arms.append(
            f"SELECT c.cell_row, c.cell_col, {k} AS idx, c.value - x.value AS chg, "
            f"(c.value - x.value) / {_LENS[k]!r} AS slope "
            f"FROM r c JOIN r x ON x.cell_row = c.cell_row + ({dy}) "
            f"AND x.cell_col = c.cell_col + ({dx})"
        )
        if minimum:
            arms[-1] += " WHERE (c.value - x.value) / " + repr(_LENS[k]) + " >= 0.0"
        else:
            arms[-1] += " WHERE x.value < c.value"
    order = "slope ASC, idx ASC" if minimum else "slope DESC, idx ASC"
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
cand AS ({' UNION ALL '.join(arms)})
SELECT cell_row, cell_col, round(chg, 6) AS value FROM cand
QUALIFY row_number() OVER (PARTITION BY cell_row, cell_col ORDER BY {order}) = 1"""


def _ridges_sql() -> str:
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE}
SELECT c.cell_row, c.cell_col, CAST(1.0 AS DOUBLE) AS value
FROM r c
LEFT JOIN r nn ON nn.cell_row = c.cell_row - 1 AND nn.cell_col = c.cell_col
LEFT JOIN r ns ON ns.cell_row = c.cell_row + 1 AND ns.cell_col = c.cell_col
LEFT JOIN r nw ON nw.cell_row = c.cell_row AND nw.cell_col = c.cell_col - 1
LEFT JOIN r ne ON ne.cell_row = c.cell_row AND ne.cell_col = c.cell_col + 1
WHERE (nn.value < c.value AND ns.value < c.value)
   OR (nw.value < c.value AND ne.value < c.value)"""


def _rel_aspect_sql() -> str:
    eight_res = GRID.res_x * 8.0
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_nb8(coalesce=True)},
d AS (SELECT cell_row, cell_col,
             (n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {eight_res!r} AS fy,
             (n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {eight_res!r} AS fx
      FROM nb),
a AS (SELECT cell_row, cell_col, fx,
             abs((180.0 - degrees(atan(fy / fx))
                  + 90.0 * (CASE WHEN fx > 0 THEN 1.0 ELSE -1.0 END))
                 - {REL_ASPECT_AZ!r}) AS ang
      FROM d WHERE fx <> 0.0)
SELECT cell_row, cell_col,
       round(CASE WHEN ang > 180.0 THEN 360.0 - ang ELSE ang END, 6) AS value
FROM a
UNION ALL
SELECT cell_row, cell_col, -1.0 AS value FROM d WHERE fx = 0.0"""


def _sar_sql() -> str:
    dx9 = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
    dy9 = (-1, -1, -1, 0, 0, 0, 1, 1, 1)
    dist_pairs = (
        (0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8),
        (0, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8),
        (4, 0), (4, 2), (4, 6), (4, 8),
    )
    tri = (
        (0, 7, 12), (1, 7, 13), (2, 6, 12), (3, 8, 13),
        (2, 9, 14), (3, 11, 15), (4, 10, 14), (5, 10, 15),
    )
    resx, resy = GRID.res_x, GRID.res_y
    res_diag = math.sqrt(resx * resx + resy * resy)
    planar = [resx] * 6 + [resy] * 6 + [res_diag] * 4
    cell_area = resx * resy
    eighth = cell_area / 8.0

    joins, cols = [], []
    for k, (dx, dy) in enumerate(zip(dx9, dy9)):
        if dx == 0 and dy == 0:
            cols.append("c.value AS n4")
            continue
        joins.append(
            f"LEFT JOIN r x{k} ON x{k}.cell_row = c.cell_row + ({dy}) "
            f"AND x{k}.cell_col = c.cell_col + ({dx})"
        )
        cols.append(f"x{k}.value AS n{k}")
    dists = []
    for c_i, ((a, b), dp) in enumerate(zip(dist_pairs, planar)):
        dists.append(
            f"CASE WHEN n{a} IS NOT NULL AND n{b} IS NOT NULL THEN "
            f"sqrt({dp!r} * {dp!r} + abs(n{a} - n{b}) * abs(n{a} - n{b})) / 2.0 "
            f"ELSE 0.0 END AS d{c_i}"
        )
    areas, flats = [], []
    for p_i, q_i, r_i in tri:
        s = f"((d{p_i} + d{q_i} + d{r_i}) / 2.0)"
        areas.append(
            f"(CASE WHEN d{p_i} * d{q_i} * d{r_i} <> 0.0 THEN "
            f"sqrt({s} * ({s} - d{p_i}) * ({s} - d{q_i}) * ({s} - d{r_i})) "
            f"ELSE 0.0 END)"
        )
        flats.append(
            f"(CASE WHEN d{p_i} * d{q_i} * d{r_i} <> 0.0 THEN 0.0 ELSE {eighth!r} END)"
        )
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
nb AS MATERIALIZED (SELECT c.cell_row, c.cell_col, {', '.join(cols)}
      FROM r c {' '.join(joins)}),
dd AS MATERIALIZED (SELECT cell_row, cell_col, {', '.join(dists)} FROM nb),
fin AS (SELECT cell_row, cell_col,
               {' + '.join(areas)} AS area,
               {cell_area!r} - ({' + '.join(flats)}) AS planar
        FROM dd)
SELECT cell_row, cell_col, round(area / planar, 6) AS value
FROM fin WHERE planar > 0.0"""


_OFFS_CTE = f"""offs AS (SELECT a.i - {WIN_R} AS dr, b.i - {WIN_R} AS dc
         FROM range(0, {2 * WIN_R + 1}) a(i), range(0, {2 * WIN_R + 1}) b(i))"""

_WIN_AGG = f"""w AS (SELECT c.cell_row, c.cell_col, any_value(c.value) AS z,
       count(*) AS n, sum(nb.value) AS s, sum(nb.value * nb.value) AS ss,
       sum(CASE WHEN nb.value < c.value THEN 1 ELSE 0 END) AS less,
       min(nb.value) AS mn, max(nb.value) AS mx
FROM r c CROSS JOIN offs o
JOIN r nb ON nb.cell_row = c.cell_row + o.dr AND nb.cell_col = c.cell_col + o.dc
GROUP BY c.cell_row, c.cell_col)"""


def _windowed_sql(mode: str) -> str:
    if mode == "dev":
        sel = """round(CASE WHEN (ss - (s * s) / n) / n > 0.0
        THEN (z - s / n) / sqrt((ss - (s * s) / n) / n) ELSE 0.0 END, 6)"""
    elif mode == "diff":
        sel = "round(z - s / n, 6)"
    elif mode == "pctl":
        sel = "round(CAST(less AS DOUBLE) / n * 100.0, 6)"
    elif mode == "range":
        sel = """round(CASE WHEN mx - mn > 0.0
        THEN (z - mn) / (mx - mn) * 100.0 ELSE 0.0 END, 6)"""
    else:  # rtp
        sel = """round(CASE WHEN z < s / n THEN (z - s / n) / (s / n - mn)
        WHEN mx > s / n THEN (z - s / n) / (mx - s / n) ELSE 0.0 END, 6)"""
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_OFFS_CTE},
{_WIN_AGG}
SELECT cell_row, cell_col, {sel} AS value FROM w"""


_REL_MINMAX_SQL = f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
g AS (SELECT min(value) AS mn, max(value) AS mx FROM r)
SELECT cell_row, cell_col,
       round((value - mn) / (mx - mn) * 100.0, 6) AS value
FROM r CROSS JOIN g"""


def _sd_of_slope_sql() -> str:
    """Slope plane, then the StandardDeviationFilter oracle pattern
    (clamped-integral windows: row/col 0 excluded when clamped) over it."""
    eight_res = GRID.res_x * 8.0
    mid = 2  # 5x5
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_nb8(coalesce=True)},
slp AS MATERIALIZED (SELECT cell_row, cell_col,
              degrees(atan(sqrt(
                ((n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {eight_res!r})
                  * ((n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {eight_res!r})
                + ((n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {eight_res!r})
                  * ((n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {eight_res!r})))) AS value
       FROM nb),
mn AS (SELECT min(value) AS m FROM slp),
offs2 AS (SELECT a.i - {mid} AS dr, b.i - {mid} AS dc
          FROM range(0, {2 * mid + 1}) a(i), range(0, {2 * mid + 1}) b(i)),
j AS (SELECT c.cell_row, c.cell_col,
             sum(n.value - mn.m) AS s, sum((n.value - mn.m) * (n.value - mn.m)) AS s2,
             count(*) AS cnt
      FROM slp c CROSS JOIN mn CROSS JOIN offs2 o
      JOIN slp n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
      WHERE c.cell_row + o.dr >= 1 AND c.cell_col + o.dc >= 1
      GROUP BY c.cell_row, c.cell_col),
v AS (SELECT cell_row, cell_col, (s2 - (s * s) / cnt) / cnt AS var FROM j)
SELECT cell_row, cell_col,
       round(CASE WHEN var > 0.0 THEN sqrt(var) ELSE 0.0 END, 6) AS value
FROM v"""


def _sca_slope_sql(select: str, where: str = "") -> str:
    """Shared SCA (D8 accumulation cell count) x Horn slope scaffold."""
    eight_res = GRID.res_x * 8.0
    return f"""WITH RECURSIVE {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
{_d8_dir_sql().lstrip()},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS (SELECT id AS a,
                (cell_row + [{','.join(str(v) for v in hydro.D8_DY)}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{','.join(str(v) for v in hydro.D8_DX)}][dir + 1]) AS b
         FROM nodes WHERE dir >= 0),
walk AS (SELECT id AS src, id AS cur FROM nodes
         UNION ALL
         SELECT w.src, d.b FROM walk w JOIN down d ON d.a = w.cur),
sca AS (SELECT n.cell_row, n.cell_col, CAST(count(*) AS DOUBLE) AS sca
        FROM walk w JOIN nodes n ON n.id = w.cur GROUP BY n.cell_row, n.cell_col),
{_nb8(coalesce=True)},
slp AS (SELECT cell_row, cell_col,
              degrees(atan(sqrt(
                ((n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {eight_res!r})
                  * ((n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / {eight_res!r})
                + ((n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {eight_res!r})
                  * ((n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / {eight_res!r})))) AS slope
       FROM nb),
j AS (SELECT sca.cell_row, sca.cell_col, sca.sca, slp.slope
      FROM sca JOIN slp ON slp.cell_row = sca.cell_row AND slp.cell_col = sca.cell_col)
SELECT cell_row, cell_col, {select} AS value FROM j {where}"""


ORACLE_SQL = {
    "plan_curvature": _curv_sql("plan"),
    "profile_curvature": _curv_sql("profile"),
    "tangential_curvature": _curv_sql("tangential"),
    "total_curvature": _curv_sql("total"),
    "ruggedness_index": _rugged_sql(),
    "num_downslope_neighbours": _updown_sql("<"),
    "num_upslope_neighbours": _updown_sql(">"),
    "max_downslope_elev_change": _down_change_sql(False),
    "min_downslope_elev_change": _down_change_sql(True),
    "find_ridges": _ridges_sql(),
    "relative_aspect": _rel_aspect_sql(),
    "surface_area_ratio": _sar_sql(),
    "dev_from_mean_elev": _windowed_sql("dev"),
    "diff_from_mean_elev": _windowed_sql("diff"),
    "elev_percentile": _windowed_sql("pctl"),
    "percent_elev_range": _windowed_sql("range"),
    "relative_topographic_position": _windowed_sql("rtp"),
    "elev_relative_to_min_max": _REL_MINMAX_SQL,
    "sd_of_slope": _sd_of_slope_sql(),
    "wetness_index": _sca_slope_sql(
        "round(ln(sca / tan(radians(slope))), 6)",
        "WHERE slope <> 0.0 AND sca > 0.0",
    ),
    "stream_power_index": _sca_slope_sql(
        "round(pow(sca, 1.0) * tan(radians(slope)), 6)"
    ),
    "sediment_transport_index": _sca_slope_sql(
        "round(1.4 * pow(sca / 22.13, 0.4) * pow(sin(radians(slope)) / 0.0896, 1.3), 6)"
    ),
}
