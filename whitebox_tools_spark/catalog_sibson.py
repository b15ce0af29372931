"""Query catalog: the two tools disabled upstream (tools/mod.rs:131,418),
implemented anyway — SibsonInterpolation (discrete stolen-area Sibson)
and DrainagePreservingSmoothing (FPS + DFM-adaptive threshold). Oracles
transcribe the engine's own relational definitions; unordered group sums
are absorbed by the shared 6 dp round."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import (
    GRID,
    _CELLS_CTE,
    _PTS_CTE,
    _PTS_RASTER_LAST_CTE,
)
from whitebox_tools_spark.operators import dps as dps_op
from whitebox_tools_spark.operators import fps
from whitebox_tools_spark.operators.sibson import sibson_grid

SIBSON_RADIUS = 120.0

DPS_FILTER = 3
DPS_NORM_DIFF = 15.0
DPS_NUM_ITER = 2
DPS_REDUCTION = 80.0
DPS_DFM = 0.15
DPS_MAX_DIFF = 1.0


def q_sibson(spark, sf_dir):
    from whitebox_tools_spark import derive
    from whitebox_tools_spark.sources.tables import documents

    pts = derive.with_geometry(documents(spark, sf_dir), "doc_id").select(
        "doc_id", "x", "y", "z"
    )
    out = sibson_grid(pts, GRID, radius=SIBSON_RADIUS)
    return out.select(
        "cell",
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_dps(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc

    out = dps_op.drainage_preserving_smoothing(
        _cc.z_last(spark, sf_dir), GRID,
        filter_size=DPS_FILTER, norm_diff=DPS_NORM_DIFF, num_iter=DPS_NUM_ITER,
        max_diff=DPS_MAX_DIFF, reduction=DPS_REDUCTION, dfm_threshold=DPS_DFM,
    )
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES = {
    "sibson_interpolation": q_sibson,
    "drainage_preserving_smoothing": q_dps,
}


def _sibson_sql() -> str:
    r2 = SIBSON_RADIUS * SIBSON_RADIUS
    ldy = f"(CAST(q.cell_row - p.cell_row AS DOUBLE) * {GRID.res_y!r})"
    ldx = f"(CAST(q.cell_col - p.cell_col AS DOUBLE) * {GRID.res_x!r})"
    d2 = "(c.x - p.x) * (c.x - p.x) + (c.y - p.y) * (c.y - p.y)"
    return f"""WITH {_PTS_CTE},
{_CELLS_CTE},
near AS (
  SELECT c.cell, c.cell_row, c.cell_col, p.doc_id, p.z, {d2} AS d2
  FROM cells c JOIN pts p ON {d2} <= {r2!r}),
nn AS MATERIALIZED (
  SELECT * FROM (
    SELECT near.*, row_number() OVER (PARTITION BY cell ORDER BY d2, doc_id) AS rn
    FROM near) t
  WHERE rn = 1),
stolen AS (
  SELECT q.cell_row AS qrow, q.cell_col AS qcol, p.doc_id AS owner, p.z AS oz
  FROM nn p JOIN cells q
    ON {ldy} * {ldy} + {ldx} * {ldx} < p.d2
  WHERE p.d2 > 0.0),
wts AS (
  SELECT qrow, qcol, owner, oz, count(*) AS cnt
  FROM stolen GROUP BY qrow, qcol, owner, oz),
val AS (
  SELECT qrow, qcol, sum(cnt * oz) / sum(cnt) AS sib_z
  FROM wts GROUP BY qrow, qcol),
ex AS (SELECT cell_row, cell_col, z AS ez FROM nn WHERE d2 = 0.0)
SELECT c.cell, c.cell_row, c.cell_col,
       round(coalesce(e.ez, v.sib_z), 6) AS value
FROM cells c
LEFT JOIN val v ON v.qrow = c.cell_row AND v.qcol = c.cell_col
LEFT JOIN ex e ON e.cell_row = c.cell_row AND e.cell_col = c.cell_col"""


def _dps_sql() -> str:
    fs = max(DPS_FILTER, 3)
    norm_diff = min(DPS_NORM_DIFF, 90.0)
    reduction = min(max(DPS_REDUCTION, 1.0), 99.0) / 100.0
    dfm_t = -abs(DPS_DFM)
    c = 8.0 * GRID.res_x
    c2 = repr(c * c)
    base = repr(math.cos(math.radians(norm_diff)))
    reduced = repr(math.cos(math.radians(norm_diff * (1.0 - reduction))))
    mid = fs // 2
    dwin = 2 * fs + 1

    nbr = "\n  ".join(
        f"LEFT JOIN r n{i} ON n{i}.cell_row = c.cell_row + ({dy}) "
        f"AND n{i}.cell_col = c.cell_col + ({dx})"
        for i, (dx, dy) in enumerate(zip(fps.FDX, fps.FDY))
    )
    v = [f"(coalesce(n{i}.value, c.value) * 1.0)" for i in range(8)]
    a = f"-({v[2]} - {v[4]} + 2.0 * ({v[1]} - {v[5]}) + {v[0]} - {v[6]})"
    b = f"-({v[6]} - {v[4]} + 2.0 * ({v[7]} - {v[3]}) + {v[0]} - {v[2]})"
    offs = ", ".join(
        f"({dy}, {dx})" for dy in range(-mid, mid + 1) for dx in range(-mid, mid + 1)
    )
    cos_cn = (
        f"(c.a * n.a + c.b * n.b + {c2})"
        f" / sqrt((c.a * c.a + c.b * c.b + {c2}) * (n.a * n.a + n.b * n.b + {c2}))"
    )
    exs = ", ".join(
        f"({dy}, {dx}, {repr([-GRID.res_x, -GRID.res_x, -GRID.res_x, 0.0, GRID.res_x, GRID.res_x, GRID.res_x, 0.0][i])}, "
        f"{repr([-GRID.res_y, 0.0, GRID.res_y, GRID.res_y, GRID.res_y, 0.0, -GRID.res_y, -GRID.res_y][i])})"
        for i, (dx, dy) in enumerate(zip(fps.FDX, fps.FDY))
    )
    cos_sn = (
        f"(c.sa * n.sa + c.sb * n.sb + {c2})"
        f" / sqrt((c.sa * c.sa + c.sb * c.sb + {c2}) * (n.sa * n.sa + n.sb * n.sb + {c2}))"
    )
    tgt = "CAST(floor(CAST(count(*) AS DOUBLE) / 2.0) AS INT)"
    zblocks = []
    prev = "r"
    for k in range(1, DPS_NUM_ITER + 1):
        zblocks.append(f"""u{k} AS (
  SELECT e.cell_row, e.cell_col,
         sum(-(e.na * e.xn + e.nb * e.yn - {c!r} * zn.value) / {c!r} * e.w) AS num,
         sum(e.w) AS den
  FROM edges e JOIN {prev} zn ON zn.cell_row = e.nr AND zn.cell_col = e.nc
  GROUP BY e.cell_row, e.cell_col),
z{k} AS MATERIALIZED (
  SELECT z0.cell_row, z0.cell_col,
         CASE WHEN u.den IS NOT NULL AND u.den > 0.0
                   AND abs(u.num / u.den - z0.value) <= {DPS_MAX_DIFF!r}
              THEN u.num / u.den ELSE z0.value END AS value
  FROM r z0 LEFT JOIN u{k} u
    ON u.cell_row = z0.cell_row AND u.cell_col = z0.cell_col)""")
        prev = f"z{k}"
    zj = ",\n".join(zblocks)
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
mb AS (SELECT CAST(floor(min(value) * 1000.0) AS BIGINT) AS minbin FROM r),
b AS (SELECT cell_row, cell_col,
             CAST(floor(value * 1000.0) AS BIGINT) - (SELECT minbin FROM mb) AS bo
      FROM r),
dofs AS (SELECT a.i - {fs} AS dr, b.i - {fs} AS dc
         FROM range(0, {dwin}) a(i), range(0, {dwin}) b(i)),
dfm AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col,
         CAST(c.bo - (CASE WHEN {tgt} >= 1
                           THEN list_extract(list_sort(list(n.bo)), {tgt})
                           ELSE 0 END) AS DOUBLE) / 1000.0 AS dfm
  FROM b c CROSS JOIN dofs o
  JOIN b n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
  GROUP BY c.cell_row, c.cell_col, c.bo),
thr AS (
  SELECT cell_row, cell_col,
         CASE WHEN dfm < 0.0 AND dfm > {dfm_t!r}
              THEN cos(radians({norm_diff!r} * (1.0 - {reduction!r} * dfm / {dfm_t!r})))
              WHEN dfm <= {dfm_t!r} THEN {reduced}
              ELSE {base} END AS thr
  FROM dfm),
nv AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col, {a} AS a, {b} AS b, t.thr
  FROM r c
  {nbr}
  JOIN thr t ON t.cell_row = c.cell_row AND t.cell_col = c.cell_col),
sm AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col, c.thr,
         sum(CASE WHEN {cos_cn} > c.thr
                  THEN n.a * ({cos_cn} - c.thr) * ({cos_cn} - c.thr) END)
           / sum(CASE WHEN {cos_cn} > c.thr
                      THEN ({cos_cn} - c.thr) * ({cos_cn} - c.thr) END) AS sa,
         sum(CASE WHEN {cos_cn} > c.thr
                  THEN n.b * ({cos_cn} - c.thr) * ({cos_cn} - c.thr) END)
           / sum(CASE WHEN {cos_cn} > c.thr
                      THEN ({cos_cn} - c.thr) * ({cos_cn} - c.thr) END) AS sb
  FROM nv c
  CROSS JOIN (VALUES {offs}) o(dy, dx)
  JOIN nv n ON n.cell_row = c.cell_row + o.dy AND n.cell_col = c.cell_col + o.dx
  GROUP BY c.cell_row, c.cell_col, c.thr),
edges AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col,
         c.cell_row + o.dy AS nr, c.cell_col + o.dx AS nc,
         ({cos_sn} - c.thr) * ({cos_sn} - c.thr) AS w,
         n.sa AS na, n.sb AS nb, o.xn, o.yn
  FROM sm c
  CROSS JOIN (VALUES {exs}) o(dy, dx, xn, yn)
  JOIN sm n ON n.cell_row = c.cell_row + o.dy AND n.cell_col = c.cell_col + o.dx
  WHERE {cos_sn} > c.thr),
{zj}
SELECT cell_row, cell_col, round(value, 6) AS value FROM z{DPS_NUM_ITER}"""


ORACLE_SQL = {
    "sibson_interpolation": _sibson_sql(),
    "drainage_preserving_smoothing": _dps_sql(),
}
