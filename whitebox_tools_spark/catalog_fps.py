"""Query catalog: FeaturePreservingSmoothing. Oracle transcribes the
same three relational stages (Horn normals with centre fallback,
thresholded cosine-weighted normal smoothing, unrolled Jacobi elevation
updates); group sums are unordered on both engines, absorbed by the
shared 6 dp round."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import GRID, _PTS_CTE, _PTS_RASTER_LAST_CTE
from whitebox_tools_spark.operators import fps

FILTER_SIZE = 5
NORM_DIFF = 15.0
NUM_ITER = 2


def q_feature_preserving_smoothing(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc

    out = fps.feature_preserving_smoothing(
        _cc.z_last(spark, sf_dir), GRID,
        filter_size=FILTER_SIZE, norm_diff=NORM_DIFF, num_iter=NUM_ITER,
    )
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES = {"feature_preserving_smoothing": q_feature_preserving_smoothing}


def _fps_sql() -> str:
    t = repr(math.cos(math.radians(NORM_DIFF)))
    mid = FILTER_SIZE // 2
    nbr = "\n  ".join(
        f"LEFT JOIN r n{i} ON n{i}.cell_row = c.cell_row + ({dy}) "
        f"AND n{i}.cell_col = c.cell_col + ({dx})"
        for i, (dx, dy) in enumerate(zip(fps.FDX, fps.FDY))
    )
    v = [f"coalesce(n{i}.value, c.value)" for i in range(8)]
    a = f"-({v[2]} - {v[4]} + 2.0 * ({v[1]} - {v[5]}) + {v[0]} - {v[6]}) / (8.0 * {GRID.res_x!r})"
    b = f"-({v[6]} - {v[4]} + 2.0 * ({v[7]} - {v[3]}) + {v[0]} - {v[2]}) / (8.0 * {GRID.res_y!r})"
    offs = ", ".join(
        f"({dy}, {dx})" for dy in range(-mid, mid + 1) for dx in range(-mid, mid + 1)
    )
    cos_cn = (
        "(c.a * n.a + c.b * n.b + 1.0)"
        " / sqrt((c.a * c.a + c.b * c.b + 1.0) * (n.a * n.a + n.b * n.b + 1.0))"
    )
    exs = ", ".join(
        f"({dy}, {dx}, {repr([-GRID.res_x, -GRID.res_x, -GRID.res_x, 0.0, GRID.res_x, GRID.res_x, GRID.res_x, 0.0][i])}, "
        f"{repr([-GRID.res_y, 0.0, GRID.res_y, GRID.res_y, GRID.res_y, 0.0, -GRID.res_y, -GRID.res_y][i])})"
        for i, (dx, dy) in enumerate(zip(fps.FDX, fps.FDY))
    )
    cos_sn = (
        "(c.sa * n.sa + c.sb * n.sb + 1.0)"
        " / sqrt((c.sa * c.sa + c.sb * c.sb + 1.0) * (n.sa * n.sa + n.sb * n.sb + 1.0))"
    )
    zblocks = []
    prev = "r"
    for k in range(1, NUM_ITER + 1):
        zblocks.append(f"""u{k} AS (
  SELECT e.cell_row, e.cell_col,
         sum(-(e.na * e.xn + e.nb * e.yn - zn.value) * e.w) AS num,
         sum(e.w) AS den
  FROM edges e JOIN {prev} zn ON zn.cell_row = e.nr AND zn.cell_col = e.nc
  GROUP BY e.cell_row, e.cell_col),
z{k} AS MATERIALIZED (
  SELECT z0.cell_row, z0.cell_col,
         CASE WHEN u.den IS NOT NULL AND u.den > 0.0
              THEN u.num / u.den ELSE z0.value END AS value
  FROM r z0 LEFT JOIN u{k} u
    ON u.cell_row = z0.cell_row AND u.cell_col = z0.cell_col)""")
        prev = f"z{k}"
    zj = ",\n".join(zblocks)
    return f"""WITH {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
nv AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col, {a} AS a, {b} AS b
  FROM r c
  {nbr}),
sm AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col,
         sum(CASE WHEN {cos_cn} > {t}
                  THEN n.a * ({cos_cn} - {t}) * ({cos_cn} - {t}) END)
           / sum(CASE WHEN {cos_cn} > {t}
                      THEN ({cos_cn} - {t}) * ({cos_cn} - {t}) END) AS sa,
         sum(CASE WHEN {cos_cn} > {t}
                  THEN n.b * ({cos_cn} - {t}) * ({cos_cn} - {t}) END)
           / sum(CASE WHEN {cos_cn} > {t}
                      THEN ({cos_cn} - {t}) * ({cos_cn} - {t}) END) AS sb
  FROM nv c
  CROSS JOIN (VALUES {offs}) o(dy, dx)
  JOIN nv n ON n.cell_row = c.cell_row + o.dy AND n.cell_col = c.cell_col + o.dx
  GROUP BY c.cell_row, c.cell_col),
edges AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col,
         c.cell_row + o.dy AS nr, c.cell_col + o.dx AS nc,
         ({cos_sn} - {t}) * ({cos_sn} - {t}) AS w,
         n.sa AS na, n.sb AS nb, o.xn, o.yn
  FROM sm c
  CROSS JOIN (VALUES {exs}) o(dy, dx, xn, yn)
  JOIN sm n ON n.cell_row = c.cell_row + o.dy AND n.cell_col = c.cell_col + o.dx
  WHERE {cos_sn} > {t}),
{zj}
SELECT cell_row, cell_col, round(value, 6) AS value FROM z{NUM_ITER}"""


ORACLE_SQL = {"feature_preserving_smoothing": _fps_sql()}


# ------------------------------------------- remove off-terrain objects

ROTO_FILTER = 5
ROTO_SLOPE = 20.0


def q_remove_off_terrain(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators.roto import remove_off_terrain_objects

    out = remove_off_terrain_objects(
        _cc.z_last(spark, sf_dir), GRID,
        filter_size=ROTO_FILTER, slope_threshold=ROTO_SLOPE, tile_size=8,
    )
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES["remove_off_terrain"] = q_remove_off_terrain


def _roto_sql() -> str:
    mid = ROTO_FILTER // 2
    slope = math.tan(math.radians(ROTO_SLOPE))
    diag = math.sqrt(GRID.res_x * GRID.res_x + GRID.res_y * GRID.res_y)
    lens = [diag, GRID.res_x, diag, GRID.res_y, diag, GRID.res_x, diag, GRID.res_y]
    rdx = [1, 1, 1, 0, -1, -1, -1, 0]
    rdy = [-1, 0, 1, 1, 1, 0, -1, -1]
    nthr = ", ".join(
        f"({rdy[i]}, {rdx[i]}, {slope * lens[i]!r})" for i in range(8)
    )
    r2 = (ROTO_FILTER / 1.5) ** 2
    return f"""WITH RECURSIVE {_PTS_CTE},
{_PTS_RASTER_LAST_CTE},
offs AS (SELECT a.i - {mid} AS dr, b.i - {mid} AS dc
         FROM range(0, {ROTO_FILTER}) a(i), range(0, {ROTO_FILTER}) b(i)),
ero AS MATERIALIZED (SELECT c.cell_row, c.cell_col, min(n.value) AS value
      FROM r c CROSS JOIN offs o
      JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col),
op AS MATERIALIZED (SELECT c.cell_row, c.cell_col, max(n.value) AS value
      FROM ero c CROSS JOIN offs o
      JOIN ero n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
      GROUP BY c.cell_row, c.cell_col),
th AS MATERIALIZED (SELECT r.cell_row, r.cell_col, op.value AS o,
             r.value - op.value AS t
      FROM r JOIN op ON op.cell_row = r.cell_row AND op.cell_col = r.cell_col),
nthr AS (SELECT * FROM (VALUES {nthr}) v(dy, dx, thr)),
reach AS (SELECT cell_row, cell_col FROM th WHERE t <= {slope * GRID.res_x!r}
          UNION
          SELECT n.cell_row, n.cell_col
          FROM reach g
          JOIN th c ON c.cell_row = g.cell_row AND c.cell_col = g.cell_col
          CROSS JOIN nthr o
          JOIN th n ON n.cell_row = c.cell_row + o.dy
                   AND n.cell_col = c.cell_col + o.dx
          WHERE n.t - c.t < o.thr),
ground AS MATERIALIZED (SELECT DISTINCT cell_row, cell_col FROM reach),
non_ground AS MATERIALIZED (
  SELECT th.cell_row, th.cell_col FROM th
  LEFT JOIN ground g ON g.cell_row = th.cell_row AND g.cell_col = th.cell_col
  WHERE g.cell_row IS NULL),
boundary AS MATERIALIZED (
  SELECT DISTINCT th.cell_row, th.cell_col, th.o + th.t AS src_z
  FROM th
  JOIN ground g ON g.cell_row = th.cell_row AND g.cell_col = th.cell_col
  CROSS JOIN nthr o
  JOIN non_ground n ON n.cell_row = th.cell_row + o.dy
                   AND n.cell_col = th.cell_col + o.dx),
fill AS (
  SELECT q.cell_row, q.cell_col,
         sum(b.src_z * (1.0 / (CAST(q.cell_row - b.cell_row AS DOUBLE)
                               * CAST(q.cell_row - b.cell_row AS DOUBLE)
                             + CAST(q.cell_col - b.cell_col AS DOUBLE)
                               * CAST(q.cell_col - b.cell_col AS DOUBLE))))
         / sum(1.0 / (CAST(q.cell_row - b.cell_row AS DOUBLE)
                      * CAST(q.cell_row - b.cell_row AS DOUBLE)
                    + CAST(q.cell_col - b.cell_col AS DOUBLE)
                      * CAST(q.cell_col - b.cell_col AS DOUBLE))) AS value
  FROM non_ground q
  JOIN boundary b
    ON (CAST(q.cell_row - b.cell_row AS DOUBLE) * CAST(q.cell_row - b.cell_row AS DOUBLE)
      + CAST(q.cell_col - b.cell_col AS DOUBLE) * CAST(q.cell_col - b.cell_col AS DOUBLE))
       <= {r2!r}
  GROUP BY q.cell_row, q.cell_col)
SELECT th.cell_row, th.cell_col, round(th.o + th.t, 6) AS value
FROM th JOIN ground g ON g.cell_row = th.cell_row AND g.cell_col = th.cell_col
UNION ALL
SELECT cell_row, cell_col, round(value, 6) AS value FROM fill"""


ORACLE_SQL["remove_off_terrain"] = _roto_sql()
