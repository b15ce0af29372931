"""Query catalog: trend surface, radius of gyration, stream extraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _IN_GRID_SQL, _CELLS_CTE, _COL_SQL, _PTS_CTE, _ROW_SQL
from whitebox_tools_spark.catalog_iter import _Z_CTE, _d8_dir_sql
from whitebox_tools_spark.operators import hydro, trend
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.sources.tables import documents

TILE_SIZE = 8
STREAM_T = 4.0


def _geo(spark, sf_dir):
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


def q_trend_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _geo(spark, sf_dir).select("x", "y", "z")
    out = trend.trend_surface(pts, GRID)
    return out.select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_radius_of_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = rop.points_to_raster(_geo(spark, sf_dir), GRID, assign="max", field="cls").select(
        "row", "col", F.col("value").cast("double").alias("value")
    )
    out = trend.radius_of_gyration(r, GRID)
    return out.select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_extract_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whitebox_tools_spark import catalog_cache as _cc5
    z = _cc5.z_last(spark, sf_dir)
    from whitebox_tools_spark import catalog_cache as _cc4
    accum = _cc4.accum(spark, sf_dir, TILE_SIZE)
    out = trend.extract_streams(accum, STREAM_T)
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


QUERIES = {
    "trend_surface": q_trend_surface,
    "radius_of_gyration": q_radius_of_gyration,
    "extract_streams": q_extract_streams,
}

_CRAMER = """
m AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy,
             sum(x * z) AS sxz, sum(y * z) AS syz
      FROM pts),
c AS (SELECT
  n * (sxx * syy - sxy * sxy) - sx * (sx * syy - sxy * sy) + sy * (sx * sxy - sxx * sy) AS det,
  sz * (sxx * syy - sxy * sxy) - sx * (sxz * syy - sxy * syz) + sy * (sxz * sxy - sxx * syz) AS n0,
  n * (sxz * syy - sxy * syz) - sz * (sx * syy - sxy * sy) + sy * (sx * syz - sxz * sy) AS n1,
  n * (sxx * syz - sxz * sxy) - sx * (sx * syz - sxz * sy) + sz * (sx * sxy - sxx * sy) AS n2
  FROM m)"""

ORACLE_SQL = {
    "trend_surface": f"""
WITH {_PTS_CTE},
{_CELLS_CTE},
{_CRAMER.lstrip()}
SELECT cells.cell_row, cells.cell_col,
       round(n0 / det + (n1 / det) * cells.x + (n2 / det) * cells.y, 6) AS value
FROM cells CROSS JOIN c
""",
    "radius_of_gyration": f"""
WITH {_PTS_CTE},
r AS (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col,
             CAST(max(cls) AS DOUBLE) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col),
pos AS (SELECT cell_row, cell_col, value, CAST(value AS BIGINT) AS cls FROM r WHERE value > 0.0),
cent AS (SELECT cls, CAST(sum(cell_col) AS DOUBLE) / count(*) AS cx,
                CAST(sum(cell_row) AS DOUBLE) / count(*) AS cy,
                count(*) AS n_tot
         FROM pos GROUP BY cls),
last AS (SELECT cls, cell_row, max(cell_col) AS cell_col FROM pos GROUP BY cls, cell_row),
g AS (SELECT l.cls,
             sum(((CAST(l.cell_col AS DOUBLE) - c.cx) * {GRID.res_x!r})
                   * ((CAST(l.cell_col AS DOUBLE) - c.cx) * {GRID.res_x!r})
                 + ((CAST(l.cell_row AS DOUBLE) - c.cy) * {GRID.res_y!r})
                   * ((CAST(l.cell_row AS DOUBLE) - c.cy) * {GRID.res_y!r})) AS gsum
      FROM last l JOIN cent c USING (cls) GROUP BY l.cls),
rog AS (SELECT g.cls,
               CASE WHEN g.gsum > 0.0 THEN sqrt(g.gsum / CAST(c.n_tot AS DOUBLE))
                    ELSE 0.0 END AS rog
        FROM g JOIN cent c USING (cls))
SELECT p.cell_row, p.cell_col, round(rog.rog, 6) AS value
FROM pos p JOIN rog ON p.cls = rog.cls
UNION ALL
SELECT cell_row, cell_col, round(value, 6) AS value FROM r WHERE NOT (value > 0.0)
""",
    "extract_streams": f"""
WITH RECURSIVE {_PTS_CTE},
{_Z_CTE},
{_d8_dir_sql().lstrip()},
nodes AS (SELECT cell_row, cell_col, cell_row * {GRID.cols} + cell_col AS id, dir FROM dirs),
down AS (SELECT id AS a,
                (cell_row + [{','.join(str(v) for v in hydro.D8_DY)}][dir + 1]) * {GRID.cols}
                  + (cell_col + [{','.join(str(v) for v in hydro.D8_DX)}][dir + 1]) AS b
         FROM nodes WHERE dir >= 0),
walk AS (SELECT id AS src, id AS cur FROM nodes
         UNION ALL
         SELECT w.src, d.b FROM walk w JOIN down d ON d.a = w.cur),
accum AS (SELECT n.cell_row, n.cell_col, CAST(count(*) AS DOUBLE) AS value
          FROM walk w JOIN nodes n ON n.id = w.cur
          GROUP BY n.cell_row, n.cell_col)
SELECT cell_row, cell_col,
       CASE WHEN value > {STREAM_T!r} THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS value
FROM accum
""",
}


def q_shape_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class hull/MBB/circle stats. Rounded to 4 decimals: the SQL
    oracle recomputes hull/calipers/MEC with different (but equally
    accurate) summation orders, so agreement is ~1e-9 absolute, not
    bit-identical; 4 decimals makes the gate deterministic."""
    from whitebox_tools_spark.operators.shapes import group_shape_stats

    out = group_shape_stats(_geo(spark, sf_dir), "cls")
    cols = [
        F.round(c, 4).alias(c) if t == "double" else F.col(c)
        for c, t in out.dtypes
    ]
    return out.select(*cols)


QUERIES["shape_stats"] = q_shape_stats


def _shape_stats_sql() -> str:
    """Hull via the edge characterization (directed pair (a,b) is a CCW
    hull edge iff every other point of the group lies strictly left),
    ring order by following the unique next-pointers from the Graham
    pivot (lowest y, rightmost on ties) — identical to the kernel's
    Graham output for point sets with no exact duplicates/collinear
    triples (the derived fixture coordinates). MBB = rotating calipers
    over ring edges 0..h-2 (the kernel's range), MEC = min-radius
    pair/triple circle containing every hull vertex (the optimum is
    unique; kernels/hull.py smallest_enclosing_circle)."""
    return f"""WITH RECURSIVE {_PTS_CTE},
p AS (SELECT cls AS g, x, y FROM pts),
st AS (SELECT g, count(*) AS n FROM p GROUP BY g),
e0 AS MATERIALIZED (
  SELECT a.g, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
  FROM p a JOIN p b ON a.g = b.g AND (a.x <> b.x OR a.y <> b.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM p k
    WHERE k.g = a.g AND (k.x <> a.x OR k.y <> a.y)
      AND (k.x <> b.x OR k.y <> b.y)
      AND ((b.x - a.x) * (k.y - a.y) - (k.x - a.x) * (b.y - a.y) < 0.0
        OR ((b.x - a.x) * (k.y - a.y) - (k.x - a.x) * (b.y - a.y) = 0.0
            -- collinear: only points strictly between a and b are allowed
            -- (Graham's Ahead-replaces-top drops them from the hull)
            AND NOT ((k.x - a.x) * (b.x - a.x) + (k.y - a.y) * (b.y - a.y) > 0.0
                 AND (k.x - a.x) * (b.x - a.x) + (k.y - a.y) * (b.y - a.y)
                     < (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)))))),
pv AS (SELECT g, x AS px, y AS py FROM p
       QUALIFY row_number() OVER (PARTITION BY g ORDER BY y ASC, x DESC) = 1),
ring AS (SELECT g, px AS x, py AS y, 0 AS i FROM pv
  UNION ALL
  SELECT r.g, e.bx, e.by, r.i + 1
  FROM ring r
  JOIN e0 e ON e.g = r.g AND e.ax = r.x AND e.ay = r.y
  JOIN pv ON pv.g = r.g
  WHERE e.bx <> pv.px OR e.by <> pv.py),
nh AS (SELECT g, count(*) AS h FROM ring GROUP BY g),
ringn AS MATERIALIZED (SELECT r.g, r.x, r.y, r.i, nh.h FROM ring r JOIN nh ON nh.g = r.g),
cyc AS (SELECT a.g, a.x, a.y, b.x AS x2, b.y AS y2
        FROM ringn a JOIN ringn b ON b.g = a.g AND b.i = (a.i + 1) % a.h),
ap AS (SELECT g, abs(sum(x * y2 - x2 * y)) / 2.0 AS hull_area,
              sum(sqrt((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y))) AS hull_perimeter
       FROM cyc GROUP BY g),
mid AS (SELECT g, min(x) + (max(x) - min(x)) / 2.0 AS midx,
               min(y) + (max(y) - min(y)) / 2.0 AS midy
        FROM ringn GROUP BY g),
hedges AS (SELECT a.g, a.i AS m, -atan2(b.y - a.y, b.x - a.x) AS psi
           FROM ringn a JOIN ringn b ON b.g = a.g AND b.i = a.i + 1),
rot AS (SELECT ed.g, ed.m, ed.psi,
        abs(max((r.x - mid.midx) * cos(ed.psi) - (r.y - mid.midy) * sin(ed.psi))
          - min((r.x - mid.midx) * cos(ed.psi) - (r.y - mid.midy) * sin(ed.psi))) AS new_x,
        abs(max((r.x - mid.midx) * sin(ed.psi) + (r.y - mid.midy) * cos(ed.psi))
          - min((r.x - mid.midx) * sin(ed.psi) + (r.y - mid.midy) * cos(ed.psi))) AS new_y
        FROM hedges ed
        JOIN mid ON mid.g = ed.g
        JOIN ringn r ON r.g = ed.g
        GROUP BY ed.g, ed.m, ed.psi),
mbb AS (SELECT g, greatest(new_x, new_y) AS long_ax, least(new_x, new_y) AS short_ax,
               CASE WHEN new_x > new_y THEN -psi ELSE -(pi() / 2.0 + psi) END AS slope
        FROM rot
        QUALIFY row_number() OVER (PARTITION BY g ORDER BY new_x * new_y ASC, m ASC) = 1),
c2 AS (SELECT a.g, (a.x + b.x) / 2.0 AS cx, (a.y + b.y) / 2.0 AS cy,
              sqrt((a.x - (a.x + b.x) / 2.0) * (a.x - (a.x + b.x) / 2.0)
                 + (a.y - (a.y + b.y) / 2.0) * (a.y - (a.y + b.y) / 2.0)) AS r
       FROM ringn a JOIN ringn b ON a.g = b.g AND a.i < b.i),
c3 AS (SELECT g, ux AS cx, uy AS cy,
              sqrt((ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)) AS r
       FROM (SELECT t.g, t.ax, t.ay,
                    ((t.ax * t.ax + t.ay * t.ay) * (t.by - t.cy)
                   + (t.bx * t.bx + t.by * t.by) * (t.cy - t.ay)
                   + (t.cx * t.cx + t.cy * t.cy) * (t.ay - t.by)) / t.d AS ux,
                    ((t.ax * t.ax + t.ay * t.ay) * (t.cx - t.bx)
                   + (t.bx * t.bx + t.by * t.by) * (t.ax - t.cx)
                   + (t.cx * t.cx + t.cy * t.cy) * (t.bx - t.ax)) / t.d AS uy
             FROM (SELECT a.g, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by,
                          c.x AS cx, c.y AS cy,
                          2.0 * (a.x * (b.y - c.y) + b.x * (c.y - a.y)
                               + c.x * (a.y - b.y)) AS d
                   FROM ringn a
                   JOIN ringn b ON a.g = b.g AND a.i < b.i
                   JOIN ringn c ON a.g = c.g AND b.i < c.i) t
             WHERE t.d <> 0.0)),
cands AS (SELECT * FROM c2 UNION ALL SELECT * FROM c3),
mec AS (SELECT cd.g, cd.cx, cd.cy, cd.r FROM cands cd
        WHERE NOT EXISTS (
          SELECT 1 FROM ringn v WHERE v.g = cd.g
            AND sqrt((v.x - cd.cx) * (v.x - cd.cx)
                   + (v.y - cd.cy) * (v.y - cd.cy)) > cd.r + 1e-10)
        QUALIFY row_number() OVER (PARTITION BY cd.g ORDER BY cd.r, cd.cx, cd.cy) = 1)
SELECT st.g AS cls, st.n AS n_points, nh.h AS hull_vertices,
       round(ap.hull_area, 4) AS hull_area,
       round(ap.hull_perimeter, 4) AS hull_perimeter,
       round(mbb.long_ax, 4) AS mbb_long_axis,
       round(mbb.short_ax, 4) AS mbb_short_axis,
       round(1.0 - mbb.short_ax / mbb.long_ax, 4) AS elongation,
       round(degrees(mbb.slope), 4) AS orientation_deg,
       round(mec.cx, 4) AS circle_x, round(mec.cy, 4) AS circle_y,
       round(mec.r, 4) AS circle_radius
FROM st JOIN nh ON nh.g = st.g JOIN ap ON ap.g = st.g
JOIN mbb ON mbb.g = st.g JOIN mec ON mec.g = st.g"""


ORACLE_SQL["shape_stats"] = _shape_stats_sql()
