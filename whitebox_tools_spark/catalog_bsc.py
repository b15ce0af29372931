"""Query catalog: BoundaryShapeComplexity over the densified class
raster (missing cells read as background 0, classes 1..9 are the
"polygons"; class 0 joins the background).

The oracle transcribes the full relational pipeline: thinning unrolled
(same passes as the line_thinning oracle), skeleton degree, path
decomposition via recursive connected components, walk accounting with
the junction rank-1 test, and the reference's bin normalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from whitebox_tools_spark.catalog_grid import GRID, _CELLS_CTE, _PTS_CTE
from whitebox_tools_spark.catalog_iter import _CLS_CTE
from whitebox_tools_spark.catalog_morpho import _nbr_joins, _thin_cond
from whitebox_tools_spark.operators import hydro

TILE_SIZE = 8
BSC_THIN_ROUNDS = 10


def q_boundary_shape_complexity(spark, sf_dir):
    from whitebox_tools_spark import catalog_cache as _cc
    from whitebox_tools_spark.operators.bsc import boundary_shape_complexity

    cls = _cc.cls_raster(spark, sf_dir)
    full = (
        spark.range(GRID.rows * GRID.cols)
        .select(
            (F.col("id") / GRID.cols).cast("long").alias("row"),
            F.pmod("id", F.lit(GRID.cols)).cast("long").alias("col"),
        )
        .join(cls, ["row", "col"], "left")
        .select("row", "col", F.coalesce("value", F.lit(0.0)).alias("value"))
    )
    out = boundary_shape_complexity(
        full, GRID, tile_size=TILE_SIZE, thin_rounds=BSC_THIN_ROUNDS
    )
    return out.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES = {"boundary_shape_complexity": q_boundary_shape_complexity}


# ------------------------------------------------------------- oracle SQL


def _bsc_sql() -> str:
    thin_blocks = []
    prev = "b0"
    for k in range(1, BSC_THIN_ROUNDS + 1):
        for a in range(4):
            name = f"t{k}_{a}"
            thin_blocks.append(
                f"""{name} AS MATERIALIZED (
  SELECT c.cell_row, c.cell_col,
         CASE WHEN c.value > 0.0 AND {_thin_cond(a)}
              THEN CAST(0.0 AS DOUBLE) ELSE c.value END AS value
  FROM {prev} c
  {_nbr_joins(prev)})"""
            )
            prev = name
    thin = ",\n".join(thin_blocks)
    offs = ", ".join(f"({dy}, {dx})" for dx, dy in zip(hydro.D8_DX, hydro.D8_DY))
    return f"""WITH RECURSIVE {_PTS_CTE},
{_CELLS_CTE},
{_CLS_CTE},
rp AS MATERIALIZED (SELECT g.cell_row, g.cell_col,
       coalesce(r.value, 0.0) AS value
  FROM cells g LEFT JOIN r ON r.cell_row = g.cell_row AND r.cell_col = g.cell_col),
b0 AS MATERIALIZED (SELECT cell_row, cell_col,
       CASE WHEN value > 0.0 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS value FROM rp),
{thin},
offs8 AS (SELECT * FROM (VALUES {offs}) o(dy, dx)),
skc AS MATERIALIZED (SELECT s.cell_row, s.cell_col,
       s.cell_row * {GRID.cols} + s.cell_col AS id, p.value AS poly
  FROM {prev} s JOIN rp p ON p.cell_row = s.cell_row AND p.cell_col = s.cell_col
  WHERE s.value > 0.0),
ed AS MATERIALIZED (SELECT c.id AS a, n.id AS b, c.poly
  FROM skc c CROSS JOIN offs8 o
  JOIN skc n ON n.cell_row = c.cell_row + o.dy AND n.cell_col = c.cell_col + o.dx
  WHERE n.poly = c.poly),
dg AS MATERIALIZED (SELECT c.id, c.poly, count(e.b) AS deg
  FROM skc c LEFT JOIN ed e ON e.a = c.id GROUP BY c.id, c.poly),
snode AS MATERIALIZED (SELECT id, poly, deg FROM dg WHERE deg <= 2),
sedge AS MATERIALIZED (SELECT e.a, e.b FROM ed e
  JOIN snode x ON x.id = e.a JOIN snode y ON y.id = e.b),
cc AS (SELECT id AS node, id AS lbl FROM snode
       UNION
       SELECT e.b, cc.lbl FROM cc JOIN sedge e ON e.a = cc.node),
comp AS MATERIALIZED (SELECT node, min(lbl) AS comp FROM cc GROUP BY node),
cstat AS MATERIALIZED (SELECT c.comp, count(*) AS n, min(s.poly) AS poly,
       sum(CASE WHEN s.deg = 1 THEN 1 ELSE 0 END) AS d1_cnt,
       min(CASE WHEN s.deg = 1 THEN s.id END) AS d1_min,
       max(CASE WHEN s.deg = 1 THEN s.id END) AS d1_max
  FROM comp c JOIN snode s ON s.id = c.node GROUP BY c.comp),
jedge AS (SELECT c.comp, e.b AS junction
  FROM ed e JOIN comp c ON c.node = e.a
  JOIN dg d ON d.id = e.b WHERE d.deg >= 3),
walks AS MATERIALIZED (
  SELECT poly, d1_min AS origin, CAST(n AS BIGINT) AS link,
         CAST(n + 1 AS BIGINT) AS contrib
  FROM cstat WHERE d1_cnt = 2
  UNION ALL
  SELECT poly, d1_max AS origin, CAST(1 AS BIGINT), CAST(2 AS BIGINT)
  FROM cstat WHERE d1_cnt = 2
  UNION ALL
  SELECT s.poly, s.d1_min AS origin,
         CAST(s.n + s.enter AS BIGINT) AS link,
         CAST(s.n + s.enter + 1 AS BIGINT) AS contrib
  FROM (SELECT c.poly, c.d1_min, c.n,
               CASE WHEN row_number() OVER (
                      PARTITION BY c.poly, j.junction ORDER BY c.d1_min) = 1
                    THEN 1 ELSE 0 END AS enter
        FROM cstat c JOIN jedge j ON j.comp = c.comp
        WHERE c.d1_cnt = 1) s),
per_poly AS (SELECT poly, sum(contrib) AS ne,
       sum(CASE WHEN rn <= 2 THEN link ELSE 0 END) AS top2
  FROM (SELECT *, row_number() OVER (
          PARTITION BY poly ORDER BY link DESC, origin) AS rn FROM walks) w
  GROUP BY poly),
nsk AS (SELECT poly, count(*) AS num_cells FROM skc GROUP BY poly),
minv AS (SELECT min(value) AS mv FROM rp),
stats AS (SELECT n.poly,
       CASE WHEN floor(n.poly - minv.mv) >= 1
            THEN 100.0 * (coalesce(p.ne, 0) - coalesce(p.top2, 0)) / n.num_cells
            ELSE CAST(coalesce(p.ne, 0) AS DOUBLE) END AS idx
  FROM nsk n LEFT JOIN per_poly p ON p.poly = n.poly CROSS JOIN minv)
SELECT rp.cell_row, rp.cell_col,
       round(CASE WHEN rp.value = 0.0 THEN 0.0
                  ELSE coalesce(st.idx, CAST('nan' AS DOUBLE)) END, 6) AS value
FROM rp LEFT JOIN stats st ON st.poly = rp.value"""


ORACLE_SQL = {"boundary_shape_complexity": _bsc_sql()}
