"""Query catalog: shape-index batch 2 (vector hole/hull/circle/linearity
indices over the polygon fixture; raster patch centroid/edge ops over
the class raster). Vector oracles inline the fixture vertex arrays; the
rect parts are convex, so hull area == part area and the enclosing
circle is the bbox circumcircle in closed form (ulp differences absorbed
by the shared 6 dp round)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_attr import _layer_values_cte
from whitebox_tools_spark.catalog_grid import GRID, _COL_SQL, _IN_GRID_SQL, _PTS_CTE, _ROW_SQL
from whitebox_tools_spark.operators import measures as ms
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators import shapes2 as sh
from whitebox_tools_spark.sources import vectors
from whitebox_tools_spark.sources.tables import documents
from whitebox_tools_spark.localrel import local_df

TILE_SIZE = 8


def _layer(spark: SparkSession) -> DataFrame:
    return local_df(spark, vectors.layer_to_rows(vectors.rect_layer()))


def _layer_closed(spark: SparkSession) -> DataFrame:
    # layer_to_rows keeps the closed rings (first == last vertex) verbatim
    rows = [
        dict(fid=r["fid"], part=r["part"], is_hole=r["is_hole"],
             xs_c=r["xs"], ys_c=r["ys"])
        for r in vectors.layer_to_rows(vectors.rect_layer())
    ]
    return local_df(spark, rows)


def _cls(spark, sf_dir):
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    return rop.points_to_raster(geo, GRID, assign="max", field="cls").select(
        "row", "col", F.col("value").cast("double").alias("value")
    )


def q_hole_proportion(spark, sf_dir):
    return sh.hole_proportion(_layer(spark)).select(
        "fid", F.round("hole_prop", 6).alias("hole_prop")
    )


def q_sci(spark, sf_dir):
    return sh.shape_complexity_index(_layer(spark)).select(
        "fid", F.round("sci", 6).alias("sci")
    )


def q_rcc(spark, sf_dir):
    return sh.related_circumscribing_circle(_layer(spark)).select(
        "fid", F.round("rcc", 6).alias("rcc")
    )


def q_linearity(spark, sf_dir):
    return sh.linearity_index(_layer_closed(spark)).select(
        "fid", F.round("linearity", 6).alias("linearity")
    )


def q_centroid_raster(spark, sf_dir):
    return sh.centroid_raster(_cls(spark, sf_dir)).select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


def q_edge_proportion(spark, sf_dir):
    return sh.edge_proportion(_cls(spark, sf_dir), GRID, TILE_SIZE).select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


def q_patch_edge_cells(spark, sf_dir):
    return sh.find_patch_edge_cells(_cls(spark, sf_dir), GRID, TILE_SIZE).select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


QUERIES = {
    "hole_proportion": q_hole_proportion,
    "shape_complexity_index": q_sci,
    "related_circumscribing_circle": q_rcc,
    "linearity_index": q_linearity,
    "centroid_raster": q_centroid_raster,
    "edge_proportion": q_edge_proportion,
    "patch_edge_cells": q_patch_edge_cells,
}


# ------------------------------------------------------------- oracle SQL

_CLS_CTE = f"""r AS MATERIALIZED (SELECT {_ROW_SQL} AS cell_row, {_COL_SQL} AS cell_col,
      CAST(max(cls) AS DOUBLE) AS value
      FROM pts WHERE {_IN_GRID_SQL} GROUP BY cell_row, cell_col)"""

_EDGE_FLAG = f"""e AS (SELECT c.cell_row, c.cell_col, c.value,
       CASE WHEN count(*) FILTER (n.value IS NOT NULL AND n.value = c.value) = 8
            THEN 0.0 ELSE 1.0 END AS is_edge
FROM r c
CROSS JOIN (SELECT a.i - 1 AS dr, b.i - 1 AS dc
            FROM range(0, 3) a(i), range(0, 3) b(i)
            WHERE NOT (a.i = 1 AND b.i = 1)) o
LEFT JOIN r n ON n.cell_row = c.cell_row + o.dr AND n.cell_col = c.cell_col + o.dc
WHERE c.value > 0.0
GROUP BY c.cell_row, c.cell_col, c.value)"""

_AREA = ms.part_area_sql()

ORACLE_SQL = {
    "hole_proportion": f"""WITH {_layer_values_cte()},
m AS (SELECT fid, is_hole, {_AREA} AS area FROM lyr),
g AS (SELECT fid,
             sum(CASE WHEN is_hole THEN area ELSE 0.0 END) AS holes,
             sum(CASE WHEN is_hole THEN 0.0 ELSE area END) AS shells
      FROM m GROUP BY fid)
SELECT fid, round(holes / shells, 6) AS hole_prop FROM g""",
    # rect shells are convex: hull area == part area
    "shape_complexity_index": f"""WITH {_layer_values_cte()},
m AS (SELECT fid, is_hole, {_AREA} AS area FROM lyr),
g AS (SELECT fid,
             sum(CASE WHEN is_hole THEN -area ELSE area END) AS area,
             sum(CASE WHEN is_hole THEN 0.0 ELSE area END) AS hull_area
      FROM m GROUP BY fid)
SELECT fid, round(1.0 - area / hull_area, 6) AS sci FROM g""",
    # rect shell enclosing circle = bbox circumcircle
    "related_circumscribing_circle": f"""WITH {_layer_values_cte()},
m AS (SELECT fid, is_hole, {_AREA} AS area,
             (list_max(xs) - list_min(xs)) AS w, (list_max(ys) - list_min(ys)) AS h
      FROM lyr),
g AS (SELECT fid,
             sum(CASE WHEN is_hole THEN -area ELSE area END) AS area,
             sum(CASE WHEN is_hole THEN 0.0
                      ELSE pi() * ((w * w + h * h) / 4.0) END) AS circ_area
      FROM m GROUP BY fid)
SELECT fid, round(1.0 - area / circ_area, 6) AS rcc FROM g""",
    "linearity_index": f"""WITH {_layer_values_cte()},
closed AS (SELECT fid, part, xs_c, ys_c FROM layer),
vert AS (SELECT fid, part, u.v[1] AS x, u.v[2] AS y
         FROM closed, unnest(list_zip(xs_c, ys_c)) AS u(v)),
bbox AS (SELECT fid,
                (max(x) - min(x)) / 2.0 AS midx,
                (max(y) - min(y)) / 2.0 AS midy
         FROM vert GROUP BY fid),
p AS (SELECT v.fid, v.x - b.midx AS x, v.y - b.midy AS y
      FROM vert v JOIN bbox b ON b.fid = v.fid
      WHERE v.part = 0),
a AS (SELECT fid, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM p GROUP BY fid),
s AS (SELECT fid,
             sxx / n - (sx / n) * (sx / n) AS vxx,
             syy / n - (sy / n) * (sy / n) AS vyy,
             sxy / n - (sx * sy) / (n * n) AS vxy
      FROM a)
SELECT fid, round(CASE WHEN sqrt(vxx * vyy) <> 0.0
                       THEN (vxy / sqrt(vxx * vyy)) * (vxy / sqrt(vxx * vyy))
                       ELSE 0.0 END, 6) AS linearity
FROM s""",
    "centroid_raster": f"""WITH {_PTS_CTE},
{_CLS_CTE}
SELECT CAST(floor(sum(cell_row) / count(*)) AS BIGINT) AS cell_row,
       CAST(floor(sum(cell_col) / count(*)) AS BIGINT) AS cell_col,
       value
FROM r WHERE value > 0.0 GROUP BY value""",
    "edge_proportion": f"""WITH {_PTS_CTE},
{_CLS_CTE},
{_EDGE_FLAG},
per AS (SELECT value, sum(is_edge) / count(*) AS prop FROM e GROUP BY value)
SELECT e.cell_row, e.cell_col, round(per.prop, 6) AS value
FROM e JOIN per ON per.value = e.value""",
    "patch_edge_cells": f"""WITH {_PTS_CTE},
{_CLS_CTE},
{_EDGE_FLAG}
SELECT cell_row, cell_col,
       CASE WHEN is_edge = 1.0 THEN value ELSE 0.0 END AS value
FROM e""",
}


def q_sci_raster(spark, sf_dir):
    return sh.shape_complexity_index_raster(_cls(spark, sf_dir)).select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES["shape_complexity_raster"] = q_sci_raster

ORACLE_SQL["shape_complexity_raster"] = f"""WITH {_PTS_CTE},
{_CLS_CTE},
mn AS (SELECT min(value) AS m FROM r),
pos AS (SELECT r.cell_row, r.cell_col, r.value,
               CAST(floor(r.value - mn.m) AS BIGINT) AS bin
        FROM r CROSS JOIN mn WHERE r.value > 0.0),
mk AS (SELECT p.cell_row, p.cell_col, p.bin,
              CASE WHEN l.value IS NULL OR l.value <> p.value THEN 1 ELSE 0 END AS eh,
              CASE WHEN u.value IS NULL OR u.value <> p.value THEN 1 ELSE 0 END AS ev
       FROM pos p
       LEFT JOIN r l ON l.cell_row = p.cell_row AND l.cell_col = p.cell_col - 1
       LEFT JOIN r u ON u.cell_row = p.cell_row - 1 AND u.cell_col = p.cell_col),
per AS (SELECT bin,
               CAST(sum(eh) + sum(ev) AS DOUBLE)
                 / CAST(max(cell_row) - min(cell_row) + 1
                        + max(cell_col) - min(cell_col) + 1 AS DOUBLE) AS idx
        FROM mk GROUP BY bin)
SELECT p.cell_row, p.cell_col, round(per.idx, 6) AS value
FROM pos p JOIN per ON per.bin = p.bin
UNION ALL
SELECT cell_row, cell_col, 0.0 AS value FROM r WHERE NOT (value > 0.0)"""
