"""Query catalog: TIN family (construct + gridding), SURVEY.md §2.2.

The oracle reproduces the empty-circumcircle Delaunay definition by
brute force over the bounded point subset (doc_id < TIN_N — fixed-size
at every scale factor) with the identical float expressions, then the
identical barycentric plane interpolation. Exact, no rounding required
(kept at 6 dp anyway for uniformity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import GRID, _CELLS_CTE, _PTS_CTE
from whitebox_tools_spark.operators import tin
from whitebox_tools_spark.sources.tables import documents

TIN_N = 150


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = derive.with_geometry(documents(spark, sf_dir), "doc_id")
    return geo.where(F.col("doc_id") < TIN_N).select("doc_id", "x", "y", "z")


def q_construct_tin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tin.construct_tin(_pts(spark, sf_dir)).select("id1", "id2", "id3")


def q_tin_gridding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tin.tin_gridding(_pts(spark, sf_dir), GRID).select(
        F.col("row").alias("cell_row"),
        F.col("col").alias("cell_col"),
        F.round("value", 6).alias("value"),
    )


QUERIES = {
    "construct_tin": q_construct_tin,
    "tin_gridding": q_tin_gridding,
}


# ------------------------------------------------------------- oracle SQL

_TRI_CTES = f"""q AS MATERIALIZED (SELECT doc_id AS pid, x, y, z FROM pts WHERE doc_id < {TIN_N}),
tri AS (SELECT a.pid AS id1, b.pid AS id2, c.pid AS id3,
               a.x AS x1, a.y AS y1, a.z AS z1,
               b.x AS x2, b.y AS y2, b.z AS z2,
               c.x AS x3, c.y AS y3, c.z AS z3
        FROM q a JOIN q b ON b.pid > a.pid JOIN q c ON c.pid > b.pid),
ccd AS (SELECT *,
        2.0 * (x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2)) AS d,
        x1 * x1 + y1 * y1 AS a2, x2 * x2 + y2 * y2 AS b2, x3 * x3 + y3 * y3 AS c2
        FROM tri),
cc AS (SELECT *,
       (a2 * (y2 - y3) + b2 * (y3 - y1) + c2 * (y1 - y2)) / d AS ux,
       (a2 * (x3 - x2) + b2 * (x1 - x3) + c2 * (x2 - x1)) / d AS uy
       FROM ccd WHERE d <> 0.0),
del AS MATERIALIZED (SELECT * FROM (
  SELECT *, (x1 - ux) * (x1 - ux) + (y1 - uy) * (y1 - uy) AS r2 FROM cc) t
  WHERE NOT EXISTS (
    SELECT 1 FROM q p
    WHERE p.pid <> t.id1 AND p.pid <> t.id2 AND p.pid <> t.id3
      AND (p.x - t.ux) * (p.x - t.ux) + (p.y - t.uy) * (p.y - t.uy) < t.r2))"""


ORACLE_SQL = {
    "construct_tin": f"""WITH {_PTS_CTE},
{_TRI_CTES}
SELECT id1, id2, id3 FROM del""",
    "tin_gridding": f"""WITH {_PTS_CTE},
{_TRI_CTES},
{_CELLS_CTE},
j AS (SELECT cells.cell_row, cells.cell_col, del.*,
             ((cells.x - x1) * (y3 - y1) - (x3 - x1) * (cells.y - y1))
               / ((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) AS l2,
             ((x2 - x1) * (cells.y - y1) - (cells.x - x1) * (y2 - y1))
               / ((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) AS l3
      FROM cells JOIN del
        ON cells.x >= least(x1, x2, x3) AND cells.x <= greatest(x1, x2, x3)
       AND cells.y >= least(y1, y2, y3) AND cells.y <= greatest(y1, y2, y3)
       AND (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1) <> 0.0)
SELECT cell_row, cell_col,
       round(z1 + l2 * (z2 - z1) + l3 * (z3 - z1), 6) AS value
FROM j
WHERE l2 >= 0.0 AND l3 >= 0.0 AND l2 + l3 <= 1.0
QUALIFY row_number() OVER (PARTITION BY cell_row, cell_col
                           ORDER BY id1, id2, id3) = 1""",
}
