"""Hexagonal binning (VectorHexBinning / LidarHexBinning).

Parity contract (src/tools/gis_analysis/vector_hex_bin.rs:268-330,
348-383): hex centers are laid out from the point extent; each point is
assigned to its NEAREST hex center (the reference does FRS knn_search(1)
over the center set — since hexagons are the Voronoi cells of their
centers, nearest-center == true hex membership; the FRS 3x3 start block
always contains the true nearest because bucket width = hex width).
Output: one record per hex (INCLUDING empty ones) with FID (1-based
insertion order), ROW, COLUMN, COUNT.

Horizontal ('h') layout (vector_hex_bin.rs:301-324):
    half_width = w/2; size = half_width / cos(pi/6); height = 2*size
    q = 0.75 * height
    center_x0 = min_x + half_width; center_y0 = max_y - 0.25*height
    rows = ceil((max_y - min_y) / q)
    cols(r) = ceil((ext_w + half_width*(r % 2)) / w)
    center(r, c) = (center_x0 - half_width*(r%2) + c*w, center_y0 - r*q)
Vertical ('v') layout (vector_hex_bin.rs:391-414) mirrors x/y.

Spark mapping: pure column arithmetic — the nearest center of a point is
one of two candidates (the two nearest center rows; within a row the
nearest column is a round()); no join, no UDF, one groupBy on the hex key,
then a left join of the (tiny, generated) hex grid onto the counts.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.tiling import compute_extent

COS30 = math.cos(math.pi / 6.0)


def _hex_params(width: float, extent: tuple) -> dict:
    min_x, max_x, min_y, max_y = extent
    hw = 0.5 * width
    size = hw / COS30
    height = size * 2.0
    q = 0.75 * height
    ext_w = max_x - min_x
    ext_h = max_y - min_y
    return dict(
        width=width,
        hw=hw,
        size=size,
        height=height,
        q=q,
        min_x=min_x,
        max_y=max_y,
        ext_w=ext_w,
        ext_h=ext_h,
        cx0=min_x + hw,
        cy0=max_y - 0.25 * height,
        nrows=int(math.ceil(ext_h / q)),
        c_even=int(math.ceil(ext_w / width)),
        c_odd=int(math.ceil((ext_w + hw) / width)),
    )


def _candidate(p: dict, r: Column, x: Column, y: Column):
    """(col, d2) of the nearest center within candidate row ``r``."""
    shift = F.lit(p["hw"]) * (r % 2).cast("double")
    ncols = F.when(r % 2 == 0, F.lit(p["c_even"])).otherwise(F.lit(p["c_odd"]))
    c = F.floor((x - (F.lit(p["cx0"]) - shift)) / F.lit(p["width"]) + F.lit(0.5))
    c = F.greatest(F.lit(0), F.least(c, ncols - 1)).cast("long")
    cx = (F.lit(p["cx0"]) - shift) + c.cast("double") * F.lit(p["width"])
    cy = F.lit(p["cy0"]) - r.cast("double") * F.lit(p["q"])
    d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
    return c, d2


def assign_hex(
    points: DataFrame, width: float, extent: tuple | None = None, x: str = "x", y: str = "y"
) -> DataFrame:
    """Adds hex_row / hex_col (nearest-center assignment, 'h' layout)."""
    p = _hex_params(width, extent or compute_extent(points, x, y))
    xc, yc = F.col(x), F.col(y)
    ry = (F.lit(p["cy0"]) - yc) / F.lit(p["q"])
    ra = F.greatest(F.lit(0), F.least(F.floor(ry), F.lit(p["nrows"] - 1))).cast("long")
    rb = F.greatest(F.lit(0), F.least(F.floor(ry) + 1, F.lit(p["nrows"] - 1))).cast("long")
    ca, d2a = _candidate(p, ra, xc, yc)
    cb, d2b = _candidate(p, rb, xc, yc)
    # tie -> ra (smaller row == earlier FRS insertion)
    pick_b = d2b < d2a
    return points.withColumn("hex_row", F.when(pick_b, rb).otherwise(ra)).withColumn(
        "hex_col", F.when(pick_b, cb).otherwise(ca)
    )


def hex_grid(spark, width: float, extent: tuple) -> DataFrame:
    """All hexes of the 'h' layout with 1-based insertion-order FID."""
    p = _hex_params(width, extent)
    rows = spark.range(0, p["nrows"]).select(F.col("id").alias("hex_row"))
    ncols = F.when(F.col("hex_row") % 2 == 0, F.lit(p["c_even"])).otherwise(
        F.lit(p["c_odd"])
    )
    g = rows.select(
        "hex_row", F.explode(F.sequence(F.lit(0), ncols - 1)).alias("hex_col")
    )
    evens_before = ((F.col("hex_row") + 1) / 2).cast("long")
    odds_before = (F.col("hex_row") / 2).cast("long")
    fid = (
        F.lit(1)
        + evens_before * F.lit(p["c_even"])
        + odds_before * F.lit(p["c_odd"])
        + F.col("hex_col")
    ).cast("int")
    return g.withColumn("fid", fid)


def hex_bin(
    points: DataFrame, width: float, extent: tuple | None = None, x: str = "x", y: str = "y"
) -> DataFrame:
    """Full VectorHexBinning: (fid, hex_row, hex_col, count_) over ALL
    hexes of the layout (empty hexes keep count_ = 0, as the reference
    emits every hex record)."""
    ext = extent or compute_extent(points, x, y)
    assigned = assign_hex(points, width, ext, x, y)
    counts = assigned.groupBy("hex_row", "hex_col").agg(
        F.count(F.lit(1)).cast("int").alias("count_")
    )
    grid = hex_grid(points.sparkSession, width, ext)
    return grid.join(counts, ["hex_row", "hex_col"], "left").select(
        "fid",
        "hex_row",
        "hex_col",
        F.coalesce(F.col("count_"), F.lit(0)).alias("count_"),
    )


def hex_bin_sql(width: float) -> str:
    """DuckDB oracle for hex_bin over the ``pts`` CTE (same arithmetic)."""
    hw = 0.5 * width
    size = hw / COS30
    q = 0.75 * (size * 2.0)
    return f"""
ext AS (SELECT min(x) AS mn_x, max(x) AS mx_x, min(y) AS mn_y, max(y) AS my_y FROM pts),
hp AS (SELECT mn_x + {hw!r} AS cx0, my_y - {0.25 * (size * 2.0)!r} AS cy0,
              CAST(ceil((my_y - mn_y) / {q!r}) AS BIGINT) AS nrows,
              CAST(ceil((mx_x - mn_x) / {width!r}) AS BIGINT) AS c_even,
              CAST(ceil((mx_x - mn_x + {hw!r}) / {width!r}) AS BIGINT) AS c_odd
       FROM ext),
cand AS (
  SELECT p.x, p.y, hp.*,
         greatest(0, least(CAST(floor((hp.cy0 - p.y) / {q!r}) AS BIGINT), hp.nrows - 1)) AS ra,
         greatest(0, least(CAST(floor((hp.cy0 - p.y) / {q!r}) AS BIGINT) + 1, hp.nrows - 1)) AS rb
  FROM pts p CROSS JOIN hp),
cand2 AS (
  SELECT *,
         CAST(ra % 2 AS DOUBLE) * {hw!r} AS sha,
         CAST(rb % 2 AS DOUBLE) * {hw!r} AS shb,
         CASE WHEN ra % 2 = 0 THEN c_even ELSE c_odd END AS nca,
         CASE WHEN rb % 2 = 0 THEN c_even ELSE c_odd END AS ncb
  FROM cand),
cand3 AS (
  SELECT *,
         greatest(0, least(CAST(floor((x - (cx0 - sha)) / {width!r} + 0.5) AS BIGINT), nca - 1)) AS ca,
         greatest(0, least(CAST(floor((x - (cx0 - shb)) / {width!r} + 0.5) AS BIGINT), ncb - 1)) AS cb
  FROM cand2),
cand4 AS (
  SELECT *,
         (x - ((cx0 - sha) + CAST(ca AS DOUBLE) * {width!r})) * (x - ((cx0 - sha) + CAST(ca AS DOUBLE) * {width!r}))
           + (y - (cy0 - CAST(ra AS DOUBLE) * {q!r})) * (y - (cy0 - CAST(ra AS DOUBLE) * {q!r})) AS d2a,
         (x - ((cx0 - shb) + CAST(cb AS DOUBLE) * {width!r})) * (x - ((cx0 - shb) + CAST(cb AS DOUBLE) * {width!r}))
           + (y - (cy0 - CAST(rb AS DOUBLE) * {q!r})) * (y - (cy0 - CAST(rb AS DOUBLE) * {q!r})) AS d2b
  FROM cand3),
assigned AS (
  SELECT CASE WHEN d2b < d2a THEN rb ELSE ra END AS hex_row,
         CASE WHEN d2b < d2a THEN cb ELSE ca END AS hex_col
  FROM cand4),
counts AS (SELECT hex_row, hex_col, CAST(count(*) AS INT) AS count_
           FROM assigned GROUP BY hex_row, hex_col),
grid AS (
  -- range() only takes constants in DuckDB; over-generate and filter
  -- (the reference caps the layout at 100000 hexes, vector_hex_bin.rs:306)
  SELECT r.i AS hex_row, c.i AS hex_col,
         CAST(1 + ((r.i + 1) // 2) * hp.c_even + (r.i // 2) * hp.c_odd + c.i AS INT) AS fid
  FROM hp, range(0, 512) r(i), range(0, 512) c(i)
  WHERE r.i < hp.nrows
    AND c.i < CASE WHEN r.i % 2 = 0 THEN hp.c_even ELSE hp.c_odd END)
"""
