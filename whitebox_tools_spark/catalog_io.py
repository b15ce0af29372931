"""Query catalog: native-format codecs (GeoTIFF / ArcASCII / LAS / Shapefile).

Each roundtrip query pushes engine data THROUGH the byte codec (encode ->
decode, the decode running distributed via binaryFile + mapInPandas) and
returns cell/point values; the DuckDB oracle computes what a lossless
roundtrip must return, reproducing any quantization the format performs
(LAS stores x/y/z as i32 * 0.001 + offset, las.rs:152-154). A hash match
therefore certifies the codec end-to-end, not just the query.

Temp files live in a per-call ``tempfile.mkdtemp`` — the queries stay
deterministic because no path appears in the output.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.catalog_grid import (
    GRID,
    _oracle_block,
    _oracle_points_raster,
    _PTS_CTE,
)
from whitebox_tools_spark.io import ascii_grid, geotiff, las, shapefile, whitebox_raster
from whitebox_tools_spark.operators.gridding import block_grid
from whitebox_tools_spark.operators.raster import points_to_raster
from whitebox_tools_spark.sources import vectors
from whitebox_tools_spark.sources.tables import documents


def _docs_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive.with_geometry(documents(spark, sf_dir), "doc_id")


# ------------------------------------------------------------- raster codecs


def q_geotiff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """block-max grid -> GeoTIFF (f8, deflate) -> distributed decode."""
    pts = _docs_geo(spark, sf_dir).select("x", "y", "z")
    grid = block_grid(pts, GRID, stat="max")
    d = tempfile.mkdtemp(prefix="wts_tif_")
    path = os.path.join(d, "grid.tif")
    geotiff.write_geotiff(grid, GRID, path, dtype="f8")
    back = geotiff.read_geotiff(spark, path, drop_nodata=True)
    return back.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


def q_arcascii_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """block-min grid -> Arc ASCII (repr full precision) -> decode."""
    pts = _docs_geo(spark, sf_dir).select("x", "y", "z")
    grid = block_grid(pts, GRID, stat="min")
    d = tempfile.mkdtemp(prefix="wts_asc_")
    path = os.path.join(d, "grid.asc")
    ascii_grid.write_arcascii(grid, GRID, path)
    back = ascii_grid.read_arcascii(spark, path, drop_nodata=True)
    return back.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


def q_whitebox_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """points-to-raster max grid -> Whitebox GAT .dep/.tas (the
    reference's native format, whitebox_raster.rs) -> distributed decode."""
    pts = _docs_geo(spark, sf_dir)
    grid = points_to_raster(pts, GRID, assign="max")
    d = tempfile.mkdtemp(prefix="wts_wbr_")
    base = os.path.join(d, "grid")
    whitebox_raster.write_whitebox(grid, GRID, base, data_type="double")
    back = whitebox_raster.read_whitebox(spark, base + ".tas", drop_nodata=True)
    return back.select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


def q_surfer7_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """points-to-raster min grid -> Surfer 7 binary .grd (f8 DATA
    section, bottom-to-top) -> decode. Empty cells carry Surfer's forced
    1.71041e38 nodata (raster/mod.rs:227-231) and are filtered."""
    from whitebox_tools_spark.io import convert, simple_grids

    pts = _docs_geo(spark, sf_dir)
    grid = points_to_raster(pts, GRID, assign="min")
    d = tempfile.mkdtemp(prefix="wts_grd_")
    path = os.path.join(d, "grid.grd")
    convert.write_raster(grid, GRID, path)
    _, back = convert.read_raster(spark, path)
    return back.where(F.col("value") != F.lit(simple_grids.SURFER_NODATA)).select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


def q_grass_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """points-to-raster first grid -> GRASS ASCII -> decode (repr() full
    precision, lossless f8)."""
    from whitebox_tools_spark.io import convert

    pts = _docs_geo(spark, sf_dir)
    grid = points_to_raster(pts, GRID, assign="first")
    d = tempfile.mkdtemp(prefix="wts_grass_")
    path = os.path.join(d, "grid.grass")
    convert.write_raster(grid, GRID, path)
    _, back = convert.read_raster(spark, path)
    return back.where(F.col("value") != F.lit(GRID.nodata)).select(
        F.col("row").alias("cell_row"), F.col("col").alias("cell_col"), "value"
    )


# f8 roundtrips are lossless, so the oracles are the block oracles verbatim.
_ORACLE_GEOTIFF = _oracle_block("max")
_ORACLE_ARCASCII = _oracle_block("min")


# ---------------------------------------------------------------- las codec


def q_las_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents points -> LAS 1.2 fmt 1 -> distributed decode.

    doc_id rides in gps_time (f64 holds ids exactly), intensity carries
    doc_id % 4096; the oracle reproduces the i32*0.001+offset quantization
    with the encoder's offset rule offset = floor(min(coord)).
    """
    pts = _docs_geo(spark, sf_dir).select(
        "x", "y", "z",
        F.col("doc_id").cast("double").alias("gps_time"),
        F.pmod(F.col("doc_id"), F.lit(4096)).cast("int").alias("intensity"),
    )
    d = tempfile.mkdtemp(prefix="wts_las_")
    path = os.path.join(d, "pts.las")
    las.write_las(pts, path, point_format=1)
    back = las.read_las(spark, path)
    return back.select(
        F.col("gps_time").cast("long").alias("did"),
        "x", "y", "z", "intensity",
    )


_ORACLE_LAS = f"""
WITH {_PTS_CTE},
mn AS (SELECT floor(min(x)) AS ox, floor(min(y)) AS oy, floor(min(z)) AS oz FROM pts)
SELECT doc_id AS did,
       CAST(CAST(round((x - ox) / 0.001) AS BIGINT) AS DOUBLE) * CAST(0.001 AS DOUBLE) + ox AS x,
       CAST(CAST(round((y - oy) / 0.001) AS BIGINT) AS DOUBLE) * CAST(0.001 AS DOUBLE) + oy AS y,
       CAST(CAST(round((z - oz) / 0.001) AS BIGINT) AS DOUBLE) * CAST(0.001 AS DOUBLE) + oz AS z,
       CAST(doc_id % 4096 AS INTEGER) AS intensity
FROM pts CROSS JOIN mn
"""


# ----------------------------------------------------------- shapefile codec


def q_shapefile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rect_layer fixture -> .shp/.shx/.dbf bytes -> decode -> ring rows.

    The oracle transcribes the fixture literally, so a hash match means
    the codec preserved every vertex, the ring order, the CW/CCW hole
    flag, and the DBF numeric attribute.
    """
    feats = vectors.rect_layer()
    recs = [
        shapefile.ShapeRecord(
            parts=list(f.rings),
            shape_type=shapefile.SHP_POLYGON,
            attrs={"ZONE": int(f.attrs["zone"])},
        )
        for f in feats
    ]
    d = tempfile.mkdtemp(prefix="wts_shp_")
    base = os.path.join(d, "layer")
    shapefile.write_shapefile(recs, base)
    df = shapefile.read_shapefile(spark, base)
    return df.select(
        "fid",
        "part",
        F.col("is_hole").cast("int").alias("hole"),
        F.size("xs").alias("nv"),
        F.element_at("xs", 1).alias("x0"),
        F.element_at("ys", 1).alias("y0"),
        F.round(F.aggregate("xs", F.lit(0.0), lambda a, v: a + v), 6).alias("xsum"),
        F.col("ZONE").cast("int").alias("zone"),
    )


def _shapefile_oracle() -> str:
    rows = []
    for fid, f in enumerate(vectors.rect_layer()):
        for part, ring in enumerate(f.rings):
            hole = 1 if f.holes[part] else 0
            xsum = round(float(ring[:, 0].sum()), 6)
            rows.append(
                f"({fid}, {part}, {hole}, {len(ring)}, "
                f"{float(ring[0, 0])!r}, {float(ring[0, 1])!r}, {xsum!r}, "
                f"{int(f.attrs['zone'])})"
            )
    return (
        "SELECT CAST(fid AS BIGINT) AS fid, CAST(part AS BIGINT) AS part, "
        "CAST(hole AS INTEGER) AS hole, CAST(nv AS INTEGER) AS nv, "
        "CAST(x0 AS DOUBLE) AS x0, CAST(y0 AS DOUBLE) AS y0, "
        "CAST(xsum AS DOUBLE) AS xsum, CAST(zone AS INTEGER) AS zone FROM (VALUES "
        + ", ".join(rows)
        + ") t(fid, part, hole, nv, x0, y0, xsum, zone)"
    )


QUERIES = {
    "geotiff_roundtrip": q_geotiff_roundtrip,
    "arcascii_roundtrip": q_arcascii_roundtrip,
    "whitebox_roundtrip": q_whitebox_roundtrip,
    "surfer7_roundtrip": q_surfer7_roundtrip,
    "grass_roundtrip": q_grass_roundtrip,
    "las_roundtrip": q_las_roundtrip,
    "shapefile_roundtrip": q_shapefile_roundtrip,
}

ORACLE_SQL = {
    "geotiff_roundtrip": _ORACLE_GEOTIFF,
    "arcascii_roundtrip": _ORACLE_ARCASCII,
    "whitebox_roundtrip": _oracle_points_raster("max"),
    "surfer7_roundtrip": _oracle_points_raster("min"),
    "grass_roundtrip": _oracle_points_raster("first"),
    "las_roundtrip": _ORACLE_LAS,
    "shapefile_roundtrip": _shapefile_oracle(),
}
