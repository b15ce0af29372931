"""Raster format conversion (ConvertRasterFormat,
src/tools/data_tools/convert_raster_format.rs:211 — pure re-encode):
read any supported raster into the shared (row, col, value) grid frame +
GridConfig, write it back in the format the output extension names."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from whitebox_tools_spark.io import ascii_grid, geotiff, whitebox_raster
from whitebox_tools_spark.operators.gridding import GridConfig


def read_raster(spark: SparkSession, path: str) -> tuple[GridConfig, DataFrame]:
    """(GridConfig, grid DataFrame) for .tif/.tiff, .asc/.txt, .tas/.dep."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".tif", ".tiff"):
        return geotiff.read_geotiff_config(path), geotiff.read_geotiff(spark, path)
    if ext in (".asc", ".txt"):
        with open(path) as f:
            cfg, _ = ascii_grid.decode_arcascii(f.read())
        return cfg, ascii_grid.read_arcascii(spark, path)
    if ext in (".tas", ".dep"):
        base = os.path.splitext(path)[0]
        with open(base + ".dep") as f:
            header = f.read()
        with open(base + ".tas", "rb") as f:
            cfg, _ = whitebox_raster.decode_whitebox(header, f.read())
        return cfg, whitebox_raster.read_whitebox(spark, base + ".tas")
    raise ValueError(f"unsupported raster extension {ext!r}")


def write_raster(df: DataFrame, cfg: GridConfig, path: str) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".tif", ".tiff"):
        geotiff.write_geotiff(df, cfg, path, dtype="f8")
    elif ext in (".asc", ".txt"):
        ascii_grid.write_arcascii(df, cfg, path)
    elif ext in (".tas", ".dep"):
        whitebox_raster.write_whitebox(df, cfg, os.path.splitext(path)[0])
    else:
        raise ValueError(f"unsupported raster extension {ext!r}")


def convert_raster_format(spark: SparkSession, src: str, dst: str) -> GridConfig:
    """Read ``src``, write ``dst`` (formats chosen by extension); returns
    the grid geometry for inspection."""
    cfg, df = read_raster(spark, src)
    write_raster(df, cfg, dst)
    return cfg
