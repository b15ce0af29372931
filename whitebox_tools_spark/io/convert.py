"""Raster format conversion (ConvertRasterFormat,
src/tools/data_tools/convert_raster_format.rs:211 — pure re-encode):
read any supported raster into the shared (row, col, value) grid frame +
GridConfig, write it back in the format the output extension names."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from whitebox_tools_spark.io import ascii_grid, geotiff, simple_grids, whitebox_raster
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
    if ext == ".grd":
        # Surfer ASCII vs Surfer 7 binary, sniffed on the 4-byte magic the
        # way the reference does (raster/mod.rs get_raster_type_from_file)
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic == b"DSAA":
            with open(path) as f:
                cfg, grid = simple_grids.decode_surfer_ascii(f.read())
        else:
            with open(path, "rb") as f:
                cfg, grid = simple_grids.decode_surfer7(f.read())
        return cfg, _grid_df(spark, grid)
    if ext == ".flt":
        base = os.path.splitext(path)[0]
        with open(base + ".hdr") as f:
            header = f.read()
        with open(base + ".flt", "rb") as f:
            cfg, grid = simple_grids.decode_arcbinary(header, f.read())
        return cfg, _grid_df(spark, grid)
    if ext in (".rst", ".rdc"):
        base = os.path.splitext(path)[0]
        with open(base + ".rdc") as f:
            header = f.read()
        with open(base + ".rst", "rb") as f:
            cfg, grid = simple_grids.decode_idrisi(header, f.read())
        return cfg, _grid_df(spark, grid)
    if ext == ".grass":
        with open(path) as f:
            cfg, grid = simple_grids.decode_grass(f.read())
        return cfg, _grid_df(spark, grid)
    if ext in (".sgrd", ".sdat"):
        base = os.path.splitext(path)[0]
        with open(base + ".sgrd") as f:
            header = f.read()
        with open(base + ".sdat", "rb") as f:
            cfg, grid = simple_grids.decode_saga(header, f.read())
        return cfg, _grid_df(spark, grid)
    raise ValueError(f"unsupported raster extension {ext!r}")


def _grid_df(spark: SparkSession, grid) -> DataFrame:
    """Small-grid bridge: numpy -> (row, col, value) via Arrow."""
    import numpy as np
    import pandas as pd

    rows, cols = grid.shape
    return spark.createDataFrame(
        pd.DataFrame({
            "row": np.repeat(np.arange(rows, dtype=np.int64), cols),
            "col": np.tile(np.arange(cols, dtype=np.int64), rows),
            "value": grid.ravel().astype(float),
        })
    )


def _grid_np(df: DataFrame, cfg: GridConfig, max_cells: int = 268_435_456):
    import numpy as np

    from whitebox_tools_spark.operators.gridding import guard_driver_grid

    guard_driver_grid(cfg, max_cells, "write_raster",
                      "the simple-grid formats are single-file; write tiles "
                      "with write_geotiff_tiles and convert per tile")
    pdf = df.select("row", "col", "value").toPandas()
    arr = np.full((cfg.rows, cfg.cols), cfg.nodata, dtype=np.float64)
    arr[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf["value"].to_numpy()
    return arr


def write_raster(df: DataFrame, cfg: GridConfig, path: str) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".tif", ".tiff"):
        geotiff.write_geotiff(df, cfg, path, dtype="f8")
    elif ext in (".asc", ".txt"):
        ascii_grid.write_arcascii(df, cfg, path)
    elif ext in (".tas", ".dep"):
        whitebox_raster.write_whitebox(df, cfg, os.path.splitext(path)[0])
    elif ext == ".grd":
        with open(path, "wb") as f:
            f.write(simple_grids.encode_surfer7(_grid_np(df, cfg), cfg))
    elif ext == ".flt":
        header, data = simple_grids.encode_arcbinary(_grid_np(df, cfg), cfg)
        base = os.path.splitext(path)[0]
        with open(base + ".hdr", "w") as f:
            f.write(header)
        with open(base + ".flt", "wb") as f:
            f.write(data)
    elif ext in (".rst", ".rdc"):
        header, data = simple_grids.encode_idrisi(_grid_np(df, cfg), cfg)
        base = os.path.splitext(path)[0]
        with open(base + ".rdc", "w") as f:
            f.write(header)
        with open(base + ".rst", "wb") as f:
            f.write(data)
    elif ext == ".grass":
        with open(path, "w") as f:
            f.write(simple_grids.encode_grass(_grid_np(df, cfg), cfg))
    elif ext in (".sgrd", ".sdat"):
        header, data = simple_grids.encode_saga(_grid_np(df, cfg), cfg, data_format="double")
        base = os.path.splitext(path)[0]
        with open(base + ".sgrd", "w") as f:
            f.write(header)
        with open(base + ".sdat", "wb") as f:
            f.write(data)
    else:
        raise ValueError(f"unsupported raster extension {ext!r}")


def convert_raster_format(spark: SparkSession, src: str, dst: str) -> GridConfig:
    """Read ``src``, write ``dst`` (formats chosen by extension); returns
    the grid geometry for inspection."""
    cfg, df = read_raster(spark, src)
    write_raster(df, cfg, dst)
    return cfg
