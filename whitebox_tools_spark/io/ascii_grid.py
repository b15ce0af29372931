"""Arc ASCII grid codec (.asc), matching the reference's header handling
(src/raster/arcascii_raster.rs:19-99: ncols/nrows, xllcorner|xllcenter,
cellsize, nodata_value; corner-vs-center registration resolved the same
way: llcenter shifts the origin by half a cell)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from whitebox_tools_spark.operators.gridding import GridConfig


def encode_arcascii(grid: np.ndarray, cfg: GridConfig) -> str:
    if abs(cfg.res_x - cfg.res_y) > 1e-12:
        raise ValueError("ArcASCII requires square cells")
    lines = [
        f"ncols {cfg.cols}",
        f"nrows {cfg.rows}",
        f"xllcorner {cfg.west!r}",
        f"yllcorner {cfg.south!r}",
        f"cellsize {cfg.res_x!r}",
        f"nodata_value {cfg.nodata!r}",
    ]
    for r in range(grid.shape[0]):  # north row first, like the reference
        lines.append(" ".join(repr(float(v)) for v in grid[r]))
    return "\n".join(lines) + "\n"


def decode_arcascii(text: str) -> tuple[GridConfig, np.ndarray]:
    rows = cols = None
    xll = yll = None
    center = False
    cellsize = 1.0
    nodata = -32768.0
    data_lines: list[str] = []
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        key = s.split()[0].lower()
        val = s.split()[-1]
        if key.startswith("nrows"):
            rows = int(float(val))
        elif key.startswith("ncols"):
            cols = int(float(val))
        elif key.startswith("xllcorner"):
            xll = float(val)
        elif key.startswith("yllcorner"):
            yll = float(val)
        elif key.startswith("xllcenter"):
            xll, center = float(val), True
        elif key.startswith("yllcenter"):
            yll, center = float(val), True
        elif key.startswith("cellsize"):
            cellsize = float(val)
        elif key.startswith("nodata_value"):
            nodata = float(val)
        else:
            data_lines.append(s)
    if rows is None or cols is None or xll is None or yll is None:
        raise ValueError("incomplete ArcASCII header")
    if center:  # llcenter registration -> shift to corner (arcascii_raster.rs:99+)
        xll -= cellsize / 2.0
        yll -= cellsize / 2.0
    vals = np.array(" ".join(data_lines).split(), dtype=np.float64)
    if vals.size != rows * cols:
        raise ValueError(f"expected {rows * cols} values, got {vals.size}")
    grid = vals.reshape(rows, cols)
    cfg = GridConfig(rows=rows, cols=cols, north=yll + rows * cellsize, west=xll,
                     res_x=cellsize, res_y=cellsize, nodata=nodata)
    return cfg, grid


_GRID_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("row", T.LongType()),
    T.StructField("col", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


def read_arcascii(spark: SparkSession, path: str, drop_nodata: bool = False) -> DataFrame:
    """Distributed decode via binaryFile + mapInPandas (one task/file)."""
    bf = spark.read.format("binaryFile").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                cfg, arr = decode_arcascii(bytes(content).decode("ascii"))
                rows, cols = arr.shape
                out = pd.DataFrame({
                    "path": p,
                    "row": np.repeat(np.arange(rows, dtype=np.int64), cols),
                    "col": np.tile(np.arange(cols, dtype=np.int64), rows),
                    "value": arr.ravel(),
                })
                if drop_nodata:
                    # NaN nodata: != NaN keeps everything (io/geotiff.py)
                    bad = (np.isnan(out["value"]) if np.isnan(cfg.nodata)
                           else out["value"] == cfg.nodata)
                    out = out[~bad]
                yield out

    return bf.select("path", "content").mapInPandas(_decode, schema=_GRID_SCHEMA)


def write_arcascii(
    df: DataFrame, cfg: GridConfig, path: str,
    max_cells: int = 268_435_456,
) -> None:
    from whitebox_tools_spark.operators.gridding import guard_driver_grid

    guard_driver_grid(cfg, max_cells, "write_arcascii",
                      "ArcASCII is an inherently single-file text format; "
                      "write tiles with write_geotiff_tiles and convert, or "
                      "raise max_cells explicitly")
    pdf = df.select("row", "col", "value").toPandas()
    arr = np.full((cfg.rows, cfg.cols), cfg.nodata, dtype=np.float64)
    arr[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf["value"].to_numpy()
    with open(path, "w") as f:
        f.write(encode_arcascii(arr, cfg))
