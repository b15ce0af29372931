"""Whitebox GAT raster codec (.dep header + .tas binary data) — the
reference's OWN native format (src/raster/whitebox_raster.rs:13-115
read_whitebox header keys; data as raw little/big-endian scalars in
row-major north-first order). Data types: double/float/integer(i16)/
byte, 'Data Scale' continuous/categorical/boolean, explicit byte order.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from whitebox_tools_spark.operators.gridding import GridConfig

_DTYPES = {"double": "f8", "float": "f4", "integer": "i2", "byte": "u1", "i32": "i4"}
_NAMES = {v: k for k, v in _DTYPES.items()}


def encode_whitebox(
    grid: np.ndarray,
    cfg: GridConfig,
    data_type: str = "float",
    data_scale: str = "continuous",
    byteorder: str = "<",
) -> tuple[str, bytes]:
    """-> (.dep header text, .tas bytes)."""
    dt = np.dtype(byteorder + _DTYPES[data_type])
    arr = np.ascontiguousarray(grid, dtype=dt)
    valid = grid[grid != cfg.nodata]
    mn = float(valid.min()) if valid.size else 0.0
    mx = float(valid.max()) if valid.size else 0.0
    header = "\n".join([
        f"Min:\t{mn!r}",
        f"Max:\t{mx!r}",
        f"North:\t{cfg.north!r}",
        f"South:\t{cfg.south!r}",
        f"East:\t{cfg.east!r}",
        f"West:\t{cfg.west!r}",
        f"Cols:\t{cfg.cols}",
        f"Rows:\t{cfg.rows}",
        "Stacks:\t1",
        f"Data Type:\t{data_type.upper()}",
        "Z Units:\tnot specified",
        "XY Units:\tnot specified",
        "Projection:\tnot specified",
        f"Data Scale:\t{data_scale}",
        "Preferred Palette:\tgrey.plt",
        f"NoData:\t{cfg.nodata!r}",
        "Byte Order:\t" + ("LITTLE_ENDIAN" if byteorder == "<" else "BIG_ENDIAN"),
    ]) + "\n"
    return header, arr.tobytes()


def decode_whitebox(header: str, data: bytes) -> tuple[GridConfig, np.ndarray]:
    rows = cols = None
    north = south = east = west = None
    nodata = -32768.0
    dtype_name = "float"
    bo = "<"
    for line in header.splitlines():
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        k = key.strip().lower()
        v = val.strip()
        # key matching mirrors the reference's substring tests
        # (whitebox_raster.rs:29-108), including the min/max-vs-display
        # and rows-vs-cols precedence.
        if "rows" in k:
            rows = int(float(v))
        elif "col" in k:
            cols = int(float(v))
        elif "north" in k:
            north = float(v)
        elif "south" in k:
            south = float(v)
        elif "east" in k:
            east = float(v)
        elif "west" in k:
            west = float(v)
        elif "data type" in k:
            lv = v.lower()
            for name in _DTYPES:
                if name in lv:
                    dtype_name = name
                    break
        elif "nodata" in k:
            nodata = float(v)
        elif "byte order" in k:
            bo = "<" if ("little" in v.lower() or "lsb" in v.lower()) else ">"
    if None in (rows, cols, north, south, east, west):
        raise ValueError("incomplete .dep header")
    dt = np.dtype(bo + _DTYPES[dtype_name])
    arr = np.frombuffer(data, dtype=dt, count=rows * cols).reshape(rows, cols)
    cfg = GridConfig(
        rows=rows, cols=cols, north=north, west=west,
        res_x=(east - west) / cols, res_y=(north - south) / rows, nodata=nodata,
    )
    return cfg, arr.astype(np.float64)


_GRID_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("row", T.LongType()),
    T.StructField("col", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


def read_whitebox(spark: SparkSession, tas_path: str, drop_nodata: bool = False) -> DataFrame:
    """Distributed decode of .tas files (header .dep read alongside each).

    Unlike the single-blob formats, the .tas payload is a bare row-major
    scalar array, so each binaryFile task slices its own file; one task
    per raster, parallel across a directory of rasters.
    """
    bf = spark.read.format("binaryFile").load(tas_path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                from urllib.parse import urlparse

                local = urlparse(p).path if "://" in p or p.startswith("file:") else p
                with open(os.path.splitext(local)[0] + ".dep") as f:
                    header = f.read()
                cfg, arr = decode_whitebox(header, bytes(content))
                out = pd.DataFrame({
                    "path": p,
                    "row": np.repeat(np.arange(cfg.rows, dtype=np.int64), cfg.cols),
                    "col": np.tile(np.arange(cfg.cols, dtype=np.int64), cfg.rows),
                    "value": arr.ravel(),
                })
                if drop_nodata:
                    # NaN nodata: != NaN keeps everything (io/geotiff.py)
                    bad = (np.isnan(out["value"]) if np.isnan(cfg.nodata)
                           else out["value"] == cfg.nodata)
                    out = out[~bad]
                yield out

    return bf.select("path", "content").mapInPandas(_decode, schema=_GRID_SCHEMA)


def write_whitebox(
    df: DataFrame, cfg: GridConfig, base_path: str, data_type: str = "double",
    max_cells: int = 268_435_456,
) -> None:
    """base_path without extension; writes .dep + .tas (driver-side)."""
    from whitebox_tools_spark.operators.gridding import guard_driver_grid

    guard_driver_grid(cfg, max_cells, "write_whitebox",
                      "Whitebox .dep/.tas is a single-file format; write "
                      "tiles with write_geotiff_tiles and convert, or raise "
                      "max_cells explicitly")
    pdf = df.select("row", "col", "value").toPandas()
    arr = np.full((cfg.rows, cfg.cols), cfg.nodata, dtype=np.float64)
    arr[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf["value"].to_numpy()
    header, data = encode_whitebox(arr, cfg, data_type=data_type)
    with open(base_path + ".dep", "w") as f:
        f.write(header)
    with open(base_path + ".tas", "wb") as f:
        f.write(data)
