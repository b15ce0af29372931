"""LAS point-cloud codec (LAS 1.2, point formats 0-3), numpy-vectorized.

Header + point layouts follow the spec fields the reference parses
(src/lidar/las.rs:558-640: version at 24, header_size u16@94,
offset_to_points u32@96, point_format u8@104, scale/offset f64 triples)
and the writer uses the reference's default scale factors 0.001
(las.rs:152-154). Decoding is one structured-dtype ``np.frombuffer`` —
no per-point Python.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEADER_SIZE = 227  # LAS 1.2

_PT0 = np.dtype([
    ("xi", "<i4"), ("yi", "<i4"), ("zi", "<i4"),
    ("intensity", "<u2"), ("flags", "u1"), ("classification", "u1"),
    ("scan_angle", "i1"), ("user_data", "u1"), ("point_source_id", "<u2"),
])
_PT1 = np.dtype(_PT0.descr + [("gps_time", "<f8")])
_RGB = [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
_PT2 = np.dtype(_PT0.descr + _RGB)
_PT3 = np.dtype(_PT1.descr + _RGB)
_FORMATS = {0: _PT0, 1: _PT1, 2: _PT2, 3: _PT3}


def _header_bytes(
    n_points: int,
    point_format: int,
    scales: tuple[float, float, float],
    offsets: tuple[float, float, float],
    mins: tuple[float, float, float],
    maxs: tuple[float, float, float],
) -> bytes:
    rec_len = _FORMATS[point_format].itemsize
    h = bytearray(_HEADER_SIZE)
    h[0:4] = b"LASF"
    h[24] = 1  # version major
    h[25] = 2  # version minor
    sysid = b"whitebox_tools_spark"
    h[26:26 + len(sysid)] = sysid
    struct.pack_into("<H", h, 94, _HEADER_SIZE)
    struct.pack_into("<I", h, 96, _HEADER_SIZE)  # offset to points (no VLRs)
    struct.pack_into("<I", h, 100, 0)  # number of VLRs
    h[104] = point_format
    struct.pack_into("<H", h, 105, rec_len)
    struct.pack_into("<I", h, 107, n_points)
    struct.pack_into("<I", h, 111, n_points)  # returns-by-pulse[0]
    struct.pack_into("<3d", h, 131, *scales)
    struct.pack_into("<3d", h, 155, *offsets)
    # spec order: max_x min_x max_y min_y max_z min_z
    struct.pack_into("<6d", h, 179, maxs[0], mins[0], maxs[1], mins[1], maxs[2], mins[2])
    return bytes(h)


def encode_las(pdf: pd.DataFrame, point_format: int = 1) -> bytes:
    """Encode a pandas frame (x,y,z required; intensity, classification,
    return_num, num_returns, scan_angle, point_source_id, gps_time
    optional) as LAS 1.2 bytes."""
    if point_format not in _FORMATS:
        raise ValueError(f"unsupported LAS point format {point_format}")
    n = len(pdf)
    x = pdf["x"].to_numpy(np.float64)
    y = pdf["y"].to_numpy(np.float64)
    z = pdf["z"].to_numpy(np.float64)
    scales = (0.001, 0.001, 0.001)  # reference defaults, las.rs:152-154
    offsets = (
        float(np.floor(x.min())) if n else 0.0,
        float(np.floor(y.min())) if n else 0.0,
        float(np.floor(z.min())) if n else 0.0,
    )
    rec = np.zeros(n, dtype=_FORMATS[point_format])
    rec["xi"] = np.round((x - offsets[0]) / scales[0]).astype(np.int64)
    rec["yi"] = np.round((y - offsets[1]) / scales[1]).astype(np.int64)
    rec["zi"] = np.round((z - offsets[2]) / scales[2]).astype(np.int64)

    def _opt(col, default=0):
        return pdf[col].to_numpy() if col in pdf.columns else np.full(n, default)

    rec["intensity"] = _opt("intensity").astype(np.uint16)
    ret = np.clip(_opt("return_num", 1).astype(np.int64), 0, 7)
    nret = np.clip(_opt("num_returns", 1).astype(np.int64), 0, 7)
    rec["flags"] = (ret | (nret << 3)).astype(np.uint8)
    rec["classification"] = _opt("classification").astype(np.uint8)
    rec["scan_angle"] = _opt("scan_angle").astype(np.int8)
    rec["point_source_id"] = _opt("point_source_id").astype(np.uint16)
    if point_format in (1, 3):
        rec["gps_time"] = _opt("gps_time", 0.0).astype(np.float64)
    if point_format in (2, 3):
        for ch in ("red", "green", "blue"):
            rec[ch] = _opt(ch).astype(np.uint16)

    mins = (float(x.min()) if n else 0.0, float(y.min()) if n else 0.0,
            float(z.min()) if n else 0.0)
    maxs = (float(x.max()) if n else 0.0, float(y.max()) if n else 0.0,
            float(z.max()) if n else 0.0)
    return _header_bytes(n, point_format, scales, offsets, mins, maxs) + rec.tobytes()


def decode_las(data: bytes, batch_points: int = 1 << 20) -> Iterator[pd.DataFrame]:
    """Decode LAS bytes, yielding pandas batches (never one giant frame).

    Columns: x,y,z,intensity,return_num,num_returns,classification,
    scan_angle,point_source_id,gps_time (NaN for format 0).
    """
    if data[:4] != b"LASF":
        raise ValueError("not a LAS file")
    vmaj, vmin = data[24], data[25]
    if vmaj != 1:
        raise ValueError(f"unsupported LAS version {vmaj}.{vmin}")
    (offset_to_points,) = struct.unpack_from("<I", data, 96)
    point_format = data[104] & 0x3F
    (rec_len,) = struct.unpack_from("<H", data, 105)
    (n_points,) = struct.unpack_from("<I", data, 107)
    if vmin >= 4 and n_points == 0:
        # LAS 1.4: 64-bit count lives in the extended block at 247
        (n_points,) = struct.unpack_from("<Q", data, 247)
    sx, sy, sz = struct.unpack_from("<3d", data, 131)
    ox, oy, oz = struct.unpack_from("<3d", data, 155)
    if point_format not in _FORMATS:
        raise ValueError(f"unsupported LAS point format {point_format}")
    dt = _FORMATS[point_format]
    if rec_len < dt.itemsize:
        raise ValueError(f"record length {rec_len} < format {point_format} size")

    for start in range(0, n_points, batch_points):
        cnt = min(batch_points, n_points - start)
        off = offset_to_points + start * rec_len
        if rec_len == dt.itemsize:
            rec = np.frombuffer(data, dtype=dt, count=cnt, offset=off)
        else:  # extra bytes per record: view through a padded dtype
            padded = np.dtype({"names": list(dt.names),
                               "formats": [dt[n] for n in dt.names],
                               "offsets": [dt.fields[n][1] for n in dt.names],
                               "itemsize": rec_len})
            rec = np.frombuffer(data, dtype=padded, count=cnt, offset=off)
        flags = rec["flags"]
        yield pd.DataFrame({
            "x": rec["xi"] * sx + ox,
            "y": rec["yi"] * sy + oy,
            "z": rec["zi"] * sz + oz,
            "intensity": rec["intensity"].astype(np.int32),
            "return_num": (flags & 0x7).astype(np.int32),
            "num_returns": ((flags >> 3) & 0x7).astype(np.int32),
            "classification": rec["classification"].astype(np.int32),
            "scan_angle": rec["scan_angle"].astype(np.int32),
            "point_source_id": rec["point_source_id"].astype(np.int32),
            "gps_time": rec["gps_time"].astype(np.float64)
            if point_format in (1, 3) else np.full(cnt, np.nan),
            "red": rec["red"].astype(np.int32)
            if point_format in (2, 3) else np.zeros(cnt, np.int32),
            "green": rec["green"].astype(np.int32)
            if point_format in (2, 3) else np.zeros(cnt, np.int32),
            "blue": rec["blue"].astype(np.int32)
            if point_format in (2, 3) else np.zeros(cnt, np.int32),
        })


_LAS_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("z", T.DoubleType()),
    T.StructField("intensity", T.IntegerType()),
    T.StructField("return_num", T.IntegerType()),
    T.StructField("num_returns", T.IntegerType()),
    T.StructField("classification", T.IntegerType()),
    T.StructField("scan_angle", T.IntegerType()),
    T.StructField("point_source_id", T.IntegerType()),
    T.StructField("gps_time", T.DoubleType()),
    T.StructField("red", T.IntegerType()),
    T.StructField("green", T.IntegerType()),
    T.StructField("blue", T.IntegerType()),
])


def read_las(spark: SparkSession, path: str) -> DataFrame:
    """Distributed decode: one task per .las flightline, numpy-vectorized,
    yielded in 1M-point batches."""
    bf = spark.read.format("binaryFile").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                for out in decode_las(bytes(content)):
                    out.insert(0, "path", p)
                    yield out

    return bf.select("path", "content").mapInPandas(_decode, schema=_LAS_SCHEMA)


def write_las(df: DataFrame, path: str, point_format: int = 1) -> None:
    """Single-file writer (driver-side collect). Use :func:`write_las_tiles`
    for the partitioned scale path."""
    pdf = df.toPandas()
    with open(path, "wb") as f:
        f.write(encode_las(pdf, point_format))


def write_las_tiles(
    df: DataFrame, out_dir: str, tile_col: str, point_format: int = 1
) -> list[str]:
    """One .las per tile id, encoded on the executors (the LidarTile
    output contract, lidar_tile.rs — each tile is an independent file)."""
    os.makedirs(out_dir, exist_ok=True)
    out_schema = T.StructType([
        T.StructField("tile", T.StringType()),
        T.StructField("file", T.StringType()),
        T.StructField("n", T.LongType()),
    ])

    def _write(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tile = str(key[0])
        fp = os.path.join(out_dir, f"tile_{tile}.las")
        with open(fp, "wb") as f:
            f.write(encode_las(pdf, point_format))
        return pd.DataFrame({"tile": [tile], "file": [fp], "n": [len(pdf)]})

    manifest = df.groupBy(tile_col).applyInPandas(_write, schema=out_schema).collect()
    return [r["file"] for r in sorted(manifest, key=lambda r: r["tile"])]
