"""The reference's remaining raster formats, one module:

- GRASS ASCII (src/raster/grass_raster.rs:9-60): ``key: value`` header
  (north/south/east/west/rows/cols/null), data north-first; res derived
  from the extent.
- Surfer ASCII .grd (src/raster/surfer_ascii_raster.rs:10-120): DSAA
  magic; cols rows / west east / south north / zmin zmax; data stored
  BOTTOM-to-top; nodata forced to 1.71041e38 (raster/mod.rs:227-231);
  res = extent/cols|rows exactly as the reference computes it (:112-113).
- Surfer 7 binary .grd (src/raster/surfer7_raster.rs:11-230): DSRB
  header section, GRID section (size 72: rows, cols i32; xLL, yLL,
  res_x, res_y, min, max, rotation, nodata f64), DATA section of f64
  scanned bottom-to-top.
- ArcGIS binary .flt + .hdr (src/raster/arcbinary_raster.rs:16-99):
  ncols/nrows/xll(corner|center)/cellsize/nodata_value/byteorder header,
  f32 data north-first.
- Idrisi .rst + .rdc (src/raster/idrisi_raster.rs:12-124,227-280):
  text .rdc header (columns/rows/data type real|integer|byte/min-max
  X-Y/flag value), binary .rst north-first.

All expose (GridConfig, 2-D float64) like the other codecs and plug into
``io.convert`` by extension.
"""

from __future__ import annotations

import struct

import numpy as np

from whitebox_tools_spark.operators.gridding import GridConfig

SURFER_NODATA = 1.71041e38

# ------------------------------------------------------------- GRASS ASCII


def encode_grass(grid: np.ndarray, cfg: GridConfig) -> str:
    lines = [
        f"north: {cfg.north!r}",
        f"south: {cfg.south!r}",
        f"east: {cfg.east!r}",
        f"west: {cfg.west!r}",
        f"rows: {cfg.rows}",
        f"cols: {cfg.cols}",
        f"null: {cfg.nodata!r}",
    ]
    for r in range(grid.shape[0]):
        lines.append(" ".join(repr(float(v)) for v in grid[r]))
    return "\n".join(lines) + "\n"


def decode_grass(text: str) -> tuple[GridConfig, np.ndarray]:
    hdr: dict[str, float] = {}
    nodata = -32768.0
    data_lines: list[str] = []
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        if ":" in s and not s.split(":")[0].strip().lstrip("-").replace(".", "").isdigit():
            key, _, val = s.partition(":")
            k = key.strip().lower()
            v = val.strip()
            if "rows" in k:
                hdr["rows"] = float(v)
            elif "cols" in k:
                hdr["cols"] = float(v)
            elif "north" in k:
                hdr["north"] = float(v)
            elif "south" in k:
                hdr["south"] = float(v)
            elif "east" in k:
                hdr["east"] = float(v)
            elif "west" in k:
                hdr["west"] = float(v)
            elif "null" in k:
                nodata = float(v)
        else:
            data_lines.append(s)
    rows, cols = int(hdr["rows"]), int(hdr["cols"])
    vals = np.array(" ".join(data_lines).split(), dtype=np.float64)
    grid = vals[: rows * cols].reshape(rows, cols)
    cfg = GridConfig(
        rows=rows, cols=cols, north=hdr["north"], west=hdr["west"],
        res_x=(hdr["east"] - hdr["west"]) / cols,
        res_y=(hdr["north"] - hdr["south"]) / rows, nodata=nodata,
    )
    return cfg, grid


# ------------------------------------------------------------ Surfer ASCII


def encode_surfer_ascii(grid: np.ndarray, cfg: GridConfig) -> str:
    g = np.where(grid == cfg.nodata, SURFER_NODATA, grid)
    valid = g[g != SURFER_NODATA]
    zmin = float(valid.min()) if valid.size else 0.0
    zmax = float(valid.max()) if valid.size else 0.0
    lines = [
        "DSAA",
        f"{cfg.cols} {cfg.rows}",
        f"{cfg.west!r} {cfg.east!r}",
        f"{cfg.south!r} {cfg.north!r}",
        f"{zmin!r} {zmax!r}",
    ]
    for r in range(cfg.rows - 1, -1, -1):  # bottom-to-top like the reference
        lines.append(" ".join("1.71041e38" if v == SURFER_NODATA else repr(float(v))
                              for v in g[r]))
    return "\n".join(lines) + "\n"


def decode_surfer_ascii(text: str) -> tuple[GridConfig, np.ndarray]:
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if "dsaa" not in lines[0].lower():
        raise ValueError("not a Surfer ASCII grid (missing DSAA)")
    cols, rows = (int(float(t)) for t in lines[1].split())
    west, east = (float(t) for t in lines[2].split())
    south, north = (float(t) for t in lines[3].split())
    vals = np.array(" ".join(lines[5:]).split(), dtype=np.float64)
    grid = vals[: rows * cols].reshape(rows, cols)[::-1].copy()  # to north-first
    cfg = GridConfig(
        rows=rows, cols=cols, north=north, west=west,
        res_x=(east - west) / cols, res_y=(north - south) / rows,
        nodata=SURFER_NODATA,
    )
    return cfg, grid


# ---------------------------------------------------------- Surfer 7 binary

_DSRB = 0x42525344
_GRID = 0x44495247
_DATA = 0x41544144


def encode_surfer7(grid: np.ndarray, cfg: GridConfig) -> bytes:
    g = np.where(grid == cfg.nodata, SURFER_NODATA, grid).astype("<f8")
    valid = g[g != SURFER_NODATA]
    zmin = float(valid.min()) if valid.size else 0.0
    zmax = float(valid.max()) if valid.size else 0.0
    out = bytearray()
    out += struct.pack("<iii", _DSRB, 4, 2)  # header section, version 2
    out += struct.pack("<ii", _GRID, 72)
    out += struct.pack("<ii", cfg.rows, cfg.cols)
    out += struct.pack("<6d", cfg.west, cfg.south, cfg.res_x, cfg.res_y, zmin, zmax)
    out += struct.pack("<2d", 0.0, SURFER_NODATA)  # rotation, blank value
    out += struct.pack("<ii", _DATA, cfg.rows * cfg.cols * 8)
    out += g[::-1].tobytes()  # bottom-to-top
    return bytes(out)


def decode_surfer7(data: bytes) -> tuple[GridConfig, np.ndarray]:
    (hid,) = struct.unpack_from("<i", data, 0)
    if hid != _DSRB:
        raise ValueError("not a Surfer 7 grid (missing DSRB)")
    off = 12
    (gid, gsz) = struct.unpack_from("<ii", data, off)
    if gid != _GRID or gsz != 72:
        raise ValueError("malformed Surfer 7 GRID section")
    off += 8
    rows, cols = struct.unpack_from("<ii", data, off)
    west, south, rx, ry, _zmin, _zmax, _rot, nodata = struct.unpack_from(
        "<8d", data, off + 8
    )
    off += 72
    (did, dsz) = struct.unpack_from("<ii", data, off)
    if did != _DATA:
        raise ValueError("malformed Surfer 7 DATA section")
    off += 8
    per = dsz // (rows * cols)
    dt = "<f8" if per == 8 else "<f4"
    grid = (
        np.frombuffer(data, dtype=dt, count=rows * cols, offset=off)
        .reshape(rows, cols)[::-1]
        .astype(np.float64)
    )
    cfg = GridConfig(
        rows=rows, cols=cols, north=south + ry * rows, west=west,
        res_x=rx, res_y=ry, nodata=nodata,
    )
    return cfg, grid


# ------------------------------------------------------- ArcGIS binary .flt


def encode_arcbinary(grid: np.ndarray, cfg: GridConfig, byteorder: str = "<") -> tuple[str, bytes]:
    if abs(cfg.res_x - cfg.res_y) > 1e-12:
        raise ValueError("ArcBinary requires square cells")
    header = "\n".join([
        f"NCOLS {cfg.cols}",
        f"NROWS {cfg.rows}",
        f"XLLCORNER {cfg.west!r}",
        f"YLLCORNER {cfg.south!r}",
        f"CELLSIZE {cfg.res_x!r}",
        f"NODATA_VALUE {cfg.nodata!r}",
        "BYTEORDER " + ("LSBFIRST" if byteorder == "<" else "MSBFIRST"),
    ]) + "\n"
    return header, np.ascontiguousarray(grid, dtype=byteorder + "f4").tobytes()


def decode_arcbinary(header: str, data: bytes) -> tuple[GridConfig, np.ndarray]:
    rows = cols = None
    xll = yll = None
    center = False
    cellsize = 1.0
    nodata = -32768.0
    bo = "<"
    for line in header.splitlines():
        parts = line.split()
        if len(parts) < 2:
            continue
        k = parts[0].lower()
        v = parts[-1]
        if "nrows" in k:
            rows = int(float(v))
        elif "ncols" in k:
            cols = int(float(v))
        elif "xllcorner" in k:
            xll = float(v)
        elif "yllcorner" in k:
            yll = float(v)
        elif "xllcenter" in k:
            xll, center = float(v), True
        elif "yllcenter" in k:
            yll, center = float(v), True
        elif "cellsize" in k:
            cellsize = float(v)
        elif "nodata_value" in k:
            nodata = float(v)
        elif "byteorder" in k:
            bo = "<" if v.lower().startswith("lsb") else ">"
    if rows is None or cols is None or xll is None or yll is None:
        raise ValueError("incomplete .hdr header")
    if center:  # arcbinary_raster.rs:97-99
        xll -= cellsize / 2.0
        yll -= cellsize / 2.0
    grid = (
        np.frombuffer(data, dtype=bo + "f4", count=rows * cols)
        .reshape(rows, cols)
        .astype(np.float64)
    )
    cfg = GridConfig(rows=rows, cols=cols, north=yll + rows * cellsize, west=xll,
                     res_x=cellsize, res_y=cellsize, nodata=nodata)
    return cfg, grid


# ------------------------------------------------------------- Idrisi .rst

_IDRISI_DTYPES = {"real": "<f4", "integer": "<i2", "byte": "u1"}


def encode_idrisi(grid: np.ndarray, cfg: GridConfig, data_type: str = "real") -> tuple[str, bytes]:
    dt = _IDRISI_DTYPES[data_type]
    arr = np.ascontiguousarray(grid, dtype=dt)
    valid = grid[grid != cfg.nodata]
    header = "\n".join([
        "file format : IDRISI Raster A.1",
        "file title  : whitebox_tools_spark",
        f"data type   : {data_type}",
        "file type   : binary",
        f"columns     : {cfg.cols}",
        f"rows        : {cfg.rows}",
        "ref. system : plane",
        "ref. units  : m",
        "unit dist.  : 1.0",
        f"min. X      : {cfg.west!r}",
        f"max. X      : {cfg.east!r}",
        f"min. Y      : {cfg.south!r}",
        f"max. Y      : {cfg.north!r}",
        "pos'n error : unknown",
        "resolution  : " + repr(cfg.res_x),
        f"min. value  : {float(valid.min()) if valid.size else 0.0!r}",
        f"max. value  : {float(valid.max()) if valid.size else 0.0!r}",
        f"display min : {float(valid.min()) if valid.size else 0.0!r}",
        f"display max : {float(valid.max()) if valid.size else 0.0!r}",
        "value units : unspecified",
        "value error : unknown",
        f"flag value  : {cfg.nodata!r}",
        "flag def'n  : nodata",
        "legend cats : 0",
    ]) + "\n"
    return header, arr.tobytes()


def decode_idrisi(header: str, data: bytes) -> tuple[GridConfig, np.ndarray]:
    rows = cols = None
    west = east = south = north = None
    nodata = -32768.0
    dtype_name = "real"
    for line in header.splitlines():
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        k = key.strip().lower()
        v = val.strip()
        if "lineage" in k:
            continue
        if "columns" in k:
            cols = int(float(v))
        elif "rows" in k:
            rows = int(float(v))
        elif "data type" in k:
            lv = v.lower()
            for name in _IDRISI_DTYPES:
                if name in lv:
                    dtype_name = name
                    break
        elif "min. x" in k:
            west = float(v)
        elif "max. x" in k:
            east = float(v)
        elif "min. y" in k:
            south = float(v)
        elif "max. y" in k:
            north = float(v)
        elif "flag value" in k:
            try:
                nodata = float(v)
            except ValueError:
                pass
    if None in (rows, cols, west, east, south, north):
        raise ValueError("incomplete .rdc header")
    dt = _IDRISI_DTYPES[dtype_name]
    grid = (
        np.frombuffer(data, dtype=dt, count=rows * cols)
        .reshape(rows, cols)
        .astype(np.float64)
    )
    cfg = GridConfig(
        rows=rows, cols=cols, north=north, west=west,
        res_x=(east - west) / cols, res_y=(north - south) / rows, nodata=nodata,
    )
    return cfg, grid


# ------------------------------------------------------------- SAGA .sgrd

_SAGA_DTYPES = {"double": "f8", "float": "f4", "integer": "i4"}


def encode_saga(grid: np.ndarray, cfg: GridConfig, data_format: str = "float") -> tuple[str, bytes]:
    """-> (.sgrd header text, .sdat bytes). Mirrors the reference's writer
    (saga_raster.rs:424-475): TOPTOBOTTOM=FALSE (bottom-up data),
    POSITION_* treated as the grid corner the way the reference reads it
    (saga_raster.rs:83-96)."""
    if abs(cfg.res_x - cfg.res_y) > 1e-12:
        raise ValueError("SAGA requires square cells")
    dt = "<" + _SAGA_DTYPES[data_format]
    header = "\n".join([
        "NAME\t= whitebox_tools_spark",
        "DESCRIPTION\t= ",
        "UNIT\t= ",
        f"DATAFORMAT\t= {data_format.upper()}",
        "DATAFILE_OFFSET\t= 0",
        "BYTEORDER_BIG\t= FALSE",
        f"POSITION_XMIN\t= {cfg.west!r}",
        f"POSITION_YMIN\t= {cfg.south!r}",
        f"CELLCOUNT_X\t= {cfg.cols}",
        f"CELLCOUNT_Y\t= {cfg.rows}",
        f"CELLSIZE\t= {cfg.res_x!r}",
        "Z_FACTOR\t= 1.0",
        f"NODATA_VALUE\t= {cfg.nodata!r}",
        "TOPTOBOTTOM\t= FALSE",
    ]) + "\n"
    arr = np.ascontiguousarray(grid[::-1], dtype=dt)  # bottom-up
    return header, arr.tobytes()


def decode_saga(header: str, data: bytes) -> tuple[GridConfig, np.ndarray]:
    rows = cols = None
    west = south = None
    cellsize = 1.0
    nodata = -99999.0
    dtype_name = "float"
    bo = "<"
    top_to_bottom = False
    for line in header.splitlines():
        if "=" not in line and "\t" not in line:
            continue
        key = line.split("=")[0].replace("\t", " ").strip().lower()
        val = line.split("=", 1)[1].strip() if "=" in line else ""
        if "position_xmin" in key:
            west = float(val)
        elif "position_ymin" in key:
            south = float(val)
        elif "cellcount_x" in key:
            cols = int(float(val))
        elif "cellcount_y" in key:
            rows = int(float(val))
        elif "cellsize" in key:
            cellsize = float(val)
        elif "nodata_value" in key:
            nodata = float(val)
        elif "dataformat" in key:
            lv = val.lower()
            for name in _SAGA_DTYPES:
                if name in lv:
                    dtype_name = name
                    break
        elif "byteorder_big" in key:
            bo = ">" if val.lower().startswith("t") or "msb" in val.lower() else "<"
        elif "toptobottom" in key:
            top_to_bottom = val.lower().startswith("t")
    if None in (rows, cols, west, south):
        raise ValueError("incomplete .sgrd header")
    dt = bo + _SAGA_DTYPES[dtype_name]
    grid = np.frombuffer(data, dtype=dt, count=rows * cols).reshape(rows, cols)
    if not top_to_bottom:
        grid = grid[::-1]
    cfg = GridConfig(rows=rows, cols=cols, north=south + cellsize * rows, west=west,
                     res_x=cellsize, res_y=cellsize, nodata=nodata)
    return cfg, grid.astype(np.float64)
