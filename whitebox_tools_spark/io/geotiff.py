"""GeoTIFF codec: pure struct/numpy, Spark-parallel decode.

Scope (the subset the reference actually reads/writes for single-band
rasters, src/raster/geotiff/mod.rs:214 read_geotiff / :1564 write_geotiff):
- classic TIFF, little- or big-endian (reader); writer emits "II" by
  default with "MM" available for cross-endian tests;
- one sample per pixel; BitsPerSample 8/16/32/64 with SampleFormat
  uint/int/float;
- strip or tile layout; Compression 1 (none), 5 (LZW, early-change),
  8/32946 (zlib deflate), 32773 (PackBits) — the reference's full
  decoder set (geotiff/mod.rs:424-432); the writer emits none/LZW/deflate
  (the reference writer emits none only, geotiff/mod.rs:1959-1965);
- Predictor 2 (horizontal differencing, integer samples) on read —
  the reference un-diffs it post-decode (geotiff/mod.rs:1526-1540);
  here it is undone per strip/tile row per component, modular in the
  sample dtype (spec-exact). The writer can also EMIT predictor 2
  (``predictor=2``), which typically shrinks deflate DEMs
  substantially — the reference writer never does;
- BigTIFF (version 43, the reference's geotiff/mod.rs:50-62 read path):
  read and write — same IFD walk with 8-byte offsets/counts and LONG8
  strip tables;
- georeferencing via ModelPixelScaleTag (33550) + ModelTiepointTag
  (33922) and nodata via GDAL_NODATA (42113) — the same three tags the
  reference keys on (geotiff/mod.rs:475,520,526);
- CRS via the GeoKeyDirectoryTag (34735): the EPSG code is read with
  the reference's find_epsg_code scan (geokeys.rs:120-145) into
  GridConfig.epsg and written back as the reference's minimal key set
  (GTModelType + GTRasterType PixelIsArea + Geographic/ProjectedCSType,
  geotiff/mod.rs:2274-2460).

- paletted (PhotometricInterpretation 3) read: ColorMap 16-bit channels
  rescaled to 8-bit and ARGB-packed per pixel, the reference's
  Categorical convention (geotiff/mod.rs:761-787 palette build,
  :1289-1297 pixel mapping); the writer can emit paletted u8 grids too
  (``palette=``), which the reference writer cannot.

- JPEG-in-TIFF (Compression 7, TIFF TechNote 2) read AND write via the
  in-repo T.81 codec (operators/jpeg_codec.py): read accepts
  self-contained or JPEGTables-abbreviated (tag 347) strips/tiles for
  grayscale and YCbCr imagery; the writer emits self-contained baseline
  strips (``compression=7, jpeg_quality=``, uint8 only). The reference
  rejects this variant outright (geotiff/mod.rs:424-432) — this
  exceeds it.

Out of scope (rejected with a clear error, like the reference's
unsupported-variant errors): the floating-point predictor (3).
"""

from __future__ import annotations

import dataclasses
import io as _io
import math
import os
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.operators.gridding import GridConfig

# TIFF tag ids used (TIFF 6.0 spec)
_NEW_SUBFILE_TYPE = 254
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_PREDICTOR = 317
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_COLOR_MAP = 320
_SAMPLE_FORMAT = 339
_JPEG_TABLES = 347
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEOKEY_DIRECTORY = 34735
_GDAL_NODATA = 42113

# GeoKey ids (GeoTIFF 1.1 spec §6.2; reference geokeys.rs key tables)
_GK_MODEL_TYPE = 1024  # 1 = projected, 2 = geographic, 0 = unknown
_GK_RASTER_TYPE = 1025  # 1 = PixelIsArea (the reference's default)
_GK_GEOGRAPHIC_TYPE = 2048
_GK_PROJECTED_CS = 3072


def _epsg_from_geokeys(tags: dict) -> int:
    """EPSG code from the GeoKeyDirectory, mirroring the reference's
    find_epsg_code scan (geokeys.rs:120-145): any GeographicTypeGeoKey
    (2048) or ProjectedCSTypeGeoKey (3072) entry carries the code
    inline; last match wins."""
    d = tags.get(_GEOKEY_DIRECTORY)
    if not d or len(d) < 4:
        return 0
    nkeys = int(d[3])
    epsg = 0
    for k in range(nkeys):
        off = 4 + k * 4
        if off + 4 > len(d):
            break
        key, loc, _cnt, val = (int(v) for v in d[off:off + 4])
        if key in (_GK_PROJECTED_CS, _GK_GEOGRAPHIC_TYPE) and loc == 0:
            epsg = val
    return epsg


# projected CRS codes inside the otherwise-geographic EPSG 4000-4999
# block: World Equidistant Cylindrical (4087/4088), NAD83(HARN)/Guam
# Map Grid (4414), Katanga 1955/Katanga Lambert (4415), Pulkovo
# Gauss-Kruger zones (4417, 4434), NAD27 state planes (4455-4457),
# and Mexico ITRF92 / UTM zones (4484-4497). The reference resolves
# geographic-vs-projected from its full EPSG keyword tables; this set
# covers the known projected 4xxx outliers — any OTHER projected code
# in the 4xxx block must be written with epsg_geographic=False.
# Projected CRSs inside the (mostly geographic) EPSG 4xxx block. A
# curated high-confidence list, NOT a full registry resolution: the
# 4xxx block mixes in many projected codes (Kertau grids, BLM zones,
# CGCS2000/New Beijing Gauss-Kruger, ...). A 4xxx projected code not
# listed here is inferred geographic — callers with such codes must
# pass GridConfig.epsg_geographic=False explicitly (the flag always
# wins over this inference).
_PROJECTED_IN_4XXX = frozenset(
    {4026,                    # MOLDREF99 / Moldova TM
     4037, 4038,              # WGS 84 / TMzn35N-36N
     4087, 4088,              # WGS 84 World Equidistant Cylindrical
     4093, 4094, 4095, 4096,  # ETRS89 / DKTM1-4
     4414,                    # NAD83(HARN) / Guam Map Grid
     4415,                    # Katanga 1955 / Katanga Lambert
     4417, 4434,              # Pulkovo 1942 / Gauss-Kruger zones
     4437,                    # NAD83(NSRS2007) / Puerto Rico & VI
     4455, 4456, 4457}        # NAD27 state-plane zones
    | set(range(4390, 4399))  # Kertau 1968 / Malaysia state grids
    | set(range(4484, 4491))  # Mexico ITRF92 / UTM zones 11N-17N
    | set(range(4491, 4555))  # CGCS2000 / Gauss-Kruger zones + CM
    | set(range(4568, 4590))  # New Beijing / Gauss-Kruger zones + CM
)
# common geographic CRS codes OUTSIDE the 4xxx block (NAD83(2011/PA11/
# MA11), GDA2020)
_GEOGRAPHIC_OUTSIDE_4XXX = frozenset({6318, 6322, 6325, 7844})


def _geokey_directory_values(epsg: int, geographic: bool | None = None) -> tuple[int, ...]:
    """GeoKeyDirectory SHORT array for a bare-EPSG CRS: header
    (KeyDirectoryVersion 1, revision 1.0, nkeys) + GTModelType +
    GTRasterType(PixelIsArea) + the Geographic/ProjectedCSType key —
    the same minimal key set the reference writer emits
    (geotiff/mod.rs:2274-2460). The reference resolves geographic vs
    projected from its full EPSG keyword tables (mod.rs:2251-2344);
    here ``geographic=None`` infers it (4000-4999 block minus the known
    projected exceptions, plus the common modern geographic codes) and
    callers with exotic codes pass the flag explicitly via
    GridConfig.epsg_geographic."""
    if geographic is None:
        geographic = (
            4000 <= epsg < 5000 and epsg not in _PROJECTED_IN_4XXX
        ) or epsg in _GEOGRAPHIC_OUTSIDE_4XXX
    keys = [
        (_GK_MODEL_TYPE, 0, 1, 2 if geographic else 1),
        (_GK_RASTER_TYPE, 0, 1, 1),
        (_GK_GEOGRAPHIC_TYPE if geographic else _GK_PROJECTED_CS, 0, 1, epsg),
    ]
    vals = [1, 1, 0, len(keys)]
    for entry in keys:
        vals.extend(entry)
    return tuple(vals)

# TIFF field types -> (struct code, size); 16/17/18 are the BigTIFF
# 8-byte LONG8/SLONG8/IFD8 types (BigTIFF spec, version 43)
_FIELD = {1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
          6: ("b", 1), 7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 11: ("f", 4),
          12: ("d", 8), 16: ("Q", 8), 17: ("q", 8), 18: ("Q", 8)}

_DTYPES = {  # (sample_format, bits) -> numpy dtype char (endian applied later)
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}


# ------------------------------------------------------------------ decode

def _read_ifd_entries(
    buf: bytes, off: int, bo: str, big: bool = False
) -> dict[int, tuple]:
    """Walk one IFD. ``big`` selects the BigTIFF layout: u8 entry count,
    20-byte entries (u8 value count), 8-byte inline value area — the same
    walk with wider offsets (BigTIFF spec §Structure)."""
    if big:
        (n,) = struct.unpack_from(bo + "Q", buf, off)
        base, stride, inline, cnt_code, val_skip = off + 8, 20, 8, "HHQ", 12
    else:
        (n,) = struct.unpack_from(bo + "H", buf, off)
        base, stride, inline, cnt_code, val_skip = off + 2, 12, 4, "HHI", 8
    # malformed-input guards (fuzz-found): a corrupt entry count or a
    # corrupt per-entry value count would otherwise drive a
    # multi-gigabyte struct format build / allocation before any
    # unpack raises — validate every extent against the buffer first
    if base + stride * n > len(buf):
        raise ValueError(
            f"TIFF IFD claims {n} entries past the end of the file")
    entries: dict[int, tuple] = {}
    for i in range(n):
        tag, ftype, count = struct.unpack_from(bo + cnt_code, buf, base + stride * i)
        if ftype not in _FIELD:
            continue
        code, size = _FIELD[ftype]
        total = size * count
        voff = base + stride * i + val_skip
        if total > inline:
            (voff,) = struct.unpack_from(bo + ("Q" if big else "I"), buf, voff)
        if voff + total > len(buf):
            raise ValueError(
                f"TIFF IFD entry tag {tag} value ({count} x {size} B at "
                f"offset {voff}) runs past the end of the file")
        if ftype == 2:  # ASCII
            entries[tag] = (buf[voff:voff + count].split(b"\0")[0].decode("ascii", "replace"),)
        elif ftype == 7:  # UNDEFINED: opaque bytes (e.g. JPEGTables)
            entries[tag] = (buf[voff:voff + count],)
        elif ftype == 5:  # RATIONAL
            vals = struct.unpack_from(bo + "I" * (2 * count), buf, voff)
            entries[tag] = tuple(vals[2 * j] / max(vals[2 * j + 1], 1) for j in range(count))
        else:
            entries[tag] = struct.unpack_from(bo + code * count, buf, voff)
    return entries


def _unpackbits(chunk: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9; reference geotiff/mod.rs PACKBITS arm)."""
    out = bytearray()
    i, n = 0, len(chunk)
    while i < n:
        h = chunk[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += chunk[i:i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += chunk[i:i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def _packbits(raw: bytes, row_bytes: int) -> bytes:
    """PackBits RLE encode (TIFF 6.0 §9). Each row is packed separately
    as the spec directs ("pack each row separately") — decode is
    boundary-agnostic, so `_unpackbits` reads the concatenation back
    verbatim. Greedy: replicate runs of >= 2 (max 128), literals
    otherwise (max 128 per control byte)."""
    out = bytearray()
    for r0 in range(0, len(raw), row_bytes):
        row = raw[r0:r0 + row_bytes]
        i, n = 0, len(row)
        while i < n:
            # measure the run at i
            j = i + 1
            while j < n and j - i < 128 and row[j] == row[i]:
                j += 1
            if j - i >= 2:
                out.append(257 - (j - i))
                out.append(row[i])
                i = j
                continue
            # literal: until the next >=3 run or 128 bytes
            lit = i
            while i < n and i - lit < 128:
                if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                    break
                i += 1
            out.append(i - lit - 1)
            out += row[lit:i]
    return bytes(out)


def _unlzw(chunk: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first codes, early-change; TIFF 6.0 §13 —
    the reference decoder's LZW arm, geotiff/mod.rs:424-432)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in chunk:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # early-change width step, at the de-facto libtiff/javax.
            # imageio timing: the code AFTER the table reaches 2^w - 1
            # entries is read at w+1 bits. (Round 5 found the previous
            # rule here widened one code early — self-consistent with
            # the old encoder but misreading REAL LZW TIFFs; pinned
            # against a javax.imageio-written file in
            # tests/test_image_interop.py.)
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _lzw_compress(data: bytes) -> bytes:
    """TIFF-variant LZW encode (MSB-first, early-change widths, CLEAR
    reset before the 12-bit table fills) — the writer-side complement of
    :func:`_unlzw`. The reference writer never compresses at all
    (geotiff/mod.rs:1959-1965 COMPRESS_NONE), so this exceeds it."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, wd: int) -> None:
        nonlocal buf, nbits
        buf = (buf << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
            buf &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    w = b""
    for i in range(len(data)):
        ch = data[i:i + 1]
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early-change width step at the libtiff/javax.imageio timing:
        # the decoder's table lags the encoder's by ONE entry (it adds
        # nothing for the first code after CLEAR), so the encoder
        # widens when ITS next_code reaches 2^w — at that moment the
        # decoder's table has just reached 2^w - 1 and it reads the
        # next code at w+1 bits. (Round 5: the previous `2^w - 1` rule
        # here widened one code early; roundtrips passed while real
        # decoders — javax.imageio, libtiff — desynced mid-strip.)
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4094:  # 12-bit table full: reset both sides
            emit(CLEAR, width)
            table = {bytes([j]): j for j in range(256)}
            next_code, width = 258, 9
        w = ch
    if w:
        emit(table[w], width)
        # The decoder adds one table entry after this final data code
        # (the encoder does not), catching its table up to next_code —
        # so if that lands exactly on 2^w - 1, EOI must be emitted at
        # the widened width or strict EOI-honoring decoders misread it.
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(EOI, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _decompress(chunk: bytes, compression: int) -> bytes:
    if compression == 1:
        return chunk
    if compression == 8 or compression == 32946:  # deflate (Adobe / legacy)
        return zlib.decompress(chunk)
    if compression == 32773:  # PackBits
        return _unpackbits(chunk)
    if compression == 5:  # LZW
        return _unlzw(chunk)
    raise ValueError(f"unsupported TIFF compression {compression}")


def _undiff(block: np.ndarray) -> np.ndarray:
    """Undo horizontal differencing (Predictor 2): cumulative sum along
    each row, per sample component, modular in the sample dtype (TIFF 6.0
    §14; the reference un-diffs post-decode, geotiff/mod.rs:1526-1540)."""
    native = block.dtype.newbyteorder("=")
    return np.cumsum(block.astype(native), axis=1, dtype=native)


def decode_geotiff(data: bytes) -> tuple[GridConfig, np.ndarray]:
    """Decode single-band GeoTIFF bytes -> (GridConfig, 2-D float64)."""
    cfg, arr = decode_geotiff_multi(data)
    if arr.shape[2] != 1:
        raise ValueError(
            f"multi-band file ({arr.shape[2]} samples/pixel); use decode_geotiff_multi"
        )
    return cfg, arr[:, :, 0]


def _ifd_chain(data: bytes) -> tuple[str, bool, list[int]]:
    """Parse the TIFF header and follow the next-IFD chain ->
    (byteorder, is_bigtiff, [ifd offsets]). Multi-IFD files are how
    overview pyramids (the Cloud-Optimized GeoTIFF shape) are stored."""
    magic = data[:2]
    if magic == b"II":
        bo = "<"
    elif magic == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file (bad byte-order mark)")
    (version,) = struct.unpack_from(bo + "H", data, 2)
    if version == 43:  # BigTIFF: 8-byte offset size marker, then u8 IFD offset
        osize, zero = struct.unpack_from(bo + "HH", data, 4)
        if osize != 8 or zero != 0:
            raise ValueError(f"bad BigTIFF header (offset size {osize})")
        (off,) = struct.unpack_from(bo + "Q", data, 8)
        big = True
    elif version == 42:
        (off,) = struct.unpack_from(bo + "I", data, 4)
        big = False
    else:
        raise ValueError(f"bad TIFF version {version}")
    offs: list[int] = []
    while off:
        if off in offs or len(offs) > 64:
            raise ValueError("TIFF IFD chain loops")
        offs.append(off)
        if big:
            (n,) = struct.unpack_from(bo + "Q", data, off)
            (off,) = struct.unpack_from(bo + "Q", data, off + 8 + 20 * n)
        else:
            (n,) = struct.unpack_from(bo + "H", data, off)
            (off,) = struct.unpack_from(bo + "I", data, off + 2 + 12 * n)
    return bo, big, offs


def count_overviews(data: bytes) -> int:
    """Number of reduced-resolution IFDs after the primary one."""
    return len(_ifd_chain(data)[2]) - 1


def decode_geotiff_multi(
    data: bytes, ifd: int = 0
) -> tuple[GridConfig, np.ndarray]:
    """Decode GeoTIFF bytes -> (GridConfig, (h, w, samples) float64 array;
    nodata left as the raw value so callers choose the sentinel policy).
    Chunky (PlanarConfig 1) layout, equal bits/format across samples —
    the reference's RGB(A) composite shape. ``ifd`` selects the IFD in a
    multi-IFD file (0 = full resolution; k = overview level k in a
    COG-style pyramid)."""
    bo, big, offs = _ifd_chain(data)
    if not 0 <= ifd < len(offs):
        raise ValueError(f"IFD {ifd} out of range (file has {len(offs)})")
    tags = _read_ifd_entries(data, offs[ifd], bo, big=big)

    width = int(tags[_IMAGE_WIDTH][0])
    height = int(tags[_IMAGE_LENGTH][0])
    bits = int(tags.get(_BITS_PER_SAMPLE, (32,))[0])
    compression = int(tags.get(_COMPRESSION, (1,))[0])
    spp = int(tags.get(_SAMPLES_PER_PIXEL, (1,))[0])
    sfmt = int(tags.get(_SAMPLE_FORMAT, (1,))[0])
    planar = int(tags.get(_PLANAR_CONFIG, (1,))[0])
    predictor = int(tags.get(_PREDICTOR, (1,))[0])
    photometric = int(tags.get(_PHOTOMETRIC, (1,))[0])
    if spp > 1 and planar != 1:
        raise ValueError("only chunky (PlanarConfiguration=1) multiband supported")
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} not supported")
    if predictor == 2 and sfmt == 3:
        raise ValueError("TIFF predictor 2 applies to integer samples only")
    lut = None
    if photometric == 3:  # paletted (reference geotiff/mod.rs:761-787)
        cm = tags.get(_COLOR_MAP)
        if cm is None:
            raise ValueError("Colour map not present in Paletted TIFF.")
        ncol = len(cm) // 3
        if len(cm) % 3 != 0 or ncol == 0 or ncol > 256:
            raise ValueError("bad ColorMap length")
        if bits != 8 or spp != 1:
            raise ValueError("only 8-bit single-sample paletted TIFF supported")
        c16 = np.asarray(cm, dtype=np.float64)
        # 16-bit channels rescaled to 8-bit, truncating like the
        # reference's `as u32` casts, then ARGB-packed (a = 255)
        r = (c16[:ncol] / 65535.0 * 255.0).astype(np.uint32)
        g = (c16[ncol:2 * ncol] / 65535.0 * 255.0).astype(np.uint32)
        b = (c16[2 * ncol:] / 65535.0 * 255.0).astype(np.uint32)
        lut = ((np.uint32(255) << 24) | (r << 16) | (g << 8) | b).astype(
            np.float64
        )
    key = (sfmt, bits)
    if key not in _DTYPES:
        raise ValueError(f"unsupported sample format/bits {key}")
    dt = np.dtype(bo + _DTYPES[key])

    jpeg_tables = None
    if compression == 7:
        # JPEG-in-TIFF (TechNote 2): each strip/tile is a JPEG image
        # stream, optionally abbreviated against the shared JPEGTables
        # tag. The reference rejects this variant (geotiff/mod.rs:
        # 424-432) — this exceeds it via the in-repo T.81 codec.
        if bits != 8 or sfmt != 1:
            raise ValueError("JPEG-in-TIFF requires 8-bit unsigned samples")
        if predictor == 2:
            raise ValueError("TIFF predictor does not apply to JPEG strips")
        if photometric not in (1, 6) or spp not in (1, 3):
            raise ValueError(
                "JPEG-in-TIFF supported for grayscale (photometric 1) or "
                f"YCbCr (photometric 6) only, got photometric {photometric} "
                f"with {spp} samples/pixel")
        if _JPEG_TABLES in tags:
            jpeg_tables = bytes(tags[_JPEG_TABLES][0])

    def _jpeg_chunk(chunk: bytes, nrows: int, ncols: int) -> np.ndarray:
        from whitebox_tools_spark.operators.jpeg_codec import decode_jpeg

        img = decode_jpeg(chunk, tables=jpeg_tables)
        if img.shape[2] != spp:
            raise ValueError(
                f"JPEG strip has {img.shape[2]} components, IFD says {spp}")
        if img.shape[0] < nrows or img.shape[1] < ncols:
            raise ValueError("JPEG strip smaller than its raster window")
        return img[:nrows, :ncols]

    # malformed-dimension guard (fuzz-found): a corrupt ImageWidth /
    # ImageLength would otherwise allocate a grid of hundreds of GB
    # before any chunk read fails. Bound the decoded size by what the
    # file could plausibly hold: 10,000x is far beyond any real
    # deflate/LZW ratio, and the 256 MB floor keeps tiny files with
    # legitimately huge constant rasters decodable.
    decoded_bytes = height * width * spp * dt.itemsize
    if decoded_bytes > max(len(data) * 10_000, 1 << 28):
        raise ValueError(
            f"TIFF claims a {height}x{width}x{spp} raster "
            f"({decoded_bytes} B decoded) from a {len(data)}-byte file")
    grid = np.empty((height, width, spp), dtype=dt)
    if _TILE_OFFSETS in tags:
        tw = int(tags[_TILE_WIDTH][0])
        th = int(tags[_TILE_LENGTH][0])
        offs = tags[_TILE_OFFSETS]
        cnts = tags[_TILE_BYTE_COUNTS]
        tiles_across = math.ceil(width / tw)
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            r0 = (idx // tiles_across) * th
            c0 = (idx % tiles_across) * tw
            nr, nc = min(th, height - r0), min(tw, width - c0)
            if compression == 7:
                grid[r0:r0 + nr, c0:c0 + nc] = _jpeg_chunk(
                    data[o:o + c], nr, nc)
                continue
            raw = _decompress(data[o:o + c], compression)
            tile = np.frombuffer(raw, dtype=dt, count=tw * th * spp).reshape(
                th, tw, spp
            )
            if predictor == 2:
                tile = _undiff(tile)
            grid[r0:r0 + nr, c0:c0 + nc] = tile[:nr, :nc]
    else:
        rps = int(tags.get(_ROWS_PER_STRIP, (height,))[0])
        offs = tags[_STRIP_OFFSETS]
        cnts = tags[_STRIP_BYTE_COUNTS]
        r = 0
        for o, c in zip(offs, cnts):
            nrows = min(rps, height - r)
            if compression == 7:
                grid[r:r + nrows] = _jpeg_chunk(data[o:o + c], nrows, width)
                r += nrows
                continue
            raw = _decompress(data[o:o + c], compression)
            strip = np.frombuffer(
                raw, dtype=dt, count=nrows * width * spp
            ).reshape(nrows, width, spp)
            grid[r:r + nrows] = _undiff(strip) if predictor == 2 else strip
            r += nrows
    if lut is not None:
        # index out-of-palette guard, then palette[index] as f64 — the
        # reference's paletted pixel convention (geotiff/mod.rs:1289-1297)
        idx = grid.astype(np.int64)
        if idx.max(initial=0) >= len(lut):
            raise ValueError("paletted pixel index out of ColorMap range")
        # a pathological SampleFormat=2 (signed) paletted file would
        # otherwise pass the max() guard and numpy negative indexing
        # would silently wrap to the palette tail (ADVICE r4 #3)
        if idx.min(initial=0) < 0:
            raise ValueError("paletted pixel index negative (signed "
                             "SampleFormat in a Paletted TIFF)")
        arr = lut[idx]
    else:
        arr = grid.astype(np.float64)

    # georeference: tiepoint maps raster (i,j,k)->(X,Y,Z) at the pixel
    # *corner*; north = tiepoint Y + tiepoint_row * res_y, matching the
    # reference's interpretation (geotiff/mod.rs:569-571).
    scale = tags.get(_MODEL_PIXEL_SCALE, (1.0, 1.0, 0.0))
    tie = tags.get(_MODEL_TIEPOINT, (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    res_x, res_y = float(scale[0]), float(scale[1])
    west = float(tie[3]) - float(tie[0]) * res_x
    north = float(tie[4]) + float(tie[1]) * res_y
    nodata = -32768.0
    if _GDAL_NODATA in tags:
        try:
            nodata = float(str(tags[_GDAL_NODATA][0]).strip())
        except ValueError:
            pass
    cfg = GridConfig(rows=height, cols=width, north=north, west=west,
                     res_x=res_x, res_y=res_y, nodata=nodata,
                     epsg=_epsg_from_geokeys(tags))
    return cfg, arr


_TAG_NAMES = {
    256: "ImageWidth", 257: "ImageLength", 258: "BitsPerSample",
    259: "Compression", 262: "PhotometricInterpretation", 273: "StripOffsets",
    277: "SamplesPerPixel", 278: "RowsPerStrip", 279: "StripByteCounts",
    284: "PlanarConfiguration", 317: "Predictor", 320: "ColorMap",
    322: "TileWidth",
    323: "TileLength", 324: "TileOffsets", 325: "TileByteCounts",
    339: "SampleFormat", 347: "JPEGTables", 33550: "ModelPixelScaleTag",
    33922: "ModelTiepointTag", 34735: "GeoKeyDirectoryTag",
    34736: "GeoDoubleParamsTag", 34737: "GeoAsciiParamsTag",
    42113: "GDAL_NODATA",
}


def print_geotiff_tags(data: bytes) -> dict[str, tuple]:
    """Named IFD tag dump (PrintGeoTiffTags, src/tools/data_tools/
    print_geotiff_tags.rs): tag name -> decoded values."""
    magic = data[:2]
    bo = "<" if magic == b"II" else ">" if magic == b"MM" else None
    if bo is None:
        raise ValueError("not a TIFF file")
    (version,) = struct.unpack_from(bo + "H", data, 2)
    if version == 43:
        (ifd_off,) = struct.unpack_from(bo + "Q", data, 8)
        tags = _read_ifd_entries(data, ifd_off, bo, big=True)
    else:
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
        tags = _read_ifd_entries(data, ifd_off, bo)
    return {_TAG_NAMES.get(t, f"Tag{t}"): v for t, v in sorted(tags.items())}


# ------------------------------------------------------------------ encode

def _np_to_tiff_type(arr: np.ndarray) -> tuple[int, int]:
    k = arr.dtype.kind
    bits = arr.dtype.itemsize * 8
    sfmt = {"u": 1, "i": 2, "f": 3}[k]
    if (sfmt, bits) not in _DTYPES:
        raise ValueError(f"cannot encode dtype {arr.dtype} as GeoTIFF")
    return sfmt, bits


def encode_geotiff(
    grid: np.ndarray,
    cfg: GridConfig,
    compression: int = 8,
    rows_per_strip: int = 64,
    byteorder: str = "<",
    big: bool = False,
    predictor: int = 1,
    palette: np.ndarray | None = None,
    jpeg_quality: int = 90,
    tile: tuple[int, int] | None = None,
    reduced: bool = False,
) -> bytes:
    """Encode a numpy array as GeoTIFF bytes (strips): 2-D -> single
    band; 3-D (h, w, s) -> s samples/pixel, chunky (PlanarConfig 1) —
    the layout the reference's RGB composites use. ``big=True`` emits
    BigTIFF (version 43: 8-byte offsets, 20-byte IFD entries, LONG8
    strip tables) so files past 4 GiB stay addressable. ``predictor=2``
    (integer samples only) stores horizontal differences per strip row —
    usually a large deflate/LZW-size win on smooth rasters.
    ``tile=(tw, th)`` (multiples of 16, TIFF 6.0 §15) switches to the
    tiled layout (TileWidth/TileLength/TileOffsets/TileByteCounts — the
    GDAL/COG shape) with edge tiles padded by replication; composes
    with every compression including JPEG, and with ``big=True``."""
    if grid.ndim not in (2, 3):
        raise ValueError("grid must be 2-D or 3-D (h, w, samples)")
    if compression not in (1, 5, 7, 8, 32773):
        # only emit labels the writer actually compresses — anything
        # else would mislabel raw strips as compressed (ADVICE r3)
        raise ValueError(
            "writer supports compression 1 (none), 5 (LZW), 7 (JPEG), "
            f"8 (deflate) or 32773 (PackBits), got {compression}"
        )
    if predictor not in (1, 2):
        raise ValueError(f"writer supports predictor 1 or 2, got {predictor}")
    if predictor == 2 and grid.dtype.kind == "f":
        raise ValueError("predictor 2 applies to integer samples only")
    if compression == 7:
        # JPEG-in-TIFF (TechNote 2): every strip is a complete baseline
        # JPEG stream from the in-repo T.81 codec (no JPEGTables tag —
        # self-contained strips, which every reader accepts). Lossy:
        # imagery path, not a DEM path.
        if grid.dtype != np.uint8:
            raise ValueError("JPEG compression requires uint8 samples")
        if grid.ndim == 3 and grid.shape[2] != 3:
            raise ValueError("JPEG compression supports 1 or 3 samples/pixel")
        if predictor == 2:
            raise ValueError("TIFF predictor does not apply to JPEG strips")
        if palette is not None:
            raise ValueError("JPEG compression cannot carry a palette")
    if palette is not None:
        palette = np.asarray(palette, dtype=np.uint16)
        if grid.ndim != 2 or grid.dtype != np.uint8:
            raise ValueError("paletted encode expects a 2-D uint8 index grid")
        if palette.ndim != 2 or palette.shape[1] != 3 or not (
            0 < palette.shape[0] <= 256
        ):
            raise ValueError("palette must be (n<=256, 3) 16-bit channels")
        if int(grid.max(initial=0)) >= palette.shape[0]:
            raise ValueError("index grid references beyond the palette")
    if tile is not None:
        tw_, th_ = tile
        # TIFF 6.0 §15: tile dimensions must be multiples of 16
        if tw_ <= 0 or th_ <= 0 or tw_ % 16 or th_ % 16:
            raise ValueError(
                f"tile dimensions must be positive multiples of 16, got {tile}")
    sfmt, bits = _np_to_tiff_type(grid)
    bo = byteorder
    grid = np.ascontiguousarray(grid, dtype=grid.dtype.newbyteorder(bo))
    height, width = grid.shape[:2]
    spp = 1 if grid.ndim == 2 else grid.shape[2]
    rps = min(rows_per_strip, height)

    if tile is not None:
        # tiled layout (the GDAL/COG shape): row-major tw_ x th_ blocks,
        # edge tiles padded by replication to the full tile size (§15 —
        # tiles are always complete; the reader crops)
        blocks = []
        for ty in range(math.ceil(height / th_)):
            for tx in range(math.ceil(width / tw_)):
                blk = grid[ty * th_:(ty + 1) * th_, tx * tw_:(tx + 1) * tw_]
                pr, pc = th_ - blk.shape[0], tw_ - blk.shape[1]
                if pr or pc:
                    pad = ((0, pr), (0, pc)) + (
                        ((0, 0),) if grid.ndim == 3 else ())
                    blk = np.pad(blk, pad, mode="edge")
                blocks.append(blk)
    else:
        blocks = [grid[s * rps:(s + 1) * rps]
                  for s in range(math.ceil(height / rps))]
    nstrips = len(blocks)

    strips = []
    for block in blocks:
        if predictor == 2:
            d = block.copy()
            if block.ndim == 2:
                d[:, 1:] = block[:, 1:] - block[:, :-1]
            else:
                d[:, 1:, :] = block[:, 1:, :] - block[:, :-1, :]
            block = d
        if compression == 7:
            from whitebox_tools_spark.operators.jpeg_codec import encode_jpeg

            strips.append(encode_jpeg(
                np.ascontiguousarray(block), quality=jpeg_quality))
            continue
        raw = block.tobytes()
        if compression == 8:
            strips.append(zlib.compress(raw, 6))
        elif compression == 5:
            strips.append(_lzw_compress(raw))
        elif compression == 32773:
            row_bytes = block.shape[1] * spp * grid.dtype.itemsize
            strips.append(_packbits(raw, row_bytes))
        else:
            strips.append(raw)

    nodata_ascii = (repr(float(cfg.nodata)) + "\0").encode("ascii")
    scale = struct.pack(bo + "3d", float(cfg.res_x), float(cfg.res_y), 0.0)
    tie = struct.pack(bo + "6d", 0.0, 0.0, 0.0, float(cfg.west), float(cfg.north), 0.0)

    # layout: header (8 classic / 16 big) | IFD | out-of-line values |
    # strip data. BigTIFF widens every offset/count to 8 bytes and uses
    # LONG8 (type 16) strip tables.
    off_code = "Q" if big else "I"  # offset/count struct code
    off_type = 16 if big else 4  # TIFF field type for strip tables
    esz = 8 if big else 4  # bytes per offset
    inline = 8 if big else 4  # inline value area size

    tags = []  # (tag, type, count, value_bytes_or_None)

    def _short(tag, v):
        tags.append((tag, 3, 1, struct.pack(bo + "H", v)))

    def _long(tag, v):
        tags.append((tag, 4, 1, struct.pack(bo + "I", v)))

    if reduced:  # NewSubfileType: reduced-resolution overview IFD
        _long(_NEW_SUBFILE_TYPE, 1)
    _long(_IMAGE_WIDTH, width)
    _long(_IMAGE_LENGTH, height)
    if spp == 1:
        _short(_BITS_PER_SAMPLE, bits)
    else:
        tags.append((_BITS_PER_SAMPLE, 3, spp,
                     struct.pack(bo + "H" * spp, *([bits] * spp))))
    _short(_COMPRESSION, compression)
    if palette is not None:
        _short(_PHOTOMETRIC, 3)
        planes = np.concatenate(
            [palette[:, 0], palette[:, 1], palette[:, 2]]
        ).astype(np.uint64)
        tags.append((_COLOR_MAP, 3, 3 * palette.shape[0],
                     struct.pack(bo + "H" * (3 * palette.shape[0]),
                                 *(int(v) for v in planes))))
    elif compression == 7 and spp >= 3:
        _short(_PHOTOMETRIC, 6)  # colour JPEG strips store YCbCr
    else:
        _short(_PHOTOMETRIC, 2 if spp >= 3 else 1)
    off_tag = _TILE_OFFSETS if tile is not None else _STRIP_OFFSETS
    cnt_tag = _TILE_BYTE_COUNTS if tile is not None else _STRIP_BYTE_COUNTS
    tags.append((off_tag, off_type, nstrips, None))  # patched below
    _short(_SAMPLES_PER_PIXEL, spp)
    if tile is not None:
        _long(_TILE_WIDTH, tw_)
        _long(_TILE_LENGTH, th_)
    else:
        _long(_ROWS_PER_STRIP, rps)
    tags.append((cnt_tag, off_type, nstrips, None))
    _short(_PLANAR_CONFIG, 1)
    if predictor == 2:
        _short(_PREDICTOR, 2)
    if spp == 1:
        _short(_SAMPLE_FORMAT, sfmt)
    else:
        tags.append((_SAMPLE_FORMAT, 3, spp,
                     struct.pack(bo + "H" * spp, *([sfmt] * spp))))
    tags.append((_MODEL_PIXEL_SCALE, 12, 3, scale))
    tags.append((_MODEL_TIEPOINT, 12, 6, tie))
    if cfg.epsg:
        gk = _geokey_directory_values(
            int(cfg.epsg), getattr(cfg, "epsg_geographic", None)
        )
        tags.append((_GEOKEY_DIRECTORY, 3, len(gk),
                     struct.pack(bo + "H" * len(gk), *gk)))
    tags.append((_GDAL_NODATA, 2, len(nodata_ascii), nodata_ascii))
    tags.sort(key=lambda t: t[0])

    n = len(tags)
    if big:
        ifd_off = 16
        ifd_size = 8 + 20 * n + 8  # u8 count, 20-byte entries, u8 next-IFD
    else:
        ifd_off = 8
        ifd_size = 2 + 12 * n + 4
    extra_off = ifd_off + ifd_size

    # out-of-line region: strip offsets table, byte counts table, then
    # any tag value larger than the inline area
    counts_b = struct.pack(bo + off_code * nstrips, *(len(s) for s in strips))
    offsets_pos = extra_off
    counts_pos = offsets_pos + esz * nstrips
    extra = bytearray()
    extra += b"\0" * (esz * nstrips)  # placeholder for offsets
    extra += counts_b
    value_pos: dict[int, int] = {}
    for tag, ftype, count, val in tags:
        if val is not None and len(val) > inline:
            if len(extra) & 1:  # TIFF 6.0: values begin on word boundaries
                extra += b"\0"
            value_pos[tag] = extra_off + len(extra)
            extra += val

    if len(extra) & 1:  # keep strip offsets word-aligned too
        extra += b"\0"
    data_off = extra_off + len(extra)
    strip_offsets = []
    p = data_off
    for s in strips:
        strip_offsets.append(p)
        p += len(s)
    extra[0:esz * nstrips] = struct.pack(bo + off_code * nstrips, *strip_offsets)

    out = _io.BytesIO()
    if big:
        out.write((b"II" if bo == "<" else b"MM")
                  + struct.pack(bo + "3H", 43, 8, 0))
        out.write(struct.pack(bo + "Q", ifd_off))
        out.write(struct.pack(bo + "Q", n))
    else:
        out.write((b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42))
        out.write(struct.pack(bo + "I", ifd_off))
        out.write(struct.pack(bo + "H", n))
    cnt_code = "Q" if big else "I"
    for tag, ftype, count, val in tags:
        out.write(struct.pack(bo + "HH" + cnt_code, tag, ftype, count))
        if tag == off_tag:
            out.write(struct.pack(
                bo + off_code,
                strip_offsets[0] if nstrips == 1 else offsets_pos))
        elif tag == cnt_tag:
            out.write(struct.pack(
                bo + off_code,
                len(strips[0]) if nstrips == 1 else counts_pos))
        elif len(val) <= inline:
            out.write(val + b"\0" * (inline - len(val)))
        else:
            out.write(struct.pack(bo + off_code, value_pos[tag]))
    out.write(struct.pack(bo + off_code, 0))  # next IFD
    out.write(bytes(extra))
    for s in strips:
        out.write(s)
    return out.getvalue()


def _downsample2(grid: np.ndarray, resample: str) -> np.ndarray:
    """One 2x overview level. 'nearest' keeps the top-left sample of
    each 2x2 block (exact, any dtype — the categorical/DEM choice);
    'mean' block-averages with edge blocks averaged over what exists
    (the imagery choice), cast back to the input dtype."""
    if resample == "nearest":
        return np.ascontiguousarray(grid[::2, ::2])
    if resample != "mean":
        raise ValueError(f"resample must be 'nearest' or 'mean', got {resample!r}")
    h, w = grid.shape[:2]
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    acc = np.zeros((ph, pw) + grid.shape[2:], np.float64)
    cnt = np.zeros((ph, pw) + (1,) * (grid.ndim - 2), np.float64)
    acc[:h, :w] = grid
    cnt[:h, :w] = 1.0
    s = (acc[0::2, 0::2] + acc[0::2, 1::2] + acc[1::2, 0::2] + acc[1::2, 1::2])
    n = (cnt[0::2, 0::2] + cnt[0::2, 1::2] + cnt[1::2, 0::2] + cnt[1::2, 1::2])
    out = s / n
    if grid.dtype.kind in "iu":
        out = np.round(out)
    return out.astype(grid.dtype.newbyteorder("="))


def _relocate_ifd_part(part: bytes, delta: int, bo: str, big: bool,
                       next_ifd: int) -> bytes:
    """Shift one single-IFD TIFF's body (everything past the header) by
    ``delta`` bytes: out-of-line value pointers and the strip/tile
    offset-table contents are rebased, and the next-IFD pointer is set
    to ``next_ifd``. This is how the COG writer chains independently
    encoded IFD blocks into one file."""
    hdr = 16 if big else 8
    body = bytearray(part[hdr:])
    ifd = 0  # IFD sits immediately after the header in encode_geotiff
    if big:
        (n,) = struct.unpack_from(bo + "Q", body, ifd)
        base, stride, inline, val_skip = ifd + 8, 20, 8, 12
        ocode = "Q"
    else:
        (n,) = struct.unpack_from(bo + "H", body, ifd)
        base, stride, inline, val_skip = ifd + 2, 12, 4, 8
        ocode = "I"
    for i in range(n):
        epos = base + stride * i
        tag, ftype, count = struct.unpack_from(
            bo + ("HHQ" if big else "HHI"), body, epos)
        code, size = _FIELD.get(ftype, ("B", 1))
        total = size * count
        vpos = epos + val_skip
        out_of_line = total > inline
        if out_of_line:
            (ptr,) = struct.unpack_from(bo + ocode, body, vpos)
            struct.pack_into(bo + ocode, body, vpos, ptr + delta)
        if tag in (_STRIP_OFFSETS, _TILE_OFFSETS):
            # the table VALUES are file offsets too
            tpos = (struct.unpack_from(bo + ocode, body, vpos)[0] - hdr
                    if out_of_line else vpos)
            if out_of_line:
                tpos -= delta  # we just rebased the pointer; read original
            vals = struct.unpack_from(bo + code * count, body, tpos)
            struct.pack_into(bo + code * count, body, tpos,
                             *(v + delta for v in vals))
    next_pos = base + stride * n
    struct.pack_into(bo + ocode, body, next_pos, next_ifd)
    return bytes(body)


def encode_geotiff_overviews(
    grid: np.ndarray,
    cfg: GridConfig,
    overviews: int = 2,
    resample: str = "nearest",
    **kw,
) -> bytes:
    """Encode a COG-style overview pyramid: the full-resolution IFD
    followed by ``overviews`` reduced-resolution IFDs (NewSubfileType 1,
    each 2x coarser, resolution doubled in the GridConfig) chained via
    the next-IFD pointers — the layout GDAL's COPY_SRC_OVERVIEWS /
    rio-cogeo produce. Readers that look at the first IFD only (like
    the reference, geotiff/mod.rs single-IFD walk) still read the full
    image; ``decode_geotiff_multi(data, ifd=k)`` opens level k.
    ``**kw`` passes through to :func:`encode_geotiff` (compression,
    tile=, jpeg_quality, big=, ...)."""
    if overviews < 0:
        raise ValueError("overviews must be >= 0")
    big = bool(kw.get("big", False))
    bo = kw.get("byteorder", "<")
    levels: list[tuple[np.ndarray, GridConfig]] = [(grid, cfg)]
    g, c = grid, cfg
    for _ in range(overviews):
        if min(g.shape[:2]) <= 1:
            break
        g = _downsample2(g, resample)
        c = dataclasses.replace(
            c, rows=g.shape[0], cols=g.shape[1],
            res_x=c.res_x * 2.0, res_y=c.res_y * 2.0)
        levels.append((g, c))
    hdr = 16 if big else 8
    parts = [encode_geotiff(gl, cl, reduced=(i > 0), **kw)
             for i, (gl, cl) in enumerate(levels)]
    out = bytearray(parts[0][:hdr])  # header points at IFD 0 (= hdr)
    bases = []
    pos = hdr
    for p in parts:
        bases.append(pos)
        pos += len(p) - hdr
    for i, p in enumerate(parts):
        nxt = bases[i + 1] if i + 1 < len(parts) else 0
        out += _relocate_ifd_part(p, bases[i] - hdr, bo, big, nxt)
    return bytes(out)


# ------------------------------------------------------------------ spark

_GRID_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("row", T.LongType()),
    T.StructField("col", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


def read_geotiff_config(path: str) -> GridConfig:
    """Driver-side header read of ONE file (cheap — bytes are small here;
    on object storage you'd range-read the header)."""
    with open(path, "rb") as f:
        cfg, _ = decode_geotiff(f.read())
    return cfg


def read_geotiff(
    spark: SparkSession, path: str, drop_nodata: bool = False,
    batch_rows: int = 256, ifd: int = 0
) -> DataFrame:
    """Distributed decode: one task per .tif file -> (path, row, col, value).

    Each file decodes independently inside ``mapInPandas`` and is yielded
    in row-band batches so a large tile never materializes as one pandas
    frame. A tiled 100-TB raster = many files = full parallelism.
    ``ifd`` selects the overview level in a COG-style pyramid (0 = full
    resolution) — reading level k scans k-times-4^-k the pixels, the
    cheap path for coarse passes over an imagery lake.
    """
    bf = spark.read.format("binaryFile").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                mcfg, marr = decode_geotiff_multi(bytes(content), ifd=ifd)
                if marr.shape[2] != 1:
                    raise ValueError(
                        f"multi-band file ({marr.shape[2]} samples/pixel); "
                        "use read_geotiff_bands")
                cfg, arr = mcfg, marr[:, :, 0]
                rows, cols = arr.shape
                cc = np.arange(cols, dtype=np.int64)
                for r0 in range(0, rows, batch_rows):
                    band = arr[r0:r0 + batch_rows]
                    nb = band.shape[0]
                    out = pd.DataFrame({
                        "path": p,
                        "row": np.repeat(np.arange(r0, r0 + nb, dtype=np.int64), cols),
                        "col": np.tile(cc, nb),
                        "value": band.ravel(),
                    })
                    if drop_nodata:
                        nd = cfg.nodata
                        # NaN nodata (GDAL_NODATA='nan' is common for
                        # float rasters): `!= NaN` keeps everything
                        bad = (np.isnan(out["value"]) if np.isnan(nd)
                               else out["value"] == nd)
                        out = out[~bad]
                    yield out

    return bf.select("path", "content").mapInPandas(_decode, schema=_GRID_SCHEMA)


_BANDS_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("row", T.LongType()),
    T.StructField("col", T.LongType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("value", T.DoubleType()),
])


def read_geotiff_bands(
    spark: SparkSession, path: str, batch_rows: int = 256
) -> DataFrame:
    """Distributed multiband decode -> (path, row, col, band, value),
    band 0-indexed in sample order (chunky layout). Same one-task-per-file
    + row-band batching shape as :func:`read_geotiff`."""
    bf = spark.read.format("binaryFile").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                _, arr = decode_geotiff_multi(bytes(content))
                rows, cols, spp = arr.shape
                for r0 in range(0, rows, batch_rows):
                    block = arr[r0:r0 + batch_rows]
                    nb = block.shape[0]
                    yield pd.DataFrame({
                        "path": p,
                        "row": np.repeat(
                            np.arange(r0, r0 + nb, dtype=np.int64), cols * spp),
                        "col": np.tile(
                            np.repeat(np.arange(cols, dtype=np.int64), spp), nb),
                        "band": np.tile(
                            np.arange(spp, dtype=np.int32), nb * cols),
                        "value": block.ravel(),
                    })

    return bf.select("path", "content").mapInPandas(_decode, schema=_BANDS_SCHEMA)


def _grid_from_df(df: DataFrame, cfg: GridConfig, dtype: str) -> np.ndarray:
    pdf = df.select("row", "col", "value").toPandas()
    arr = np.full((cfg.rows, cfg.cols), cfg.nodata, dtype=dtype)
    arr[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf["value"].to_numpy()
    return arr


def write_geotiff(
    df: DataFrame, cfg: GridConfig, path: str, dtype: str = "f4",
    compression: int = 8, big: bool = False,
    max_cells: int = 268_435_456, predictor: int = 1,
    rows_per_strip: int = 64, jpeg_quality: int = 90,
    tile: tuple[int, int] | None = None,
    overviews: int = 0, resample: str = "nearest",
) -> None:
    """Single-file writer: assembles the grid driver-side. Fine for
    summaries/small rasters; use :func:`write_geotiff_tiles` at scale.
    Guarded: a grid past ``max_cells`` (default 2^28 ~ 2 GiB of f8)
    raises instead of silently collecting a cluster-scale raster onto
    the driver. ``overviews > 0`` emits a COG-style pyramid (see
    :func:`encode_geotiff_overviews`)."""
    if cfg.rows * cfg.cols > max_cells:
        raise ValueError(
            f"grid has {cfg.rows * cfg.cols} cells > max_cells={max_cells}; "
            "this writer assembles driver-side — use write_geotiff_tiles "
            "for cluster-scale rasters (executor-side tiled encode)"
        )
    arr = _grid_from_df(df, cfg, dtype)
    kw = dict(compression=compression, big=big, predictor=predictor,
              rows_per_strip=rows_per_strip, jpeg_quality=jpeg_quality,
              tile=tile)
    with open(path, "wb") as f:
        if overviews > 0:
            f.write(encode_geotiff_overviews(arr, cfg, overviews=overviews,
                                             resample=resample, **kw))
        else:
            f.write(encode_geotiff(arr, cfg, **kw))


def write_geotiff_tiles(
    df: DataFrame,
    cfg: GridConfig,
    out_dir: str,
    tile_rows: int = 1024,
    dtype: str = "f4",
    compression: int = 8,
) -> list[str]:
    """Partitioned writer: one GeoTIFF per horizontal band, encoded on the
    executors (groupBy band -> applyInPandas encode+write). Bands carry
    their own tiepoint so the set mosaics back exactly; this is the shape
    a 1000-executor job writes (many tiles to shared storage), mirroring
    the tiled layouts the reference reads (geotiff/mod.rs tile path)."""
    os.makedirs(out_dir, exist_ok=True)
    nodata = float(cfg.nodata)
    rows, cols = cfg.rows, cfg.cols
    north, west = cfg.north, cfg.west
    res_x, res_y = cfg.res_x, cfg.res_y

    out_schema = T.StructType([
        T.StructField("band", T.LongType()),
        T.StructField("file", T.StringType()),
        T.StructField("rows", T.LongType()),
    ])

    epsg = int(getattr(cfg, "epsg", 0) or 0)
    epsg_geo = getattr(cfg, "epsg_geographic", None)

    def _write_band(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(key[0])
        r0 = band * tile_rows
        nb = min(tile_rows, rows - r0)
        arr = np.full((nb, cols), nodata, dtype=dtype)
        pdf = pdf[pdf["_s"] == 0]  # group-existence sentinels carry no data
        arr[pdf["row"].to_numpy() - r0, pdf["col"].to_numpy()] = pdf["value"].to_numpy()
        # carry the CRS into every band (the single-file writer's
        # GeoKeyDirectory carry-through, certified by geotiff_roundtrip)
        bcfg = GridConfig(rows=nb, cols=cols, north=north - r0 * res_y, west=west,
                          res_x=res_x, res_y=res_y, nodata=nodata,
                          epsg=epsg, epsg_geographic=epsg_geo)
        fp = os.path.join(out_dir, f"band_{band:06d}.tif")
        with open(fp, "wb") as f:
            f.write(encode_geotiff(arr, bcfg, compression=compression))
        return pd.DataFrame({"band": [band], "file": [fp], "rows": [nb]})

    # one sentinel row per band (flagged _s=1, dropped before assignment):
    # an all-nodata band would otherwise produce NO group, hence NO file,
    # and the mosaic would have a silent hole
    n_bands = math.ceil(rows / tile_rows)
    spark = df.sparkSession
    sentinels = spark.range(n_bands).select(
        (F.col("id") * tile_rows).alias("row"),
        F.lit(0).cast("long").alias("col"),
        F.lit(nodata).alias("value"),
        F.lit(1).alias("_s"),
    )
    manifest = (
        df.select("row", "col", "value").withColumn("_s", F.lit(0))
        .unionByName(sentinels)
        .withColumn("_band", (F.col("row") / F.lit(tile_rows)).cast("long"))
        .groupBy("_band")
        .applyInPandas(_write_band, schema=out_schema)
        .collect()
    )
    return [r["file"] for r in sorted(manifest, key=lambda r: r["band"])]
