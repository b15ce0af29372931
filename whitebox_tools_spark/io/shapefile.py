"""ESRI Shapefile codec (.shp/.shx/.dbf): Point, PolyLine, Polygon,
MultiPoint and their Z (z + optional m) and M (measure) variants —
the reference's full ShapeType set except MultiPatch, which the
reference itself rejects (geometry.rs:510).

Record layout follows the spec fields the reference parses
(src/vector/shapefile/mod.rs:37-66: file code 9994 big-endian, shape
type little-endian, per-record BE header + LE content) and the hole
convention matches src/vector/shapefile/geometry.rs:305+ — a polygon
part is a hole iff its ring winds counter-clockwise (y-up), the same
convention the engine's vector layers use (sources/vectors.py).

Attribute table: dBase III (.dbf) with C (text), N/F (numeric),
D (date, stored YYYYMMDD) and L (logical) fields — the reference's
FieldData::Int/Real/Text/Date/Bool set
(src/vector/shapefile/attributes.rs:60-67).
"""

from __future__ import annotations

import datetime as _dt
import struct
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from whitebox_tools_spark.sources.vectors import PolygonFeature

SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8
SHP_POINT_Z = 11
SHP_POLYLINE_Z = 13
SHP_POLYGON_Z = 15
SHP_MULTIPOINT_Z = 18
SHP_POINT_M = 21
SHP_POLYLINE_M = 23
SHP_POLYGON_M = 25
SHP_MULTIPOINT_M = 28

_Z_TYPES = {SHP_POINT_Z: SHP_POINT, SHP_POLYLINE_Z: SHP_POLYLINE,
            SHP_POLYGON_Z: SHP_POLYGON, SHP_MULTIPOINT_Z: SHP_MULTIPOINT}
# the M shape types (geometry.rs:488-491) carry measures but no z; the
# reference always writes their M block (get_length, geometry.rs:242-246)
_M_TYPES = {SHP_POINT_M: SHP_POINT, SHP_POLYLINE_M: SHP_POLYLINE,
            SHP_POLYGON_M: SHP_POLYGON, SHP_MULTIPOINT_M: SHP_MULTIPOINT}


@dataclass
class ShapeRecord:
    parts: list  # list[np.ndarray (n,2)]
    shape_type: int
    attrs: dict = field(default_factory=dict)
    zs: list | None = None  # per-part z arrays for the *Z shape types
    ms: list | None = None  # per-part measure arrays (*M / *Z shape types)


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def ring_is_hole(ring: np.ndarray) -> bool:
    """Shapefile spec: CW shells, CCW holes (y-up) — CCW = positive area."""
    return _signed_area(ring) > 0.0


# ------------------------------------------------------------------ .dbf

def _encode_dbf(records: list[dict], fields: list[tuple[str, str, int, int]]) -> bytes:
    """fields: (name, type 'C'|'N'|'F'|'D'|'L', length, decimals).

    Missing/None numerics encode as all spaces (the dBase null), and a
    numeric whose formatted width exceeds the field length raises instead
    of silently truncating digits (ADVICE r3). Dates are YYYYMMDD;
    logicals are T/F with '?' for null."""
    for name, ftype, ln, _dec in fields:
        # L and D bodies are written at their spec-fixed widths (1 and 8
        # bytes); a different declared length would shift every later
        # field's offset from row 1 onward
        if ftype == "L" and ln != 1:
            raise ValueError(f"field {name}: L (logical) length must be 1")
        if ftype == "D" and ln != 8:
            raise ValueError(f"field {name}: D (date) length must be 8")
    n = len(records)
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(f[2] for f in fields)
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 3, 126, 1, 1, n, hdr_size, rec_size)
    for name, ftype, ln, dec in fields:
        out += struct.pack("<11sc4xBB14x", name.encode("ascii")[:11],
                           ftype.encode("ascii"), ln, dec)
    out += b"\x0d"
    for rec in records:
        out += b" "
        for name, ftype, ln, dec in fields:
            v = rec.get(name)
            if ftype == "C":
                out += str(v if v is not None else "")[:ln].ljust(ln).encode(
                    "ascii", "replace")
            elif ftype == "D":
                if v is None or v == "":
                    out += b" " * ln
                else:
                    if isinstance(v, (_dt.date, _dt.datetime)):
                        s = f"{v.year:04d}{v.month:02d}{v.day:02d}"
                    else:
                        s = str(v).replace("-", "")
                    if len(s) != 8 or not s.isdigit():
                        raise ValueError(f"field {name}: bad date value {v!r}")
                    out += s.encode("ascii")
            elif ftype == "L":
                out += b"?" if v is None or v == "" else (b"T" if v else b"F")
            else:  # N / F
                if v is None or v == "":
                    out += b" " * ln  # dBase null
                else:
                    s = f"{float(v):.{dec}f}" if dec else str(int(v))
                    if len(s) > ln:
                        raise ValueError(
                            f"field {name}: value {s} wider than length {ln}"
                        )
                    out += s.rjust(ln).encode("ascii")
    out += b"\x1a"
    return bytes(out)


def _decode_dbf(data: bytes) -> list[dict]:
    n, hdr_size, rec_size = struct.unpack_from("<IHH", data, 4)
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos:pos + 11].split(b"\0")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        ln = data[pos + 16]
        dec = data[pos + 17]
        fields.append((name, ftype, ln, dec))
        pos += 32
    # malformed-header guard (fuzz-found): a corrupt record count would
    # otherwise drive a loop over billions of phantom records — the
    # declared record block must fit the actual file
    if rec_size < 1 or hdr_size + n * rec_size > len(data):
        raise ValueError(
            f".dbf header claims {n} records of {rec_size} B past the "
            f"end of the {len(data)}-byte file")
    out = []
    for i in range(n):
        rpos = hdr_size + i * rec_size
        if data[rpos:rpos + 1] == b"*":
            # soft-deleted record: KEEP a placeholder slot — .dbf rows
            # align 1:1 with .shp records, and skipping would attach
            # every later record's attributes to the wrong geometry
            # (same alignment rule as null shapes, ADVICE r3)
            out.append({})
            continue
        rec = {}
        fpos = rpos + 1
        for name, ftype, ln, dec in fields:
            raw = data[fpos:fpos + ln].decode("ascii", "replace").strip()
            fpos += ln
            if ftype in ("N", "F"):
                rec[name] = (float(raw) if (dec or "." in raw) else int(raw)) if raw else None
            elif ftype == "D":
                rec[name] = raw or None  # YYYYMMDD as stored
            elif ftype == "L":
                rec[name] = None if raw in ("", "?") else raw in "TtYy"
            else:
                rec[name] = raw
        out.append(rec)
    return out


# ------------------------------------------------------------------ .shp

def _shp_header(shape_type: int, bbox: tuple, file_len_words: int) -> bytes:
    h = bytearray(100)
    struct.pack_into(">i", h, 0, 9994)  # file code, mod.rs:37
    struct.pack_into(">i", h, 24, file_len_words)
    struct.pack_into("<i", h, 28, 1000)  # version
    struct.pack_into("<i", h, 32, shape_type)
    struct.pack_into("<4d", h, 36, *bbox)  # xmin ymin xmax ymax
    return bytes(h)


def _payload(arrays: list | None, npts: int, what: str) -> np.ndarray:
    """Concatenate per-part z/m arrays, validating the total length
    against the record's point count — a short/long payload would write
    a structurally corrupt *Z/*M record (blocks read at wrong offsets)."""
    if not arrays:
        return np.zeros(npts)
    flat = np.concatenate([np.asarray(a, dtype="<f8") for a in arrays])
    if len(flat) != npts:
        raise ValueError(
            f"{what} payload has {len(flat)} values for {npts} points"
        )
    return flat


def encode_shapefile(
    records: list[ShapeRecord],
    fields: list[tuple[str, str, int, int]] | None = None,
) -> tuple[bytes, bytes, bytes]:
    """Encode -> (.shp bytes, .shx bytes, .dbf bytes)."""
    if not records:
        raise ValueError("empty shapefile not supported")
    nonnull = [r for r in records if r.shape_type != 0]
    if not nonnull:
        raise ValueError("all-null shapefile not supported")
    shape_type = nonnull[0].shape_type
    supported = ({SHP_POINT, SHP_POLYLINE, SHP_POLYGON, SHP_MULTIPOINT}
                 | set(_Z_TYPES) | set(_M_TYPES))
    if shape_type not in supported:
        raise ValueError(f"unsupported shape type {shape_type}")
    contents = []
    for rec in records:
        if rec.shape_type == 0:  # Null shape: 4-byte type, no geometry
            contents.append(struct.pack("<i", 0))
            continue
        if rec.shape_type != shape_type:
            raise ValueError("mixed shape types")
        if shape_type == SHP_POINT:
            (pt,) = rec.parts
            body = struct.pack("<i2d", SHP_POINT, float(pt[0, 0]), float(pt[0, 1]))
        elif shape_type == SHP_POINT_Z:
            (pt,) = rec.parts
            z = float(rec.zs[0][0]) if rec.zs else 0.0
            m = float(rec.ms[0][0]) if rec.ms else 0.0
            body = struct.pack("<i4d", SHP_POINT_Z, float(pt[0, 0]), float(pt[0, 1]), z, m)
        elif shape_type == SHP_POINT_M:
            (pt,) = rec.parts
            m = float(rec.ms[0][0]) if rec.ms else 0.0
            body = struct.pack("<i3d", SHP_POINT_M, float(pt[0, 0]), float(pt[0, 1]), m)
        elif shape_type in (SHP_MULTIPOINT, SHP_MULTIPOINT_M, SHP_MULTIPOINT_Z):
            pts = np.vstack(rec.parts)
            body = struct.pack(
                "<i4di",
                shape_type,
                float(pts[:, 0].min()), float(pts[:, 1].min()),
                float(pts[:, 0].max()), float(pts[:, 1].max()),
                len(pts),
            )
            body += np.ascontiguousarray(pts, dtype="<f8").tobytes()
            if shape_type == SHP_MULTIPOINT_Z:
                zf = _payload(rec.zs, len(pts), "z")
                body += struct.pack("<2d", float(zf.min()), float(zf.max()))
                body += np.ascontiguousarray(zf, dtype="<f8").tobytes()
            if shape_type in (SHP_MULTIPOINT_M, SHP_MULTIPOINT_Z):
                mf = _payload(rec.ms, len(pts), "m")
                body += struct.pack("<2d", float(mf.min()), float(mf.max()))
                body += np.ascontiguousarray(mf, dtype="<f8").tobytes()
        else:
            pts = np.vstack(rec.parts)
            starts, acc = [], 0
            for part in rec.parts:
                starts.append(acc)
                acc += len(part)
            body = struct.pack(
                "<i4d2i", shape_type,
                float(pts[:, 0].min()), float(pts[:, 1].min()),
                float(pts[:, 0].max()), float(pts[:, 1].max()),
                len(rec.parts), len(pts),
            )
            body += struct.pack(f"<{len(starts)}i", *starts)
            body += np.ascontiguousarray(pts, dtype="<f8").tobytes()
            if shape_type in (SHP_POLYLINE_Z, SHP_POLYGON_Z):
                # *Z: z range + z values, then m range + m values
                zf = _payload(rec.zs, len(pts), "z")
                body += struct.pack("<2d", float(zf.min()), float(zf.max()))
                body += np.ascontiguousarray(zf, dtype="<f8").tobytes()
            if shape_type in (SHP_POLYLINE_Z, SHP_POLYGON_Z,
                              SHP_POLYLINE_M, SHP_POLYGON_M):
                mf = _payload(rec.ms, len(pts), "m")
                body += struct.pack("<2d", float(mf.min()), float(mf.max()))
                body += np.ascontiguousarray(mf, dtype="<f8").tobytes()
        contents.append(body)

    allp = np.vstack([np.vstack(r.parts) for r in nonnull])
    bbox = (float(allp[:, 0].min()), float(allp[:, 1].min()),
            float(allp[:, 0].max()), float(allp[:, 1].max()))

    shp = bytearray()
    shx = bytearray()
    offset_words = 50  # header = 100 bytes
    for i, body in enumerate(contents):
        shx += struct.pack(">2i", offset_words, len(body) // 2)
        shp += struct.pack(">2i", i + 1, len(body) // 2)  # 1-based record num
        shp += body
        offset_words += 4 + len(body) // 2
    shp_bytes = _shp_header(shape_type, bbox, offset_words) + bytes(shp)
    shx_bytes = _shp_header(shape_type, bbox, 50 + 4 * len(contents)) + bytes(shx)

    if fields is None:
        keys = sorted({k for r in records for k in r.attrs})
        fields = []
        for k in keys:
            vals = [r.attrs.get(k) for r in records]
            nonnull = [v for v in vals if v is not None]
            # bool before numeric: bool is an int subclass in Python
            if nonnull and all(isinstance(v, bool) for v in nonnull):
                fields.append((k, "L", 1, 0))
            elif nonnull and all(
                isinstance(v, (_dt.date, _dt.datetime)) for v in nonnull
            ):
                fields.append((k, "D", 8, 0))
            elif all(isinstance(v, (int, float, type(None))) for v in vals):
                anyf = any(isinstance(v, float) for v in vals)
                fields.append((k, "N", 24, 6 if anyf else 0))
            else:
                ln = max(1, min(254, max(len(str(v)) for v in vals)))
                fields.append((k, "C", ln, 0))
        if not fields:
            fields = [("FID", "N", 9, 0)]
            for i, r in enumerate(records):
                r.attrs["FID"] = i
    dbf_bytes = _encode_dbf([r.attrs for r in records], fields)
    return shp_bytes, shx_bytes, dbf_bytes


def decode_shapefile(shp: bytes, dbf: bytes | None = None) -> list[ShapeRecord]:
    (file_code,) = struct.unpack_from(">i", shp, 0)
    if file_code != 9994:
        raise ValueError("not a shapefile (file code != 9994)")
    (file_len_words,) = struct.unpack_from(">i", shp, 24)
    (shape_type,) = struct.unpack_from("<i", shp, 32)
    attrs = _decode_dbf(dbf) if dbf else None

    records = []
    pos = 100
    end = min(len(shp), file_len_words * 2)
    while pos + 8 <= end:
        _, content_words = struct.unpack_from(">2i", shp, pos)
        pos += 8
        (stype,) = struct.unpack_from("<i", shp, pos)
        if stype == 0:
            # null shape: keep a placeholder record IN PLACE so the
            # positional .dbf attribute assignment below stays aligned —
            # the reference keeps Null records too
            # (src/vector/shapefile/mod.rs:291). ADVICE r3 (medium).
            rec = ShapeRecord(parts=[], shape_type=0)
            if attrs is not None and len(records) < len(attrs):
                rec.attrs = attrs[len(records)]
            records.append(rec)
            pos += content_words * 2
            continue
        zs = None
        ms = None
        content_bytes = content_words * 2
        if stype == SHP_POINT:
            x, y = struct.unpack_from("<2d", shp, pos + 4)
            parts = [np.array([[x, y]])]
        elif stype == SHP_POINT_Z:
            # the M value is optional (the reference writes x,y,z only
            # when the geometry has no m data, geometry.rs:248-253)
            x, y, z = struct.unpack_from("<3d", shp, pos + 4)
            parts = [np.array([[x, y]])]
            zs = [np.array([z])]
            if content_bytes >= 36:
                ms = [np.array([struct.unpack_from("<d", shp, pos + 28)[0]])]
        elif stype == SHP_POINT_M:
            x, y, m = struct.unpack_from("<3d", shp, pos + 4)
            parts = [np.array([[x, y]])]
            ms = [np.array([m])]
        elif stype in (SHP_MULTIPOINT, SHP_MULTIPOINT_Z, SHP_MULTIPOINT_M):
            (npoints,) = struct.unpack_from("<i", shp, pos + 36)
            pts = np.frombuffer(shp, dtype="<f8", count=npoints * 2,
                                offset=pos + 40).reshape(-1, 2)
            parts = [pts.copy()]
            cursor = pos + 40 + 16 * npoints
            if stype == SHP_MULTIPOINT_Z:
                zf = np.frombuffer(shp, dtype="<f8", count=npoints,
                                   offset=cursor + 16)  # skip z range
                zs = [zf.copy()]
                cursor += 16 + 8 * npoints
            if stype in (SHP_MULTIPOINT_Z, SHP_MULTIPOINT_M):
                # m block optional on *Z (geometry.rs has_m_data branch)
                if pos + content_bytes >= cursor + 16 + 8 * npoints:
                    mf = np.frombuffer(shp, dtype="<f8", count=npoints,
                                       offset=cursor + 16)
                    ms = [mf.copy()]
        elif stype in (SHP_POLYLINE, SHP_POLYGON, SHP_POLYLINE_Z, SHP_POLYGON_Z,
                       SHP_POLYLINE_M, SHP_POLYGON_M):
            nparts, npoints = struct.unpack_from("<2i", shp, pos + 36)
            starts = list(struct.unpack_from(f"<{nparts}i", shp, pos + 44))
            pts = np.frombuffer(shp, dtype="<f8", count=npoints * 2,
                                offset=pos + 44 + 4 * nparts).reshape(-1, 2)
            bounds = starts + [npoints]
            parts = [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]
            cursor = pos + 44 + 4 * nparts + 16 * npoints
            if stype in (SHP_POLYLINE_Z, SHP_POLYGON_Z):
                zf = np.frombuffer(shp, dtype="<f8", count=npoints,
                                   offset=cursor + 16)  # skip z range
                zs = [zf[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]
                cursor += 16 + 8 * npoints
            if stype in (SHP_POLYLINE_Z, SHP_POLYGON_Z,
                         SHP_POLYLINE_M, SHP_POLYGON_M):
                # m block optional on *Z (geometry.rs has_m_data branch)
                if pos + content_bytes >= cursor + 16 + 8 * npoints:
                    mf = np.frombuffer(shp, dtype="<f8", count=npoints,
                                       offset=cursor + 16)
                    ms = [mf[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]
        else:
            raise ValueError(f"unsupported shape type {stype}")
        rec = ShapeRecord(parts=parts, shape_type=stype, zs=zs, ms=ms)
        if attrs is not None and len(records) < len(attrs):
            rec.attrs = attrs[len(records)]
        records.append(rec)
        pos += content_words * 2
    return records


# ------------------------------------------------------------------ file + spark

def write_shapefile(
    records: list[ShapeRecord], base_path: str, prj: str | None = None
) -> None:
    """base_path without extension; writes .shp/.shx/.dbf (+ .prj WKT
    sidecar when given — the reference's Shapefile.projection field,
    src/vector/shapefile/mod.rs:113)."""
    shp, shx, dbf = encode_shapefile(records)
    for ext, data in ((".shp", shp), (".shx", shx), (".dbf", dbf)):
        with open(base_path + ext, "wb") as f:
            f.write(data)
    if prj:
        with open(base_path + ".prj", "w") as f:
            f.write(prj)


def read_projection(base_path: str) -> str | None:
    """The .prj WKT sidecar text, or None when absent."""
    try:
        with open(base_path + ".prj") as f:
            return f.read()
    except FileNotFoundError:
        return None


def _vector_schema(attr_names: list[str]) -> T.StructType:
    fields = [
        T.StructField("fid", T.LongType()),
        T.StructField("part", T.LongType()),
        T.StructField("is_hole", T.BooleanType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType())),
    ]
    fields += [T.StructField(a, T.StringType()) for a in attr_names]
    return T.StructType(fields)


def read_shapefile(spark: SparkSession, base_path: str) -> DataFrame:
    """Read .shp(+.dbf) into the engine's relational vector form:
    (fid, part, is_hole, xs, ys, <attrs as strings>). Decoded driver-side
    (a clip/overlay layer is small by construction — the reference also
    holds the whole shapefile in memory, gis_analysis/clip.rs) then
    parallelized; point/line layers that are *data* belong in parquet."""
    with open(base_path + ".shp", "rb") as f:
        shp = f.read()
    dbf = None
    try:
        with open(base_path + ".dbf", "rb") as f:
            dbf = f.read()
    except FileNotFoundError:
        pass
    records = decode_shapefile(shp, dbf)
    attr_names = sorted({k for r in records for k in r.attrs})
    rows = []
    for fid, rec in enumerate(records):
        for pi, part in enumerate(rec.parts):
            hole = rec.shape_type in (
                SHP_POLYGON, SHP_POLYGON_Z, SHP_POLYGON_M
            ) and ring_is_hole(part)
            rows.append((fid, pi, hole, [float(v) for v in part[:, 0]],
                         [float(v) for v in part[:, 1]],
                         *[str(rec.attrs.get(a, "")) for a in attr_names]))
    return spark.createDataFrame(rows, schema=_vector_schema(attr_names))


def records_to_features(records: list[ShapeRecord]) -> list[PolygonFeature]:
    """Bridge into the engine's broadcast polygon-layer form."""
    feats = []
    for fid, rec in enumerate(records):
        if rec.shape_type == 0:  # null shapes carry no geometry
            continue
        holes = [ring_is_hole(p) for p in rec.parts]
        feats.append(PolygonFeature(fid=fid, rings=[np.asarray(p, dtype=np.float64)
                                                    for p in rec.parts],
                                    holes=holes, attrs=dict(rec.attrs)))
    return feats


def _orient(ring: np.ndarray, hole: bool) -> np.ndarray:
    """Enforce spec winding (CW shells, CCW holes, y-up) so the hole flag
    survives the codec's winding-based classification on re-read."""
    if ring_is_hole(ring) != hole:
        return ring[::-1].copy()
    return ring


def write_overlay_shapefile(df: DataFrame, base_path: str) -> int:
    """Export an overlay geometry result (the engine's per-vertex ring
    rows: fid_a, [fid_b,] part, is_hole, vi, x, y — the schema of
    intersect_geom / union_geom / erase_geom / dissolve_geom) as a
    Polygon shapefile; one record per (fid_a, fid_b) feature, parts in
    ring order, windings normalized to the spec. Returns the record
    count. Overlay layers are small by construction (they derive from a
    broadcastable polygon layer), so the collect is not a scale hazard."""
    cols = df.columns
    has_b = "fid_b" in cols
    keys = ["fid_a", "fid_b"] if has_b else ["fid_a"]
    pdf = df.toPandas().sort_values(keys + ["part", "vi"])
    records: list[ShapeRecord] = []
    for key, feat in pdf.groupby(keys, dropna=False, sort=True):
        parts, holes = [], []
        for (_, hole), ring in feat.groupby(["part", "is_hole"], sort=True):
            r = np.column_stack([ring["x"].to_numpy(), ring["y"].to_numpy()])
            if len(r) < 3:
                continue
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            parts.append(_orient(r, bool(hole)))
            holes.append(bool(hole))
        if not parts:
            continue
        # shells first, then holes, preserving part order within each
        order = sorted(range(len(parts)), key=lambda i: (holes[i],))
        key_t = key if isinstance(key, tuple) else (key,)
        attrs = {"FID_A": int(key_t[0])}
        if has_b:
            attrs["FID_B"] = -1 if pd.isna(key_t[1]) else int(key_t[1])
        records.append(ShapeRecord(
            parts=[parts[i] for i in order],
            shape_type=SHP_POLYGON,
            attrs=attrs,
        ))
    if not records:
        return 0
    write_shapefile(records, base_path)
    return len(records)
