"""GeoJSON (RFC 7946) read/write — a vector surface the reference does
not ship (WhiteboxTools speaks shapefile only, src/vector/shapefile/):
this exists because GeoJSON is what web pipelines actually exchange.

Two lanes:

- **FeatureCollection files** (`write_geojson` / `read_geojson`): the
  interchange shape. Write renders features driver-side (clip/overlay
  layers are small by construction — same stance as the shapefile
  writer); read is distributed (binaryFile -> stdlib-json parse per
  file inside ``mapInPandas``), one task per file.
- **Newline-delimited GeoJSON** (`write_geojsonl` / `read_geojsonl`,
  GDAL's GeoJSONSeq): the SCALE shape — one Feature per line, so a
  100-TB layer splits by line like any text table. The reader parses
  entirely JVM-side with ``from_json`` (no Python in the hot path) and
  explodes polygon rings relationally.

Geometry support: Point, LineString, Polygon (with holes), and
MultiPolygon (flattened to extra parts on read). Ring roles follow
position per RFC 7946 §3.1.6 (first ring exterior, rest holes); the
writer emits RFC-compliant winding (exterior CCW, holes CW) regardless
of the engine-internal shapefile convention (CW shells), re-orienting
by signed area.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whitebox_tools_spark.io.shapefile import (
    SHP_POINT,
    SHP_POLYGON,
    SHP_POLYLINE,
    ShapeRecord,
    _signed_area,
)

_GEOM_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("fid", T.LongType()),
    T.StructField("geom_type", T.StringType()),
    T.StructField("part", T.IntegerType()),
    T.StructField("is_hole", T.BooleanType()),
    T.StructField("xs", T.ArrayType(T.DoubleType())),
    T.StructField("ys", T.ArrayType(T.DoubleType())),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])


def _ccw(ring: np.ndarray) -> np.ndarray:
    return ring[::-1].copy() if _signed_area(ring) < 0 else ring


def _cw(ring: np.ndarray) -> np.ndarray:
    return ring[::-1].copy() if _signed_area(ring) > 0 else ring


def _coords(ring: np.ndarray) -> list:
    return [[float(x), float(y)] for x, y in ring]


def record_to_feature(fid: int, rec: ShapeRecord) -> dict:
    """One ShapeRecord -> GeoJSON Feature dict (RFC 7946 winding)."""
    if rec.shape_type == SHP_POINT:
        geom = {"type": "Point",
                "coordinates": [float(rec.parts[0][0, 0]),
                                float(rec.parts[0][0, 1])]}
    elif rec.shape_type == SHP_POLYLINE:
        if len(rec.parts) == 1:
            geom = {"type": "LineString", "coordinates": _coords(rec.parts[0])}
        else:
            geom = {"type": "MultiLineString",
                    "coordinates": [_coords(p) for p in rec.parts]}
    elif rec.shape_type == SHP_POLYGON:
        # group shapefile parts into polygons: each CW (shell) ring
        # starts a polygon; following CCW rings are its holes
        polys: list[list[list]] = []
        for p in rec.parts:
            if _signed_area(p) <= 0:  # engine/shapefile shell (CW, y-up)
                polys.append([_coords(_ccw(p))])
            else:
                if not polys:  # tolerate hole-first malformed input
                    polys.append([])
                polys[-1].append(_coords(_cw(p)))
        if len(polys) == 1:
            geom = {"type": "Polygon", "coordinates": polys[0]}
        else:
            geom = {"type": "MultiPolygon", "coordinates": polys}
    else:
        raise ValueError(f"GeoJSON writer: unsupported shape type {rec.shape_type}")
    props = {}
    for k, v in rec.attrs.items():
        if isinstance(v, float) and not math.isfinite(v):
            v = None
        props[k] = v
    return {"type": "Feature", "id": fid, "geometry": geom,
            "properties": props}


def write_geojson(recs: list[ShapeRecord], path: str) -> None:
    """Write a FeatureCollection (driver-side; layers are small by
    construction — use :func:`write_geojsonl` for feature tables)."""
    fc = {"type": "FeatureCollection",
          "features": [record_to_feature(i, r) for i, r in enumerate(recs)]}
    with open(path, "w") as f:
        json.dump(fc, f, separators=(",", ":"))


def _feature_rows(path: str, fid: int, feat: dict) -> list[tuple]:
    geom = feat.get("geometry") or {}
    gtype = geom.get("type")
    props = {str(k): (None if v is None else str(v))
             for k, v in (feat.get("properties") or {}).items()}
    rows = []

    def add(part, is_hole, coords, gt):
        # RFC 7946 §3.1.1 positions are [x, y] or [x, y, z]; drop the
        # optional altitude (and tolerate per-position raggedness)
        # instead of letting a flat reshape misalign every vertex.
        a = np.asarray([p[:2] for p in coords], dtype=np.float64)
        a = a.reshape(-1, 2)
        rows.append((path, fid, gt, part, is_hole,
                     a[:, 0].tolist(), a[:, 1].tolist(), props))

    if gtype == "Point":
        add(0, False, [geom["coordinates"]], "Point")
    elif gtype == "MultiPoint":
        for i, c in enumerate(geom["coordinates"]):
            add(i, False, [c], "Point")
    elif gtype == "LineString":
        add(0, False, geom["coordinates"], "LineString")
    elif gtype == "MultiLineString":
        for i, part in enumerate(geom["coordinates"]):
            add(i, False, part, "LineString")
    elif gtype == "Polygon":
        for i, ring in enumerate(geom["coordinates"]):
            add(i, i > 0, ring, "Polygon")
    elif gtype == "MultiPolygon":
        part = 0
        for poly in geom["coordinates"]:
            for i, ring in enumerate(poly):
                add(part, i > 0, ring, "Polygon")
                part += 1
    elif gtype is None:
        pass  # null geometry: feature contributes no rows
    else:
        raise ValueError(f"GeoJSON reader: unsupported geometry {gtype!r}")
    return rows


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Distributed FeatureCollection read -> (path, fid, geom_type,
    part, is_hole, xs, ys, properties). One task per file; fid is the
    feature's ``id`` when integral, else its position."""
    bf = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                doc = json.loads(bytes(content))
                if doc.get("type") == "FeatureCollection":
                    feats = doc.get("features", [])
                elif doc.get("type") == "Feature":
                    feats = [doc]
                else:
                    raise ValueError(
                        f"not a GeoJSON Feature(Collection): {doc.get('type')!r}")
                rows = []
                for pos, feat in enumerate(feats):
                    fid = feat.get("id", pos)
                    # honour only genuinely integral numeric ids (bool is
                    # an int subclass; 2.7 would truncate onto another
                    # feature's fid) — else fall back to the position, as
                    # the docstring promises.
                    if isinstance(fid, bool) or not (
                            isinstance(fid, int)
                            or (isinstance(fid, float) and fid.is_integer())):
                        fid = pos
                    fid = int(fid)
                    rows.extend(_feature_rows(p, fid, feat))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in _GEOM_SCHEMA.fields])

    return bf.select("path", "content").mapInPandas(run, schema=_GEOM_SCHEMA)


# ------------------------------------------------ newline-delimited (scale)

# typed Feature schema for the JVM-side from_json parse: coordinates as
# ragged array<array<array<double>>> covers Polygon; Point/LineString
# lanes read narrower views of the same document
_POLY_JSON_SCHEMA = (
    "struct<id: bigint, geometry: struct<type: string, "
    "coordinates: array<array<array<double>>>>, "
    "properties: map<string, string>>"
)


def write_geojsonl(recs: list[ShapeRecord], path: str) -> None:
    """One Feature per line (GDAL GeoJSONSeq) — the splittable scale
    layout. Driver-side for fixture layers; a cluster job would render
    lines with ``to_json`` executor-side instead."""
    with open(path, "w") as f:
        for i, r in enumerate(recs):
            f.write(json.dumps(record_to_feature(i, r),
                               separators=(",", ":")) + "\n")


def polygons_to_geojsonl(df: DataFrame) -> DataFrame:
    """The executor-side GeoJSONSeq render: polygon ring rows
    (fid, part, is_hole, xs, ys, properties) -> one `value` column of
    Feature JSON lines, built entirely with JVM expressions
    (zip_with + collect_list + to_json — zero Python), so a
    cluster-scale layer writes with plain ``df.write.text``. Rings
    regroup per fid ordered by part; coordinates render as
    [x, y] pairs. The output parses back through
    :func:`read_geojsonl_polygons` (law in tests/test_geojson.py)."""
    ring = df.select(
        "fid", "part", "properties",
        F.zip_with("xs", "ys", lambda x, y: F.array(x, y)).alias("ring"),
    )
    grouped = (
        ring.groupBy("fid")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("part", "ring"))
            ).alias("parts"),
            F.first("properties").alias("properties"),
        )
        .select(
            "fid",
            F.transform("parts", lambda p: p["ring"]).alias("coordinates"),
            "properties",
        )
    )
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.col("fid").alias("id"),
        F.struct(
            F.lit("Polygon").alias("type"),
            F.col("coordinates").alias("coordinates"),
        ).alias("geometry"),
        F.col("properties").alias("properties"),
    )
    return grouped.select(F.to_json(feature).alias("value"))


_POINT_JSON_SCHEMA = (
    "struct<id: bigint, geometry: struct<type: string, "
    "coordinates: array<double>>, properties: map<string, string>>"
)


def read_geojsonl_points(spark: SparkSession, path: str) -> DataFrame:
    """JVM-side GeoJSONSeq POINT scan: the narrow view of the same
    Feature lines (coordinates as array<double>) -> (fid, x, y,
    properties). Zero Python; the text scan splits by line. Lines whose
    geometry is not a Point parse to null coordinates and are filtered
    — so mixed-geometry files read their point subset."""
    lines = spark.read.text(path)
    f = F.from_json(F.col("value"), _POINT_JSON_SCHEMA).alias("f")
    return (
        lines.select(f)
        .where(F.col("f.geometry.type") == "Point")
        .select(
            F.col("f.id").alias("fid"),
            F.element_at("f.geometry.coordinates", 1).alias("x"),
            F.element_at("f.geometry.coordinates", 2).alias("y"),
            F.col("f.properties").alias("properties"),
        )
    )


def read_geojsonl_polygons(spark: SparkSession, path: str) -> DataFrame:
    """JVM-side GeoJSONSeq polygon scan: spark.read.text + ``from_json``
    + ring explode — zero Python, so Catalyst sees the whole plan and
    the text scan splits by line at any scale. Returns the same ring
    rows as :func:`read_geojson` (minus path)."""
    lines = spark.read.text(path)
    f = F.from_json(F.col("value"), _POLY_JSON_SCHEMA).alias("f")
    feats = lines.select(f).select(
        F.col("f.id").alias("fid"),
        F.col("f.geometry.type").alias("geom_type"),
        F.posexplode("f.geometry.coordinates").alias("part", "ring"),
        F.col("f.properties").alias("properties"),
    )
    return feats.select(
        "fid",
        "geom_type",
        F.col("part").cast("int").alias("part"),
        (F.col("part") > 0).alias("is_hole"),
        F.transform("ring", lambda c: F.element_at(c, 1)).alias("xs"),
        F.transform("ring", lambda c: F.element_at(c, 2)).alias("ys"),
        "properties",
    )
