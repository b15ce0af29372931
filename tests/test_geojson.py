"""GeoJSON (RFC 7946) codec laws: winding normalization on write,
positional ring roles on read, Multi* flattening, the JVM-side
GeoJSONSeq lane's row parity with the Python FeatureCollection lane,
and error cases."""

import json
import os

import numpy as np
import pytest

from whitebox_tools_spark.io import geojson, shapefile
from whitebox_tools_spark.io.shapefile import ShapeRecord, _signed_area
from whitebox_tools_spark.sources import vectors


def _rect_recs():
    return [
        ShapeRecord(parts=list(f.rings), shape_type=shapefile.SHP_POLYGON,
                    attrs={"zone": int(f.attrs["zone"])})
        for f in vectors.rect_layer()
    ]


def test_writer_emits_rfc7946_winding(tmp_path):
    # engine-internal rings are CW shells / CCW holes (shapefile
    # convention); RFC 7946 wants the opposite
    p = str(tmp_path / "l.geojson")
    geojson.write_geojson(_rect_recs(), p)
    doc = json.loads(open(p).read())
    assert doc["type"] == "FeatureCollection"
    for feat in doc["features"]:
        rings = feat["geometry"]["coordinates"]
        for i, ring in enumerate(rings):
            a = _signed_area(np.asarray(ring))
            assert (a > 0) if i == 0 else (a < 0), (feat["id"], i)


def test_roundtrip_polygons(spark, tmp_path):
    p = str(tmp_path / "l.geojson")
    geojson.write_geojson(_rect_recs(), p)
    rows = geojson.read_geojson(spark, p).orderBy("fid", "part").collect()
    feats = vectors.rect_layer()
    assert len(rows) == sum(len(f.rings) for f in feats)
    for row in rows:
        ring = feats[row.fid].rings[row.part]
        assert row.is_hole == feats[row.fid].holes[row.part]
        assert row.geom_type == "Polygon"
        assert row.properties["zone"] == str(feats[row.fid].attrs["zone"])
        # same vertex SET (winding may flip, closure point preserved)
        got = set(zip(row.xs, row.ys))
        want = set(map(tuple, ring.tolist()))
        assert got == want
        assert len(row.xs) == len(ring)


def test_geojsonl_matches_featurecollection(spark, tmp_path):
    recs = _rect_recs()
    p1 = str(tmp_path / "l.geojson")
    p2 = str(tmp_path / "l.geojsonl")
    geojson.write_geojson(recs, p1)
    geojson.write_geojsonl(recs, p2)
    a = geojson.read_geojson(spark, p1).drop("path")
    b = geojson.read_geojsonl_polygons(spark, p2)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_points_and_lines_roundtrip(spark, tmp_path):
    recs = [
        ShapeRecord(parts=[np.array([[3.5, -2.25]])],
                    shape_type=shapefile.SHP_POINT, attrs={"n": 1}),
        ShapeRecord(parts=[np.array([[0.0, 0.0], [10.0, 5.0], [20.0, 0.0]])],
                    shape_type=shapefile.SHP_POLYLINE, attrs={"n": 2}),
        ShapeRecord(parts=[np.array([[0.0, 0.0], [1.0, 1.0]]),
                           np.array([[5.0, 5.0], [6.0, 7.0]])],
                    shape_type=shapefile.SHP_POLYLINE, attrs={"n": 3}),
    ]
    p = str(tmp_path / "pl.geojson")
    geojson.write_geojson(recs, p)
    rows = geojson.read_geojson(spark, p).orderBy("fid", "part").collect()
    assert [r.geom_type for r in rows] == [
        "Point", "LineString", "LineString", "LineString"]
    assert rows[0].xs == [3.5] and rows[0].ys == [-2.25]
    assert rows[1].xs == [0.0, 10.0, 20.0]
    assert [r.part for r in rows] == [0, 0, 0, 1]


def test_multipolygon_flattens_to_parts(spark, tmp_path):
    doc = {"type": "FeatureCollection", "features": [{
        "type": "Feature", "id": 7,
        "geometry": {"type": "MultiPolygon", "coordinates": [
            [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
             [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]]],
            [[[10, 10], [14, 10], [14, 14], [10, 14], [10, 10]]],
        ]},
        "properties": {"a": "b"},
    }]}
    p = str(tmp_path / "mp.geojson")
    open(p, "w").write(json.dumps(doc))
    rows = geojson.read_geojson(spark, p).orderBy("part").collect()
    assert len(rows) == 3
    assert [r.is_hole for r in rows] == [False, True, False]
    assert all(r.fid == 7 for r in rows)


def test_null_geometry_and_bad_type(spark, tmp_path):
    doc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": None, "properties": {"k": "v"}},
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [1, 2]},
         "properties": None},
    ]}
    p = str(tmp_path / "n.geojson")
    open(p, "w").write(json.dumps(doc))
    rows = geojson.read_geojson(spark, p).collect()
    assert len(rows) == 1 and rows[0].geom_type == "Point"
    bad = str(tmp_path / "bad.geojson")
    open(bad, "w").write('{"type": "Topology"}')
    with pytest.raises(Exception, match=r"Feature\(Collection\)"):
        geojson.read_geojson(spark, bad).collect()
    gc = str(tmp_path / "gc.geojson")
    open(gc, "w").write(json.dumps({"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "GeometryCollection", "geometries": []},
         "properties": {}}]}))
    with pytest.raises(Exception, match="GeometryCollection"):
        geojson.read_geojson(spark, gc).collect()


def test_shapefile_and_geojson_agree(spark, tmp_path):
    # the same records through both codecs produce the same rings
    recs = _rect_recs()
    base = str(tmp_path / "layer")
    shapefile.write_shapefile(recs, base)
    shp = shapefile.read_shapefile(spark, base).select(
        "fid", "part", "is_hole", "xs", "ys").orderBy("fid", "part").collect()
    p = str(tmp_path / "layer.geojson")
    geojson.write_geojson(recs, p)
    gj = geojson.read_geojson(spark, p).select(
        "fid", "part", "is_hole", "xs", "ys").orderBy("fid", "part").collect()
    assert len(shp) == len(gj)
    for a, b in zip(shp, gj):
        assert (a.fid, a.part, a.is_hole) == (b.fid, b.part, b.is_hole)
        assert set(zip(a.xs, a.ys)) == set(zip(b.xs, b.ys))


def test_executor_side_geojsonl_writer_roundtrips(spark, tmp_path):
    # JVM-rendered Feature lines parse back identically through the
    # JVM-side reader: the scale lane closes both ways with zero Python
    recs = _rect_recs()
    p = str(tmp_path / "in.geojsonl")
    geojson.write_geojsonl(recs, p)
    ring_rows = geojson.read_geojsonl_polygons(spark, p)
    out_dir = str(tmp_path / "out")
    geojson.polygons_to_geojsonl(ring_rows).coalesce(1).write.text(out_dir)
    back = geojson.read_geojsonl_polygons(spark, out_dir + "/*.txt")
    a = sorted(map(tuple, ring_rows.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # and the plan stays Python-free
    plan = geojson.polygons_to_geojsonl(ring_rows)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_geojsonl_points_lane(spark, tmp_path):
    recs = [
        ShapeRecord(parts=[np.array([[float(i), float(-i)]])],
                    shape_type=shapefile.SHP_POINT, attrs={"n": i})
        for i in range(5)
    ]
    # mix in a polygon line: the point lane must skip it
    recs.append(_rect_recs()[0])
    p = str(tmp_path / "pts.geojsonl")
    geojson.write_geojsonl(recs, p)
    df = geojson.read_geojsonl_points(spark, p)
    rows = sorted(df.collect(), key=lambda r: r.fid)
    assert len(rows) == 5
    for i, r in enumerate(rows):
        assert (r.x, r.y) == (float(i), float(-i))
        assert r.properties["n"] == str(i)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_3d_positions_drop_altitude(spark, tmp_path):
    # RFC 7946 §3.1.1: a position may carry an optional altitude; the
    # reader must drop it, not reshape-flatten it into garbage vertices
    p = str(tmp_path / "z.geojson")
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "id": 0, "properties": {},
         "geometry": {"type": "LineString",
                      "coordinates": [[1, 2, 9], [3, 4, 9], [5, 6, 9]]}},
        {"type": "Feature", "id": 1, "properties": {},
         "geometry": {"type": "Point", "coordinates": [7, 8, 99]}},
        {"type": "Feature", "id": 2, "properties": {},
         # mixed 2D/3D positions in one ring (legal, if sloppy)
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [4, 0, 1], [4, 4],
                                       [0, 4, 2], [0, 0]]]}},
    ]}
    with open(p, "w") as f:
        json.dump(fc, f)
    rows = {r.fid: r for r in geojson.read_geojson(spark, p).collect()}
    assert rows[0].xs == [1.0, 3.0, 5.0] and rows[0].ys == [2.0, 4.0, 6.0]
    assert rows[1].xs == [7.0] and rows[1].ys == [8.0]
    assert rows[2].xs == [0.0, 4.0, 4.0, 0.0, 0.0]
    assert rows[2].ys == [0.0, 0.0, 4.0, 4.0, 0.0]


def test_non_integral_or_bool_ids_fall_back_to_position(spark, tmp_path):
    # int(2.7) would collide with a real id=2 feature; bools are int
    # subclasses; string ids are non-numeric. All -> positional fid.
    p = str(tmp_path / "ids.geojson")
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "id": 2.7, "properties": {},
         "geometry": {"type": "Point", "coordinates": [0, 0]}},
        {"type": "Feature", "id": 2, "properties": {},
         "geometry": {"type": "Point", "coordinates": [1, 1]}},
        {"type": "Feature", "id": True, "properties": {},
         "geometry": {"type": "Point", "coordinates": [2, 2]}},
        {"type": "Feature", "id": 7.0, "properties": {},  # integral float: honored
         "geometry": {"type": "Point", "coordinates": [3, 3]}},
        {"type": "Feature", "id": "abc", "properties": {},
         "geometry": {"type": "Point", "coordinates": [4, 4]}},
    ]}
    with open(p, "w") as f:
        json.dump(fc, f)
    got = sorted((r.fid, r.xs[0]) for r in
                 geojson.read_geojson(spark, p).collect())
    assert got == [(0, 0.0), (2, 1.0), (2, 2.0), (4, 4.0), (7, 3.0)]
