"""Unit tests for operators/vector_structure.py and operators/lidar_utils.py
— the DataFrame-in/DataFrame-out functions the facade resolves for the
vector-structure and lidar-utility tool families (their catalog oracle
rows exercise the same code over the fixtures; these pin the semantics
on tiny hand-checked frames, including edge cases the fixtures lack)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.operators import lidar_utils as lu
from whitebox_tools_spark.operators import vector_structure as vs

VCOLS = ["fid", "part", "is_hole", "idx", "x", "y", "zone"]


def _verts(spark):
    # fid 1: unit square shell (closed ring) + one hole part;
    # fid 2: degenerate zero-area feature (all vertices coincident)
    rows = []
    sq = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]
    for i, (x, y) in enumerate(sq):
        rows.append((1, 0, False, i, x, y, 7))
    hole = [(0.5, 0.5), (1.0, 0.5), (1.0, 1.0), (0.5, 1.0), (0.5, 0.5)]
    for i, (x, y) in enumerate(hole):
        rows.append((1, 1, True, i, x, y, 7))
    for i in range(4):
        rows.append((2, 0, False, i, 9.0, 9.0, 7))
    return spark.createDataFrame(rows, VCOLS)


def test_ring_area2_and_clean_vector(spark):
    v = _verts(spark)
    a = {(r.fid, r.part): r.area2 for r in vs.ring_area2(v).collect()}
    assert abs(abs(a[(1, 0)]) - 8.0) < 1e-12  # 2 * area(2x2 square)
    assert a[(2, 0)] == 0.0
    kept = vs.clean_vector(v).collect()
    assert {r.fid for r in kept} == {1}
    assert kept[0].n_parts == 2  # hole part survives on a kept feature


def test_remove_polygon_holes_and_envelope(spark):
    v = _verts(spark)
    out = {r.fid: (r.n_parts, r.n_vertices) for r in vs.remove_polygon_holes(v).collect()}
    assert out[1] == (1, 5) and out[2] == (1, 4)
    env = {r.fid: (r.xmin, r.ymin, r.xmax, r.ymax)
           for r in vs.minimum_bounding_envelope(v).collect()}
    assert env[1] == (0.0, 0.0, 2.0, 2.0)
    foot = vs.layer_footprint(v).collect()[0]
    assert (foot.min_x, foot.max_y) == (0.0, 9.0)


def test_part_restructure(spark):
    v = _verts(spark)
    m2s = vs.multipart_to_singlepart(v).orderBy("new_fid").collect()
    assert [(r.new_fid, r.orig_fid, r.part) for r in m2s] == [
        (1, 1, 0), (2, 1, 1), (3, 2, 0)]
    s2m = vs.singlepart_to_multipart(v, "zone").collect()
    assert s2m[0].zone == 7 and s2m[0].n_parts == 3 and s2m[0].n_vertices == 14
    reinit = vs.reinitialize_attribute_table(v).orderBy("new_fid").collect()
    assert [(r.new_fid, r.orig_fid) for r in reinit] == [(1, 1), (2, 2)]
    assert vs.extract_nodes(v).count() == 14


def test_polygons_lines_roundtrip(spark):
    v = _verts(spark)
    p2l = {(r.fid, r.part): (r.n_vertices, r.length)
           for r in vs.polygons_to_lines(v).collect()}
    assert p2l[(1, 0)] == (5, 8.0)  # square perimeter
    assert p2l[(1, 1)] == (5, 2.0)
    l2p = {(r.fid, r.part): (r.n_vertices_closed, r.close_x, r.close_y)
           for r in vs.lines_to_polygons(v).collect()}
    # open path = ring minus closing vertex; closing restores the count
    assert l2p[(1, 0)] == (5, 0.0, 0.0)


def test_csv_roundtrip_ops(spark):
    t = spark.createDataFrame([(1, 2.5), (2, -3.0)], ["id", "v"])
    lines = vs.export_table_to_csv(t)
    assert lines.columns == ["line"]
    back = vs.csv_points_to_vector(lines, "id BIGINT, v DOUBLE")
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, 2.5), (2, -3.0)]


def test_add_point_coordinates(spark):
    t = spark.createDataFrame([(1, "a", 3.0, 4.0)], ["fid", "name", "x", "y"])
    out = vs.add_point_coordinates_to_table(t)
    assert out.columns == ["fid", "name", "x", "y"]


def _pts(spark):
    rows = [
        # doc_id, x, y, z, cls, scan_angle
        (1, 10.0, 10.0, 5.0, 2, 3.0),
        (2, 10.5, 10.5, 50.0, 1, -20.0),
        (3, 300.0, 10.0, 80.0, 5, 14.0),
        (4, 10.2, 10.1, 20.0, 2, 16.0),
    ]
    return spark.createDataFrame(rows, ["doc_id", "x", "y", "z", "cls", "scan_angle"])


def test_lidar_filters_and_slice(spark):
    p = _pts(spark)
    assert {r.doc_id for r in lu.filter_lidar_classes(p, [2, 5]).collect()} == {1, 3, 4}
    assert {r.doc_id for r in lu.filter_lidar_scan_angles(p, 15.0).collect()} == {1, 3}
    assert {r.doc_id for r in lu.lidar_elevation_slice(p, 20.0, 80.0).collect()} == {2, 4}


def test_lidar_histogram_info_tiles(spark):
    p = _pts(spark)
    h = {r.bin: r.n for r in lu.lidar_histogram(p, 10.0).collect()}
    assert h == {0: 1, 5: 1, 8: 1, 2: 1}
    info = lu.lidar_info(p).collect()[0]
    assert (info.n_points, info.min_z, info.max_z, info.max_x) == (4, 5.0, 80.0, 300.0)
    tf = {(r.tile_row, r.tile_col): r.n
          for r in lu.lidar_tile_footprint(p, 250.0).collect()}
    assert tf == {(0, 0): 3, (0, 1): 1}


def test_cell_stats_density_overlap(spark):
    cells = spark.createDataFrame(
        [(1, 0, 0, 5.0, 0), (2, 0, 0, 7.0, 1), (3, 1, 2, 9.0, 0)],
        ["doc_id", "row", "col", "z", "fl"],
    )
    d = {(r.cell_row, r.cell_col): r.density
         for r in lu.lidar_point_density(cells, 4.0).collect()}
    assert d == {(0, 0): 0.5, (1, 2): 0.25}
    s = {(r.cell_row, r.cell_col): (r.n, r.min_z, r.max_z, r.mean_z)
         for r in lu.lidar_point_stats(cells).collect()}
    assert s[(0, 0)] == (2, 5.0, 7.0, 6.0)
    o = {(r.cell_row, r.cell_col): r.n_flightlines
         for r in lu.flightline_overlap(cells).collect()}
    assert o == {(0, 0): 2, (1, 2): 1}


def test_colourize_and_argextrema(spark):
    cells = spark.createDataFrame(
        [(1, 0, 0, 10.0, 10.0, 5.0), (2, 1, 1, 20.0, 20.0, 9.0)],
        ["doc_id", "row", "col", "x", "y", "z"],
    )
    def band(v0, v1):
        return spark.createDataFrame(
            [(0, 0, v0), (1, 1, v1)], ["row", "col", "value"])
    out = {r.doc_id: (r.r, r.g, r.b) for r in lu.lidar_colourize(
        cells, band(1.0, 2.0), band(3.0, 4.0), band(5.0, 6.0)).collect()}
    assert out == {1: (1.0, 3.0, 5.0), 2: (2.0, 4.0, 6.0)}
    ext = {r.kind: r.doc_id for r in
           lu.find_lowest_or_highest_points(cells.select("doc_id", "x", "y", "z")).collect()}
    assert ext == {"lowest": 1, "highest": 2}


def test_attribute_plots(spark):
    t = spark.createDataFrame([(1, 5.0, 2), (2, 17.0, 3)], ["k", "v", "c"])
    h = {r.bin: r.n for r in lu.attribute_histogram(t, "v", 10.0).collect()}
    assert h == {0: 1, 1: 1}
    sg = lu.attribute_scattergram(t, "k", "v", "c").orderBy("key").collect()
    assert [(r.key, r.sx, r.sy) for r in sg] == [(1, 5.0, 2.0), (2, 17.0, 3.0)]
