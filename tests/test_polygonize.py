"""Polygonize: planar-arrangement face extraction (gis_analysis/polygonize.rs)."""

from whitebox_tools_spark.operators.polygonize import polygonize


def _lines(spark, rows):
    return spark.createDataFrame(
        rows, "seg_id int, x1 double, y1 double, x2 double, y2 double"
    ).coalesce(1)


def test_squares_with_spur(spark):
    # two unit squares sharing an edge; a spur crossing the top edge at
    # (0.5, 1) must be pruned but its crossing vertex retained
    rows = [
        (1, 0.0, 0.0, 1.0, 0.0),
        (2, 1.0, 0.0, 1.0, 1.0),
        (3, 1.0, 1.0, 0.0, 1.0),
        (4, 0.0, 1.0, 0.0, 0.0),
        (5, 1.0, 0.0, 2.0, 0.0),
        (6, 2.0, 0.0, 2.0, 1.0),
        (7, 2.0, 1.0, 1.0, 1.0),
        (8, 0.5, 0.5, 0.5, 2.5),
    ]
    out = polygonize(_lines(spark, rows)).orderBy("fid", "vi").collect()
    faces = {}
    for r in out:
        faces.setdefault(r.fid, []).append((r.x, r.y))
    assert set(faces) == {1, 2}
    assert faces[1] == [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.5, 1.0), (0.0, 1.0)]
    assert faces[2] == [(1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0)]


def test_crossing_lines_four_faces(spark):
    # a tic-tac-toe arrangement: the dangling line ends peel away and
    # only the central unit square remains a bounded face
    rows = [
        (1, 0.0, 1.0, 3.0, 1.0),
        (2, 0.0, 2.0, 3.0, 2.0),
        (3, 1.0, 0.0, 1.0, 3.0),
        (4, 2.0, 0.0, 2.0, 3.0),
    ]
    out = polygonize(_lines(spark, rows)).orderBy("fid", "vi").collect()
    faces = {}
    for r in out:
        faces.setdefault(r.fid, []).append((r.x, r.y))
    assert set(faces) == {1}
    assert faces[1] == [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]


def test_open_lines_no_faces(spark):
    rows = [
        (1, 0.0, 0.0, 1.0, 0.0),
        (2, 2.0, 0.0, 3.0, 1.0),
    ]
    assert polygonize(_lines(spark, rows)).count() == 0
