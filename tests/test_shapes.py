"""Hull / MBB / enclosing-circle kernel properties + Spark group stats."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.kernels.hull import (
    convex_hull,
    minimum_bounding_box,
    smallest_enclosing_circle,
)
from whitebox_tools_spark.operators.shapes import group_shape_stats
from whitebox_tools_spark.sources.docs import synth_docs


def _rand_pts(n, seed):
    rng = np.random.RandomState(seed)
    return rng.uniform(0, 100, size=(n, 2))


class TestHullKernel:
    @pytest.mark.parametrize("seed", [1, 2, 3, 7])
    def test_hull_contains_all_points(self, seed):
        pts = _rand_pts(60, seed)
        hull = convex_hull(pts)
        closed = np.vstack([hull, hull[:1]])
        # every point left-of-or-on every CCW edge
        for p in pts:
            for i in range(len(closed) - 1):
                a, b = closed[i], closed[i + 1]
                cross = (b[0] - a[0]) * (p[1] - a[1]) - (p[0] - a[0]) * (b[1] - a[1])
                assert cross >= -1e-9

    def test_hull_vertices_are_input_points(self):
        pts = _rand_pts(40, 5)
        hull = convex_hull(pts)
        src = {(round(p[0], 9), round(p[1], 9)) for p in pts}
        for h in hull:
            assert (round(h[0], 9), round(h[1], 9)) in src

    def test_square_hull(self):
        pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [5, 5], [2, 8]], dtype=float)
        hull = convex_hull(pts)
        assert len(hull) == 4
        assert {tuple(h) for h in hull} == {(0, 0), (10, 0), (10, 10), (0, 10)}


class TestMbb:
    @pytest.mark.parametrize("seed", [1, 4])
    def test_box_contains_points_and_beats_aabb_or_ties(self, seed):
        pts = _rand_pts(50, seed)
        corners, long_ax, short_ax, _slope = minimum_bounding_box(pts, "area")
        aabb_area = (pts[:, 0].max() - pts[:, 0].min()) * (pts[:, 1].max() - pts[:, 1].min())
        assert long_ax * short_ax <= aabb_area + 1e-6
        # all points inside the box polygon (within tolerance)
        closed = np.vstack([corners, corners[:1]])
        for p in pts:
            crosses = []
            for i in range(4):
                a, b = closed[i], closed[i + 1]
                crosses.append(
                    (b[0] - a[0]) * (p[1] - a[1]) - (p[0] - a[0]) * (b[1] - a[1])
                )
            crosses = np.array(crosses)
            assert (crosses >= -1e-6).all() or (crosses <= 1e-6).all()

    def test_rotated_rectangle_recovered(self):
        base = np.array([[0, 0], [8, 0], [8, 3], [0, 3]], dtype=float)
        th = math.radians(30)
        R = np.array([[math.cos(th), -math.sin(th)], [math.sin(th), math.cos(th)]])
        pts = base @ R.T
        _c, long_ax, short_ax, _s = minimum_bounding_box(pts, "area")
        assert abs(long_ax - 8) < 1e-9 and abs(short_ax - 3) < 1e-9


class TestCircle:
    @pytest.mark.parametrize("seed", [1, 2, 9])
    def test_contains_all_and_minimal(self, seed):
        pts = _rand_pts(30, seed)
        cx, cy, r = smallest_enclosing_circle(pts)
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        assert (d <= r + 1e-9).all()
        # minimality: the circle is supported by >= 2 points on its boundary
        assert (np.abs(d - r) < 1e-7).sum() >= 2

    def test_two_points(self):
        cx, cy, r = smallest_enclosing_circle(np.array([[0.0, 0.0], [4.0, 0.0]]))
        assert (cx, cy, r) == (2.0, 0.0, 2.0)


class TestGroupShapes:
    def test_per_class_stats(self, spark):
        docs = derive.with_geometry(synth_docs(spark, 1500), "doc_num")
        out = group_shape_stats(docs, "cls").collect()
        assert len(out) == 10  # cls in 0..9
        for r in out:
            assert r["hull_area"] > 0
            assert 0.0 <= r["elongation"] < 1.0
            assert r["mbb_long_axis"] >= r["mbb_short_axis"]
            assert r["circle_radius"] > 0
            # hull area <= mbb area <= circle area
            assert r["hull_area"] <= r["mbb_long_axis"] * r["mbb_short_axis"] + 1e-6
