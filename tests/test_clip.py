"""Overlay geometry: Greiner-Hormann kernel vs the independent
rect-grid boolean (sources/rect_ops.py) — two disjoint algorithm
families must produce identical canonical rings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.kernels.clip import canonical, diff_many, gh_clip
from whitebox_tools_spark.kernels.geometry import polygon_area
from whitebox_tools_spark.sources.rect_ops import rect_bool_rings, region_rings


def rect_ring(r):
    x0, y0, x1, y1 = r
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


def _sorted(rings):
    return sorted(rings, key=lambda rh: (rh[1], rh[0][0, 0], rh[0][0, 1]))


class TestGHKernel:
    def test_basic_ops(self):
        A, B = (0, 0, 10, 10), (5, 5, 15, 15)
        for op, exp_area in [("int", 25.0), ("diff", 75.0), ("union", 175.0)]:
            out = gh_clip(rect_ring(A), rect_ring(B), op)
            area = sum(polygon_area(r) * (-1 if h else 1) for r, h in out)
            assert area == pytest.approx(exp_area)

    def test_contained_clip_becomes_hole(self):
        out = gh_clip(rect_ring((0, 0, 10, 10)), rect_ring((2, 2, 8, 8)), "diff")
        assert [(len(r), h) for r, h in _sorted(out)] == [(4, False), (4, True)]

    def test_strip_splits_into_two_pieces(self):
        out = gh_clip(rect_ring((0, 0, 10, 10)), rect_ring((4, -5, 6, 15)), "diff")
        areas = sorted(polygon_area(r) for r, _ in out)
        assert areas == [40.0, 40.0]

    def test_diff_many_fold(self):
        out = diff_many(
            rect_ring((0, 0, 10, 10)),
            [rect_ring((5, 5, 15, 15)), rect_ring((2, 2, 8, 8))],
        )
        area = sum(polygon_area(r) * (-1 if h else 1) for r, h in out)
        assert area == pytest.approx(48.0)

    def test_canonical_rotation_and_winding(self):
        r = canonical(np.array([[10, 0], [10, 10], [0, 10], [0, 0]], float))
        assert r.tolist() == [[0, 0], [10, 0], [10, 10], [0, 10]]

    def test_random_rect_pairs_match_independent_grid_boolean(self):
        rng = np.random.default_rng(11)
        checked = 0
        while checked < 200:
            a = rng.integers(0, 50, 2)
            aw = rng.integers(1, 40, 2)
            b = rng.integers(0, 50, 2)
            bw = rng.integers(1, 40, 2)
            A = (float(a[0]), float(a[1]), float(a[0] + aw[0]), float(a[1] + aw[1]))
            B = (float(b[0]), float(b[1]), float(b[0] + bw[0]), float(b[1] + bw[1]))
            if (
                A[0] in (B[0], B[2]) or A[2] in (B[0], B[2])
                or A[1] in (B[1], B[3]) or A[3] in (B[1], B[3])
            ):
                continue
            checked += 1
            for op in ("int", "diff", "union"):
                exp = rect_bool_rings(A, B, op)
                got = _sorted(gh_clip(rect_ring(A), rect_ring(B), op))
                assert len(exp) == len(got), (op, A, B)
                for (r1, h1), (r2, h2) in zip(exp, got):
                    assert h1 == h2 and np.allclose(r1, r2), (op, A, B)

    def test_region_rings_hole_extraction(self):
        rr = region_rings(
            [(0, 0, 10, 10), (3, 3, 7, 7)], lambda f: f[0] and not f[1]
        )
        assert [(len(r), h) for r, h in rr] == [(4, False), (4, True)]


class TestOverlayGeometryOperator:
    def test_diff_passthrough_and_plan(self, spark):
        from whitebox_tools_spark.operators import vector_ops as vo
        from whitebox_tools_spark.sources import vectors

        la = spark.createDataFrame(vectors.layer_to_rows(vectors.rect_layer()))
        # B far away -> every A feature passes through untouched
        far = [
            dict(
                fid=9, part=0, is_hole=False,
                xs=[5000.0, 5100.0, 5100.0, 5000.0],
                ys=[5000.0, 5000.0, 5100.0, 5100.0],
                xmin=5000.0, ymin=5000.0, xmax=5100.0, ymax=5100.0,
            )
        ]
        lb = spark.createDataFrame(far)
        out = vo.overlay_geometry(la, lb, "diff").collect()
        fids = sorted({r["fid_a"] for r in out})
        assert fids == [1, 2, 3]
        plan = vo.overlay_geometry(la, lb, "int")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_symmetrical_difference_area(self, spark):
        from whitebox_tools_spark.operators import vector_ops as vo
        from whitebox_tools_spark.sources import vectors

        la = spark.createDataFrame(vectors.layer_to_rows(vectors.rect_layer()))
        lb = spark.createDataFrame(vectors.layer_to_rows(vectors.rect_layer_b()))
        rows = vo.symmetrical_difference_geometry(la, lb).collect()
        area = 0.0
        for r in rows:
            ring = np.column_stack([r["xs"], r["ys"]])
            area += polygon_area(ring) * (-1 if r["is_hole"] else 1)
        # closed form: sum(A)+sum(B)-2*sum(A&B), holes subtracted
        a_area = 300 * 250 + (300 * 450 - 100 * 150) + 250 * 350
        b_area = 350 * 250 + 350 * 300 + 160 * 300
        inter = 200 * 200 + (200 * 300 - 100 * 150) + 160 * 250
        assert area == pytest.approx(a_area + b_area - 2 * inter)
