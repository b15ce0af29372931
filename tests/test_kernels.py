"""Unit tests for the pure-numpy parity kernels.

The FRS expectations are the reference's own pinned unit-test values
(src/structures/fixed_radius_search.rs:468-559); PIP/area/clockwise cases
encode the documented edge semantics (poly_ops.rs:26-33, poly_area.rs).
"""

import math

import numpy as np
import pytest

from whitebox_tools_spark.kernels import (
    frs_knn_search,
    frs_radius_search,
    idw_value,
    is_clockwise_order,
    point_in_poly,
    points_in_polygon_feature,
    polygon_area,
    polygon_perimeter,
    tile_assign,
)
from whitebox_tools_spark.kernels.tile import surviving_tiles, tile_grid

# CW unit square ring (closed) in a y-up frame: shell orientation
SQ = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0], [0.0, 0.0]])


class TestPointInPoly:
    def test_interior(self):
        assert point_in_poly([0.5], [0.5], SQ)[0]

    def test_exterior(self):
        assert not point_in_poly([1.5], [0.5], SQ)[0]

    def test_edge_semantics_half_open(self):
        # poly_ops.rs:26 claims boundary points are outside, but the actual
        # is_left arithmetic (strict > / <) yields half-open behaviour for
        # axis-aligned rings: left+bottom edges INSIDE, right+top OUTSIDE.
        # Parity = arithmetic, not the doc comment (verified by hand-trace
        # of winding_number poly_ops.rs:41-72).
        assert point_in_poly([0.0], [0.5], SQ)[0]  # left edge: in
        assert point_in_poly([0.5], [0.0], SQ)[0]  # bottom edge: in
        assert not point_in_poly([1.0], [0.5], SQ)[0]  # right edge: out
        assert not point_in_poly([0.5], [1.0], SQ)[0]  # top edge: out

    def test_vertex_semantics(self):
        assert point_in_poly([0.0], [0.0], SQ)[0]  # bottom-left corner: in
        assert not point_in_poly([1.0], [1.0], SQ)[0]  # top-right: out

    def test_open_ring_raises(self):
        open_ring = SQ[:-1]
        # auto-closes instead of panicking (engine-friendly), same result
        assert point_in_poly([0.5], [0.5], open_ring)[0]

    def test_concave_c(self):
        # concave "C": points in the notch are outside
        c = np.array(
            [
                [0, 0], [0, 3], [3, 3], [3, 2], [1, 2],
                [1, 1], [3, 1], [3, 0], [0, 0],
            ],
            dtype=float,
        )
        assert point_in_poly([0.5], [1.5], c)[0]
        assert not point_in_poly([2.0], [1.5], c)[0]  # notch

    def test_bowtie_even_odd(self):
        bow = np.array(
            [[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float
        )
        # centers of the two lobes are inside; the crossing point region
        assert point_in_poly([0.5], [1.0], bow)[0]
        assert point_in_poly([1.5], [1.0], bow)[0]


class TestHoleSemantics:
    SHELL = np.array([[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]], dtype=float)
    HOLE = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)  # CCW

    def test_orientation(self):
        assert is_clockwise_order(self.SHELL)
        assert not is_clockwise_order(self.HOLE)

    def test_shell_then_hole(self):
        px = [0.5, 2.0, 5.0]
        py = [0.5, 2.0, 5.0]
        got = points_in_polygon_feature(
            px, py, [self.SHELL, self.HOLE], [False, True], mode="shell_then_hole"
        )
        assert got.tolist() == [True, False, False]

    def test_last_wins(self):
        got = points_in_polygon_feature(
            [2.0], [2.0], [self.SHELL, self.HOLE], [False, True], mode="last_wins"
        )
        assert got.tolist() == [False]
        # reversed order: hole tested first, shell last -> inside
        got2 = points_in_polygon_feature(
            [2.0], [2.0], [self.HOLE, self.SHELL], [True, False], mode="last_wins"
        )
        assert got2.tolist() == [True]


class TestAreaPerimeter:
    def test_area(self):
        assert polygon_area(SQ) == 1.0

    def test_perimeter(self):
        assert polygon_perimeter(SQ) == 4.0


# The reference's FRS constellation (fixed_radius_search.rs:472-514)
FRS_PX = np.array([40.0, 25.0, 42.0, 40.0, 24.0])
FRS_PY = np.array([32.0, 65.0, 35.0, 31.0, 68.0])
FRS_VAL = np.array([1, 2, 3, 4, 5])


class TestFRS:
    def test_radius_search(self):
        got = frs_radius_search(FRS_PX, FRS_PY, FRS_VAL, 40.5, 31.5, 0.75)
        # pinned: values {1, 4} both at dist sqrt(0.5)
        assert sorted((int(v), round(d, 12)) for v, d in got) == [
            (1, round(0.7071067811865476, 12)),
            (4, round(0.7071067811865476, 12)),
        ]

    def test_radius_search_squared(self):
        got = frs_radius_search(FRS_PX, FRS_PY, FRS_VAL, 40.5, 31.5, 0.75, squared=True)
        assert sorted((int(v), d) for v, d in got) == [(1, 0.5), (4, 0.5)]

    def test_knn_search(self):
        got = frs_knn_search(FRS_PX, FRS_PY, FRS_VAL, 40.5, 31.5, 3, 0.75)
        assert sorted((int(v), round(d, 12)) for v, d in got) == sorted(
            [
                (4, round(0.7071067811865476, 12)),
                (1, round(0.7071067811865476, 12)),
                (3, round(3.8078865529319543, 12)),
            ]
        )

    def test_knn_search_squared(self):
        got = frs_knn_search(
            FRS_PX, FRS_PY, FRS_VAL, 40.5, 31.5, 3, 0.75, squared=True
        )
        assert sorted((int(v), d) for v, d in got) == [(1, 0.5), (3, 14.5), (4, 0.5)]

    def test_knn_k_larger_than_n(self):
        got = frs_knn_search(FRS_PX, FRS_PY, FRS_VAL, 40.5, 31.5, 99, 0.75)
        assert len(got) == 5

    def test_knn_shell_stop_is_approximate(self):
        # a point just outside the stopping shell is NOT returned even if
        # closer than a returned point — replicating the reference's
        # approximate shell-stop behaviour.
        px = np.array([0.1, 10.0])
        py = np.array([0.1, 0.0])
        val = np.array([1, 2])
        got = frs_knn_search(px, py, val, 0.0, 0.0, 1, 1.0)
        assert [int(v) for v, _ in got] == [1]


class TestTile:
    def test_grid(self):
        sx, sy, cols, rows = tile_grid(0.5, 999.5, 0.5, 999.5, 0.0, 0.0, 250.0, 250.0)
        assert (sx, sy, cols, rows) == (0, 0, 4, 4)

    def test_grid_negative_offset(self):
        sx, sy, cols, rows = tile_grid(-10.0, 990.0, -10.0, 990.0, 0.0, 0.0, 250.0, 250.0)
        assert (sx, sy) == (-1, -1)
        assert (cols, rows) == (5, 5)

    def test_assign_boundary_floor(self):
        x = np.array([0.0, 249.999, 250.0, 500.0, 999.0])
        y = np.array([0.0, 0.0, 0.0, 250.0, 999.0])
        tiles, cols, rows = tile_assign(x, y, 0.0, 0.0, 250.0, 250.0)
        assert cols == 4 and rows == 4
        assert tiles.tolist() == [0, 0, 1, 1 * 4 + 2, 3 * 4 + 3]

    def test_surviving(self):
        tiles = np.array([0, 0, 0, 1, 1, 2])
        # min_points clamped to 2 -> need count > 2
        assert surviving_tiles(tiles, 0).tolist() == [0]
        assert surviving_tiles(tiles, 2).tolist() == [0]


class TestIDW:
    def test_weighted(self):
        z = [10.0, 20.0]
        d = [1.0, 2.0]
        got = idw_value(z, d, 2.0, 1)
        expect = (10 / 1 + 20 / 4) / (1 / 1 + 1 / 4)
        assert got == pytest.approx(expect, rel=1e-15)

    def test_zero_distance_short_circuit(self):
        assert idw_value([10.0, 20.0], [1.0, 0.0], 2.0, 1) == 20.0

    def test_min_points(self):
        assert idw_value([10.0], [1.0], 2.0, 2) is None


class TestUnionEnclosedVoid:
    """ADVICE r2 (medium): A|B that encloses a void must emit the void as
    a hole ring, not a shell — the U-shape capped by a bar case (rings of
    area 116 and 36; the correct net union area is 116 - 36 = 80)."""

    def test_u_shape_capped_by_bar(self):
        import numpy as np

        from whitebox_tools_spark.kernels.clip import gh_clip, polygon_area

        # U: 10x10 outer with a 6x8 notch opening upward (area 100-48=52)
        u = np.array([
            [0, 0], [10, 0], [10, 10], [8, 10], [8, 2],
            [2, 2], [2, 10], [0, 10], [0, 0],
        ], dtype=float)
        # bar caps the notch from above: y in [8, 12], x in [-1, 11]
        bar = np.array([
            [-1, 8], [11, 8], [11, 12], [-1, 12], [-1, 8],
        ], dtype=float)
        out = gh_clip(u, bar, "union")
        shells = [r for r, h in out if not h]
        holes = [r for r, h in out if h]
        assert len(shells) == 1
        assert len(holes) == 1
        net = sum(polygon_area(r) for r in shells) - sum(
            polygon_area(r) for r in holes
        )
        # U (52) + bar (48) - overlap (2 columns x 2 rows x ... ) computed
        # independently: union area by half-open rasterization
        xs, ys = np.meshgrid(np.arange(-1, 11, 0.25) + 0.125,
                             np.arange(0, 12, 0.25) + 0.125)
        from whitebox_tools_spark.kernels.clip import point_in_poly

        in_u = point_in_poly(xs.ravel(), ys.ravel(), u)
        in_b = point_in_poly(xs.ravel(), ys.ravel(), bar)
        mc = (in_u | in_b).mean() * (12 * 12)
        assert abs(net - mc) < 1.5  # MC grid tolerance
        # and the void is genuinely interior to the shell
        assert polygon_area(holes[0]) > 0
