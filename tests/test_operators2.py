"""Unit tests: focal tile invariance, hexbin totals, coincident-point
greedy parity vs a numpy transcription of the reference loop."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark import derive
from whitebox_tools_spark.operators import focal
from whitebox_tools_spark.operators import raster as rop
from whitebox_tools_spark.operators.attributes import eliminate_coincident_points
from whitebox_tools_spark.operators.gridding import GridConfig
from whitebox_tools_spark.operators.hexbin import assign_hex, hex_bin
from whitebox_tools_spark.sources.tables import documents

SF_DIR = "/root/testdata/sf0.001"
GRID = GridConfig(rows=20, cols=20, north=1000.0, west=0.0, res_x=50.0, res_y=50.0)


@pytest.fixture(scope="module")
def raster(spark):
    geo = derive.with_geometry(documents(spark, SF_DIR), "doc_id")
    return rop.points_to_raster(geo, GRID, assign="last").cache()


def _vals(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


class TestFocalTileInvariance:
    """Tile decomposition must be invisible: tile_size=7 (ragged, many
    seams) == tile_size=64 (single tile)."""

    def test_slope_seam_free(self, spark, raster):
        a = _vals(focal.slope(raster, GRID, tile_size=7))
        b = _vals(focal.slope(raster, GRID, tile_size=64))
        assert a == b

    def test_mean_filter_seam_free(self, spark, raster):
        a = _vals(focal.mean_filter(raster, GRID, 5, 5, tile_size=7))
        b = _vals(focal.mean_filter(raster, GRID, 5, 5, tile_size=64))
        assert a == b


class TestHexBin:
    def test_all_points_assigned(self, spark):
        geo = derive.with_geometry(documents(spark, SF_DIR), "doc_id")
        n_pts = geo.count()
        binned = hex_bin(geo, 120.0)
        assert binned.agg(F.sum("count_")).collect()[0][0] == n_pts

    def test_assignment_is_nearest_center(self, spark):
        """Brute-force nearest hex center == the two-candidate closed form."""
        from whitebox_tools_spark.operators.hexbin import _hex_params
        from whitebox_tools_spark.operators.tiling import compute_extent

        geo = derive.with_geometry(documents(spark, SF_DIR), "doc_id")
        ext = compute_extent(geo)
        p = _hex_params(120.0, ext)
        rows = geo.select("doc_id", "x", "y").collect()
        got = {
            r["doc_id"]: (r["hex_row"], r["hex_col"])
            for r in assign_hex(geo, 120.0, ext).select("doc_id", "hex_row", "hex_col").collect()
        }
        # brute force over every center (vector_hex_bin.rs:315-323 layout)
        centers = []
        for hr in range(p["nrows"]):
            ncols = p["c_even"] if hr % 2 == 0 else p["c_odd"]
            for hc in range(ncols):
                cx = (p["cx0"] - p["hw"] * (hr % 2)) + hc * p["width"]
                cy = p["cy0"] - hr * p["q"]
                centers.append((hr, hc, cx, cy))
        arr = np.array([(c[2], c[3]) for c in centers])
        for r in rows:
            d2 = (arr[:, 0] - r["x"]) ** 2 + (arr[:, 1] - r["y"]) ** 2
            best = int(np.argmin(d2))
            assert got[r["doc_id"]] == (centers[best][0], centers[best][1])


def _ref_greedy(ids, xs, ys, tol):
    """Transcription of eliminate_coincident_points.rs:245-265."""
    order = np.argsort(ids)
    ids, xs, ys = np.asarray(ids)[order], np.asarray(xs)[order], np.asarray(ys)[order]
    tol2 = tol * tol
    kept = []
    kept_xy = []
    for i in range(len(ids)):
        drop = False
        for (kx, ky) in kept_xy:
            if (xs[i] - kx) ** 2 + (ys[i] - ky) ** 2 < tol2:
                drop = True
                break
        if not drop:
            kept.append(ids[i])
            kept_xy.append((xs[i], ys[i]))
    return set(int(v) for v in kept)


class TestEliminateCoincident:
    def test_matches_reference_greedy(self, spark):
        geo = (
            derive.with_geometry(documents(spark, SF_DIR), "doc_id")
            .select("doc_id", (F.col("x") / 10.0).alias("x"), (F.col("y") / 10.0).alias("y"))
        )  # compress to [0,100)^2 so tolerance 6 builds real chains
        tol = 6.0
        rows = geo.collect()
        expect = _ref_greedy(
            [r["doc_id"] for r in rows], [r["x"] for r in rows], [r["y"] for r in rows], tol
        )
        got = {
            r["doc_id"]
            for r in eliminate_coincident_points(geo, tol).select("doc_id").collect()
        }
        assert got == expect


class TestNearestDifferent:
    def _frame(self, spark, cells):
        return spark.createDataFrame(
            [(r, c, float(v)) for r, c, v in cells], "row long, col long, value double"
        )

    def test_matches_brute_force(self, spark):
        import itertools
        import math

        from whitebox_tools_spark.operators.vector_ops import nearest_different_distance

        cfg = GridConfig(rows=8, cols=9, north=0.0, west=0.0, res_x=2.0, res_y=3.0)
        rng = np.random.RandomState(7)
        cells = [
            (r, c, float(rng.choice([0.0, 1.0, 2.0, 3.0])))
            for r, c in itertools.product(range(8), range(9))
            if rng.rand() > 0.1  # ~10% nodata holes (missing rows)
        ]
        got = {
            (r["row"], r["col"]): r["dd"]
            for r in nearest_different_distance(self._frame(spark, cells), cfg).collect()
        }
        lab = {(r, c): v for r, c, v in cells}
        for (r, c), v in lab.items():
            if v <= 0.0:
                continue
            best = math.inf
            for (tr, tc), tv in lab.items():
                if tv != v:
                    best = min(
                        best, math.hypot((r - tr) * cfg.res_y, (c - tc) * cfg.res_x)
                    )
            assert got[(r, c)] == pytest.approx(best), (r, c)

    def test_single_class_is_inf(self, spark):
        from whitebox_tools_spark.operators.vector_ops import nearest_different_distance

        cfg = GridConfig(rows=3, cols=3, north=0.0, west=0.0, res_x=1.0, res_y=1.0)
        cells = [(r, c, 5.0) for r in range(3) for c in range(3)]
        out = nearest_different_distance(self._frame(spark, cells), cfg).collect()
        assert len(out) == 9 and all(np.isinf(r["dd"]) for r in out)
